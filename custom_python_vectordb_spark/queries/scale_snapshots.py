"""Per-scale parquet snapshot oracles for ORACLE_SF-pinned queries.

r10 (VERDICT missing #3): the snapshot-pinned queries were only ever
value-verified at sf0.01 — at the other sweep scales they reported
'scoped'. Their outputs are deterministic at EVERY scale (fixed
generators, fixed seeds, fixed-order float64), so additional scales
freeze the same way; at 10x the rows a literal VALUES module would bloat
the source tree, so these fixtures live as parquet next to this module
and the oracle is a DuckDB ``read_parquet`` over them. Same epistemics
as the literal snapshots (regression pinning, regenerate with
tools/gen_scale_snapshots.py); a missing fixture resolves to None and
the query stays 'scoped' at that scale, exactly as before.

The driver contract (__spark_entry__.oracle_sql) is untouched — it still
carries the sf0.01 oracle; only the local tri-scale sweep
(tools/check.py) consults registry.SCALE_ORACLES.
"""

from __future__ import annotations

import os

from custom_python_vectordb_spark.registry import scale_oracle

SNAP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "snapshots")

_SCALES = ("sf0.1", "sf0.001")

_NAMES = [
    "media_jpeg_luma",
    "media_jpeg_progressive_luma",
    "media_video_frames",
    "media_mp4_frames",
    "media_gif_frames",
    "media_features",
    "bpe_encode",
    "bpe_train_merges",
    "embed_mock",
    "semantic_text_search",
    "quality_model_score",
    "semdedup_keep",
    # r11: the k-means/partition-layout family — cross-process determinism
    # at both scales proven (two fresh sessions, identical value hashes)
    # before freezing; see tools/gen_scale_snapshots.py
    "knn_partitioned",
    "recall_partitioned_vs_exact",
    "pq_kmeans_recall",
    "cluster_topics",
    "cluster_balanced_sample",
]


def _parquet_oracle(name: str, sf: str):
    path = os.path.join(SNAP_DIR, f"{name}__{sf}.parquet")

    def build() -> str | None:
        if not os.path.exists(path):
            return None  # fixture absent on this machine -> stays scoped
        return f"SELECT * FROM read_parquet('{path}')"

    return build


def register_all() -> None:
    for name in _NAMES:
        for sf in _SCALES:
            scale_oracle(name, sf, _parquet_oracle(name, sf))


register_all()
