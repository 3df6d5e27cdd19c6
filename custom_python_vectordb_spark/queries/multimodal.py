"""Multimodal queries: binary columns, stubbed decode via mapInPandas
(the Arrow plumbing under test; dims are a pure function of payload bytes
so DuckDB can oracle-check the full pipeline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_features,
    media_from_text,
    media_metadata,
    resize_media,
)
from custom_python_vectordb_spark.queries.spine import _t
from custom_python_vectordb_spark.registry import query

DUCK_MEDIA = """
media AS (
    SELECT doc_id, CAST(text AS BLOB) AS media,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type
    FROM documents
)"""


@query("media_metadata", f"""
WITH {DUCK_MEDIA.strip()}
SELECT doc_id, media_type, CAST(octet_length(media) AS INTEGER) AS n_bytes, md5(CAST(media AS VARCHAR)) AS digest
FROM media
""")
def media_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(media_from_text(_t(spark, sf_dir, "documents")))


@query("media_decode", f"""
WITH {DUCK_MEDIA.strip()}
SELECT doc_id,
       CAST(octet_length(media) % 640 + 1 AS INTEGER) AS width,
       CAST((octet_length(media) * 7) % 480 + 1 AS INTEGER) AS height,
       3 AS channels
FROM media
""")
def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas fake-decode — oracle checks the Arrow round trip of the
    binary column against pure SQL arithmetic on the payload length."""
    out = decode_media(media_from_text(_t(spark, sf_dir, "documents")))
    return out.withColumn("channels", F.col("channels").cast("int"))


@query("media_resize", f"""
WITH {DUCK_MEDIA.strip()},
dec AS (
    SELECT doc_id,
           octet_length(media) % 640 + 1 AS width,
           (octet_length(media) * 7) % 480 + 1 AS height
    FROM media
),
scaled AS (
    SELECT doc_id,
           CASE WHEN greatest(width, height) > 256
                THEN 256.0 / greatest(width, height) ELSE 1.0 END AS s,
           width, height
    FROM dec
)
SELECT doc_id,
       CAST(greatest(floor(width * s), 1) AS INTEGER) AS width,
       CAST(greatest(floor(height * s), 1) AS INTEGER) AS height
FROM scaled
""")
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_media(media_from_text(_t(spark, sf_dir, "documents")))
    return resize_media(decoded, 256).select("doc_id", "width", "height")


@query("media_frame_sample", f"""
WITH {DUCK_MEDIA.strip()}
SELECT m.doc_id, CAST(f.frame_idx AS INTEGER) AS frame_idx,
       CAST(floor(f.frame_idx * octet_length(m.media) / 4) AS BIGINT) AS byte_offset
FROM media m, (SELECT unnest(range(4)) AS frame_idx) f
WHERE m.media_type = 'video'
""")
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(media_from_text(_t(spark, sf_dir, "documents")), 4)


def _media_snapshot_oracle():
    from custom_python_vectordb_spark.queries._media_snapshot import (
        media_features_oracle_sql,
    )

    return media_features_oracle_sql()


@query("media_features", _media_snapshot_oracle, oracle_sf="sf0.01")
def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mock-embedding feature extraction over binary media. The pipeline
    is deterministic end-to-end (payload = text-derived bytes, digest =
    md5, embedding = seeded mock), so the r5 snapshot oracle freezes the
    sf0.01 rows (queries/_media_snapshot.py — the same upgrade as the
    partitioned-ANN snapshot): the former rows-only check becomes
    hash-checked. ``f0`` (first feature component) carries the
    content-sensitive surface — the norm alone is 1.0 by construction
    (the embedder normalizes)."""
    out = media_features(media_from_text(_t(spark, sf_dir, "documents")), 64)
    return out.select(
        "doc_id",
        F.size("features").alias("dim"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform("features", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
            4,
        ).alias("norm"),
        (F.round(F.element_at("features", 1).cast("double"), 6) + F.lit(0.0)).alias("f0"),
    )


def _gif_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic animated-GIF corpus: each document yields a 3-frame
    8×8 GIF whose palette indices derive from (doc_id, frame, pixel) —
    same convention as media_from_text (real positives, zero fixtures)."""
    from custom_python_vectordb_spark.operators.multimodal import encode_gif

    _enc = encode_gif  # closure cell → pickled by value

    def gen(batches):
        import numpy as np
        import pandas as pd

        pal = np.array(
            [[0, 0, 0], [60, 60, 60], [120, 120, 120], [255, 255, 255]], np.uint8
        )
        for pdf in batches:
            out = {"doc_id": [], "media": []}
            for i in pdf["doc_id"]:
                # per-doc multiplier makes the residue distribution (and so
                # the luma) genuinely content-sensitive: ×2 hits only even
                # indices, ×4 collapses to a constant, ×3 is uniform — any
                # LZW/composition bug perturbs the frozen means
                frames = [
                    ((np.arange(64, dtype=np.int64).reshape(8, 8)
                      * (2 + int(i) % 3) + int(i) * 13 + f * 31) % 4).astype(np.uint8)
                    for f in range(3)
                ]
                out["doc_id"].append(i)
                out["media"].append(_enc(frames, pal))
            yield pd.DataFrame(out)

    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .mapInPandas(gen, schema="doc_id long, media binary")
    )


def _gif_snapshot_oracle():
    from custom_python_vectordb_spark.queries._media_snapshot import (
        gif_frames_oracle_sql,
    )

    return gif_frames_oracle_sql()


@query("media_gif_frames", _gif_snapshot_oracle, oracle_sf="sf0.01")
def media_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF pipeline, driver-checked end to end: generate a
    deterministic 3-frame GIF per document (encode_gif), decode + sample
    2 evenly spaced composed frames (gif_frame_sample — pure-Python LZW,
    transparency/disposal composition), emit per-frame pixel luma. Every
    stage is deterministic, so the sf0.01 rows freeze as a snapshot
    oracle (queries/_media_snapshot.py) and the GIF codec is verified by
    the driver gate itself, not only by pytest."""
    from custom_python_vectordb_spark.operators.multimodal import gif_frame_sample

    out = gif_frame_sample(_gif_corpus(spark, sf_dir), 2)
    return out.select(
        "doc_id", "frame_idx", "n_total_frames", "width", "height",
        (F.round("mean_luma", 6) + F.lit(0.0)).alias("mean_luma"),
    )
