"""Interleaved same-box A/B subset timer (r12, VERDICT r11 task 1).

Times a comma-separated query subset against an ARBITRARY repo tree
(worktree of an old commit or the live HEAD) with exactly the bench.py
primary-series protocol: fresh plan per run (`__wrapped__` +
`registry.clear_plan_memos()`), one warm-up execution, min-of-3 timed
runs. Prints ONE JSON line with per-query seconds, the subset total, and
a single-thread memory-bandwidth anchor so co-tenant traffic is visible
next to the numbers (same calibration idea as bench.py's mem_bw_gbps).

Usage (fresh process per invocation — alternate the trees):
    python tools/ab_family.py <tree> knn_cosine,knn_filtered [sf_dir]

Cross-round artifact deltas alone prove nothing on a shared box (r9's
phantom +11%, r10's phantom analytic inflation); this interleaved
protocol is the decider the last three rounds used by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _mem_bw_gbps() -> float:
    import numpy as np

    q = np.random.default_rng(7).standard_normal(128).astype(np.float32)
    mats = [
        np.random.default_rng(i).standard_normal((2000, 128)).astype(np.float32)
        for i in range(64)
    ]
    for m in mats:
        m @ q
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for m in mats:
            m @ q
        best = min(best, time.perf_counter() - t0)
    return round(64 * 2000 * 128 * 4 / best / 1e9, 2)


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    sys.path.insert(0, tree)

    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.session import get_spark

    registry.load_all()
    spark = get_spark("ab_family")
    spark.sparkContext.setLogLevel("ERROR")
    # session-level warm-up, identical to bench.py main()
    spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    registry.QUERIES[names[0]](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    disp: dict[str, list[float]] = {}
    for name in names:
        memo_fn = registry.QUERIES[name]
        fn = getattr(memo_fn, "__wrapped__", memo_fn)
        registry.clear_plan_memos()
        fn(spark, sf_dir).collect()  # per-query warm-up
        totals = []
        for _ in range(3):
            registry.clear_plan_memos()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            totals.append(time.perf_counter() - t0)
        timings[name] = round(min(totals), 4)
        disp[name] = [round(t, 4) for t in sorted(totals)]
    print(
        json.dumps(
            {
                "tree": tree,
                "sf_dir": sf_dir,
                "queries": timings,
                "total": round(sum(timings.values()), 4),
                "disp": disp,
                "mem_bw_gbps": _mem_bw_gbps(),
            }
        )
    )


if __name__ == "__main__":
    main()
