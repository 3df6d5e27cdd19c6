"""Core-scaling probe at generated sf1 (r14, VERDICT r13 #6).

The driver's 8-vs-32-core probe runs at sf0.1, where every headline query
is job-floor-bound (sub-second, 4-11 jobs x ~80-110 ms floor) — ratios
land at 0.6-1.7 and say nothing about parallelism. This probe re-runs the
23 headline queries at the deterministic local sf1 (tools/gen_sf1.py,
10x sf0.1: 6M lineitem / 1M events / 50K documents / 100K embeddings)
under local[8] and local[32] in FRESH processes, with the bench's exact
per-query methodology (fresh-plan build+collect, warm-up + min-of-3), and
records ratio = t8/t32 per query. Perfect scaling would read 4; the floor
fraction at sf1 sets the realistic ceiling per query.

Usage:  python tools/scaling_cores.py            # writes SCALING_CORES_r14.json
        python tools/scaling_cores.py --inner 8  # (internal) one timing pass
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".bench", "sf1")
OUT = os.path.join(REPO, "SCALING_CORES_r14.json")


def _headline() -> list[str]:
    import bench

    return list(bench.HEADLINE)


def inner(cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.session import get_spark

    registry.load_all()
    spark = get_spark(f"scaling-cores-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in _headline() if n in registry.QUERIES]
    spark.read.parquet(os.path.join(SF1, "embeddings.parquet")).count()
    registry.QUERIES[names[0]](spark, SF1).collect()
    timings: dict[str, float] = {}
    for name in names:
        memo_fn = registry.QUERIES[name]
        fn = getattr(memo_fn, "__wrapped__", memo_fn)
        registry.clear_plan_memos()
        # noop sink, NOT collect (guide §1.4): several headline queries
        # return row counts that scale with the data (text_quality 50K,
        # events_session_window ~1M at sf1), and a collect() probe times
        # the SERIAL py4j result fetch (~70 us/row) instead of the
        # computation whose parallelism this artifact exists to measure.
        # bench.py's primary series stays collect-based (its contract).
        fn(spark, SF1).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            registry.clear_plan_memos()
            t0 = time.perf_counter()
            fn(spark, SF1).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print("JSON:" + json.dumps(timings))
    spark.stop()


def main() -> None:
    if "--inner" in sys.argv:
        inner(int(sys.argv[sys.argv.index("--inner") + 1]))
        return
    if not os.path.exists(os.path.join(SF1, "_DONE")):
        raise SystemExit("run tools/gen_sf1.py first")
    results: dict[str, dict[str, float]] = {}
    for cpus in (8, 32):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", str(cpus)],
            capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("JSON:")]
        if not line:
            sys.stderr.write(r.stderr[-2000:])
            raise SystemExit(f"inner run at {cpus} cores produced no result")
        results[f"c{cpus}"] = json.loads(line[-1][5:])
    ratios = {
        q: round(results["c8"][q] / results["c32"][q], 2)
        for q in results["c8"]
        if results["c32"].get(q)
    }
    artifact = {
        "protocol": "fresh process per core count, local sf1 "
                    "(tools/gen_sf1.py), bench.py per-query methodology "
                    "(fresh plan, warm-up + min-of-3 noop-sink execution)",
        "sf1_rows": {"lineitem": 6_000_000, "events": 1_000_000,
                     "documents": 50_000, "embeddings": 100_000},
        "t8_s": results["c8"],
        "t32_s": results["c32"],
        "ratio_8_over_32": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
    }
    with open(OUT, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact["ratio_8_over_32"], indent=1))


if __name__ == "__main__":
    main()
