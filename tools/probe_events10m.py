"""Fourth-decade events-axis probe (r11).

The sweep's events axis spans 1000x (1K -> 1M events) but both sibling
axes carry an extra-decade probe (500K docs, 1M/2M vectors) while the
streaming/window family's heaviest rows (session_window tail 0.84-0.86,
rollup sketch) stop at 1M. This probe extends the events-driven family
one more decade: generate a 10M-event table (same recipe as
tools/gen_sf1.py — 30 days, 1,500 fixed users so events/user grows 10x,
Exp(50) values), run the heaviest events-driven queries at 1M and 10M,
and report
    alpha_4th = log10(t_10M / t_1M)
per query (1.0 = linear, the optimum for must-touch-every-event ops;
>1 = super-linear, a scale-killer candidate). Fixed user cardinality is
the ADVERSARIAL choice for the window family: per-key event streams grow
10x, so any per-key quadratic (session merge, percentile buffers) shows
up here rather than being diluted by new keys.

Usage: python tools/probe_events10m.py   (writes ~250 MB on first run)
The results table is appended to SCALING.md between PROBE markers.
"""

from __future__ import annotations

import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_EVENTS = 10_000_000
N_USERS = 1_500  # fixed across sf in the driver data (events/user grows)
OUT = os.path.join(_REPO, ".bench", "events10m")
SF1 = os.path.join(_REPO, ".bench", "sf1")
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
US_DAY = 86_400_000_000

QUERIES = [
    "events_session_window",
    "events_tumbling_window",
    "events_sliding_window",
    "value_percentiles_by_type",
    "retention_cohorts",
    "rollup_sketch_certified",
    "events_anomaly_days",
]


def gen_corpus() -> None:
    done = os.path.join(OUT, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(10_042)
    ev_off = rng.integers(0, 30 * US_DAY, N_EVENTS)
    ev_off.sort()
    base_us = np.datetime64("2024-01-01", "us").astype(np.int64)
    props_k = rng.integers(0, 100, N_EVENTS)
    tbl = pa.table({
        "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)),
        "ts": pa.array(base_us + ev_off, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS)),
        "event_type": pa.array([EVENT_TYPES[i] for i in rng.integers(0, 5, N_EVENTS)]),
        "value": pa.array(np.round(rng.exponential(50.0, N_EVENTS), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in props_k]),
    })
    pq.write_table(
        tbl, os.path.join(OUT, "events.parquet"),
        row_group_size=200_000, compression="zstd",
    )
    with open(done, "w") as fh:
        fh.write("ok\n")
    print(f"generated {N_EVENTS:,} events -> {OUT}")


def main() -> None:
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    gen_corpus()
    if not os.path.exists(os.path.join(SF1, "_DONE")):
        import subprocess

        subprocess.run([sys.executable, os.path.join(_REPO, "tools", "gen_sf1.py")], check=True)

    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.session import get_spark

    registry.load_all()
    spark = get_spark("probe-events10m")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "| query | 1M events s | 10M events s | alpha_4th |",
        "|---|---|---|---|",
    ]
    for name in QUERIES:
        fn = getattr(registry.QUERIES[name], "__wrapped__")
        ts = {}
        for tag, sf_dir in (("1M", SF1), ("10M", OUT)):
            registry.clear_plan_memos()
            fn(spark, sf_dir).collect()  # warm
            best = float("inf")
            for _ in range(2):
                registry.clear_plan_memos()
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            ts[tag] = best
        alpha = math.log10(ts["10M"] / ts["1M"])
        lines.append(f"| {name} | {ts['1M']:.3f} | {ts['10M']:.3f} | {alpha:.2f} |")
        print(lines[-1], flush=True)

    block = "\n".join(lines)
    begin, end = "<!-- EVENTS10M PROBE BEGIN -->", "<!-- EVENTS10M PROBE END -->"
    section = (
        f"{begin}\n\n## Fourth decade, events axis (10M-event probe)\n\n"
        "tools/probe_events10m.py: the streaming/window family measured\n"
        "one decade past the sweep (1M -> 10M events, same recipe;\n"
        "user cardinality FIXED at 1,500 so per-key streams grow 10x —\n"
        "the adversarial choice for session/percentile state; alpha_4th\n"
        "= log10 time ratio across the 10x step, 1.0 is linear).\n\n"
        + block + "\n\n" + end
    )
    md = os.path.join(_REPO, "SCALING.md")
    src = open(md).read()
    if begin in src:
        src = src.split(begin)[0] + section + src.split(end)[1]
    else:
        src = src.rstrip() + "\n\n" + section + "\n"
    with open(md, "w") as fh:
        fh.write(src)
    print("SCALING.md updated")


if __name__ == "__main__":
    main()
