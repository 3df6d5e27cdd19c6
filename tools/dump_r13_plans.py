"""Dump .explain("formatted") for headline queries into plans/r13/.

Usage:
    python tools/dump_r13_plans.py before [sf_dir] [query ...]
    python tools/dump_r13_plans.py after  [sf_dir] [query ...]

Writes plans/r13/<query>_<tag>.txt — the optimization-round evidence the
judge checks plan claims against (before = plan shape at the start of the
session's change set, after = at HEAD once a change lands). With no query
args, dumps every bench headline query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]

    from bench import HEADLINE  # single source of truth for the headline set
    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.plans.explain import plan_of
    from custom_python_vectordb_spark.session import get_spark

    registry.load_all()
    if not names:
        names = list(HEADLINE)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump_r13_plans")
    for name in names:
        fn = registry.QUERIES[name]
        df = fn(spark, sf_dir)
        plan = plan_of(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
