"""Versioned-store (lakehouse) lifecycle end-to-end: the table-format
features a production vector corpus needs, on the real test tables.

  create → append batches → row-level delete via DELETION VECTORS
  (O(deleted-keys), no rewrite) → time travel to pre-delete state →
  OPTIMIZE ZORDER BY (materializes deletes, compacts, clusters) →
  zero-copy SHALLOW CLONE → independent evolution → vacuum.

    python examples/lakehouse_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from custom_python_vectordb_spark.session import get_spark
from custom_python_vectordb_spark.sources.catalog import load_table
from custom_python_vectordb_spark.sources.versioned import VersionedWarehouse


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("lakehouse-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lakehouse_")
    wh = VersionedWarehouse(spark, root)

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    print(f"warehouse at {root}")

    v0 = wh.save("events", ev.filter(F.col("event_id") % 2 == 0))
    v1 = wh.save("events", ev.filter(F.col("event_id") % 2 == 1), mode="append")
    print(f"v{v0} initial load, v{v1} append → rows={wh.load('events').count()}")

    v2 = wh.delete_where("events", F.col("event_type") == "error", key_col="event_id")
    print(
        f"v{v2} deletion vector (no rewrite) → rows={wh.load('events').count()}; "
        f"time travel v{v1} still has {wh.load('events', version=v1).count()}"
    )

    v3 = wh.optimize("events", zorder_by=["user_id", "value"])
    m = wh.history("events")[-1]
    print(
        f"v{v3} OPTIMIZE ZORDER BY(user_id, value): deletes materialized "
        f"(n_deletes={len(m['deletes'])}), rows={wh.load('events').count()}"
    )

    wh.clone("events", "events_dev")
    wh.delete_where("events_dev", F.col("value") > 100, key_col="event_id")
    print(
        f"shallow clone events_dev: rows={wh.load('events_dev').count()} "
        f"(source unaffected: {wh.load('events').count()})"
    )

    # MERGE INTO: update 100 rows in place, insert 10 new ones — the
    # manifest-pruned write path rewrites only dirs whose key range meets
    # the source keys
    src = (
        wh.load("events")
        .filter(F.col("event_id") < 100)
        .withColumn("value", F.col("value") + 1000.0)
        .unionByName(
            ev.filter(F.col("event_id") < 10).select(
                (F.col("event_id") + 10_000_000).alias("event_id"),
                "user_id", "event_type", "value",
            )
        )
    )
    v4 = wh.merge_into("events", src, "event_id", stats_cols=["event_id"])
    m = wh.history("events")[-1]
    print(
        f"v{v4} MERGE: touched {m['merge_touched']} dir(s), carried "
        f"{m['merge_untouched']} by reference → rows={wh.load('events').count()}"
    )
    feed = wh.diff("events", v3, v4, "event_id").groupBy("_change").count().collect()
    print("change feed v%d→v%d: %s" % (v3, v4, {r["_change"]: r["count"] for r in feed}))

    gone = wh.vacuum("events", keep_last=2)
    print(f"vacuum removed {len(gone)} unreferenced data dirs; history intact for last 2 versions")


if __name__ == "__main__":
    main()
