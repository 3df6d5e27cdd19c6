"""Regenerate queries/_semdedup_snapshot.py: the frozen two-level trained
SemDeDup centroids at sf0.01 (the `_pq_snapshot.py` discipline — train once,
freeze the output, let the oracle inline it and pytest retrain-assert it).

Run: python tools/gen_semdedup_snapshot.py  (writes the module in place)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "custom_python_vectordb_spark",
    "queries",
    "_semdedup_snapshot.py",
)

HEADER = '''"""Frozen two-level SemDeDup centroids: deterministic Lloyd k-means
(operators/similarity.train_semdedup_centroids — coarse driver-side on a
hash-stride sample, fine per-coarse-cell distributed; RNG-free, id-sorted,
bit-deterministic across session configs) trained on the sf0.01 augmented
corpus (embeddings + the 10 injected clones, the `semdedup_keep` corpus).

The `semdedup_keep` oracle inlines these as SQL VALUES; the query retrains
at runtime and must reproduce them exactly at sf0.01 — pytest retrains and
asserts equality so silent drift (NumPy/Spark version change, training
edit) fails tests, not the driver gate. Regenerate with
tools/gen_semdedup_snapshot.py.
"""

# [(coarse_id, [float64 x dim])]
SEMDEDUP_COARSE_SF001 = [
'''

MID = ''']

# [(coarse_id, fused_cluster_id, [float64 x dim])]
SEMDEDUP_FINE_SF001 = [
'''


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.operators.similarity import (
        train_semdedup_centroids,
    )
    from custom_python_vectordb_spark.sources.catalog import load_table

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    dupes = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(dupes)
    coarse_rows, fine_df = train_semdedup_centroids(aug)
    fine_rows = sorted(
        (int(r["coarse"]), int(r["cluster"]), [float(x) for x in r["cvec"]])
        for r in fine_df.collect()
    )
    with open(OUT, "w") as fh:
        fh.write(HEADER)
        for cid, v in coarse_rows:
            fh.write(f"    ({cid}, {[float(x) for x in v]!r}),\n")
        fh.write(MID)
        for co, cl, v in fine_rows:
            fh.write(f"    ({co}, {cl}, {v!r}),\n")
        fh.write("]\n")
    print(f"wrote {OUT}: {len(coarse_rows)} coarse, {len(fine_rows)} fine")
    spark.stop()


if __name__ == "__main__":
    main()
