"""Training-data curation funnel on the real test tables: dedup → quality
→ language → split → pack. Prints the funnel row counts end-to-end.

    python examples/pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.hashing import hash48
from custom_python_vectordb_spark.functions.text import langid_predict, quality_score, tokenize
from custom_python_vectordb_spark.operators.components import dedup_clusters
from custom_python_vectordb_spark.operators.dedup import (
    doc_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)
from custom_python_vectordb_spark.session import get_spark
from custom_python_vectordb_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs.count()
    print(f"corpus: {n0} docs ({sf_dir})")

    # 1. near-dup removal: MinHash → LSH candidates → Jaccard ≥ 0.85 → clusters
    sh = doc_shingles(docs).localCheckpoint(eager=False)
    sigs = minhash_signatures(docs, shingles=sh)
    cands = lsh_candidate_pairs(sigs)
    pairs = jaccard_pairs(docs, threshold=0.85, restrict_pairs=cands, shingles=sh).select("a", "b")
    clusters = dedup_clusters(pairs)
    members = (
        pairs.select(F.col("a").alias("doc_id")).union(pairs.select("b")).distinct()
        .join(clusters.select(F.col("keeper").alias("doc_id")), "doc_id", "left_anti")
    )
    kept = docs.join(members, "doc_id", "left_anti")
    n1 = kept.count()
    print(f"after near-dup removal (Jaccard ≥ 0.85, keep one per cluster): {n1} (-{n0 - n1})")

    # 2. quality + language gates
    scored = kept.withColumn("q", quality_score("text")).withColumn(
        "lang_pred", langid_predict("text")
    )
    clean = scored.filter((F.col("q") >= 0.55) & (F.col("lang_pred") != "und"))
    n2 = clean.count()
    print(f"after quality ≥ 0.55 and lang-id != und: {n2} (-{n1 - n2})")

    # 3. deterministic split
    bucket = hash48(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    with_split = clean.withColumn("split", split)
    for r in with_split.groupBy("split").count().orderBy("split").collect():
        print(f"  split {r['split']}: {r['count']}")

    # 4. pack the train split into ~512-token sequences
    train = with_split.filter(F.col("split") == "train").select(
        "doc_id", F.size(tokenize("text")).cast("long").alias("n_tokens")
    )
    key = hash48(F.concat(F.lit("pack|"), F.col("doc_id").cast("string")))
    w = Window.orderBy(key, F.col("doc_id")).rowsBetween(Window.unboundedPreceding, 0)
    bins = (
        train.withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("bin", F.expr("(cum - 1) div 512"))
        .groupBy("bin").agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens"))
    )
    stats = bins.agg(
        F.count(F.lit(1)).alias("n_bins"), F.round(F.avg("tokens"), 1).alias("avg_tokens")
    ).collect()[0]
    print(f"packed train into {stats['n_bins']} ~512-token sequences (avg {stats['avg_tokens']} tokens)")

    # 5. train the tokenizer on the curated train split, then encode with it
    from custom_python_vectordb_spark.operators.bpe import (
        encode_udf,
        train_bpe,
        word_counts,
    )

    train_docs = with_split.filter(F.col("split") == "train").select("doc_id", "text")
    merges = train_bpe(word_counts(train_docs, top_words=500), num_merges=24)
    print(f"trained {len(merges)} BPE merges (top: "
          + ", ".join(f"{l}+{r}" for _, l, r, _ in merges[:5]) + " ...)")
    enc = train_docs.select(F.size(encode_udf("text", merges)).alias("n"))
    row = enc.agg(F.sum("n").alias("total"), F.round(F.avg("n"), 1).alias("avg")).collect()[0]
    print(f"encoded train split: {row['total']} BPE tokens (avg {row['avg']}/doc)")

    # 6. embedding-space curation: semantic dedup (trained two-level
    # cells) then cluster-balanced re-sampling — the D4 order
    from custom_python_vectordb_spark.functions.local_relation import local_df
    from custom_python_vectordb_spark.operators.similarity import (
        assign_cells_two_level,
        train_semdedup_centroids,
        within_cell_neardup_losers,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_emb = emb.count()
    coarse_rows, fine_df = train_semdedup_centroids(emb)
    coarse_df = local_df(spark, coarse_rows, "cluster int, cvec array<double>")
    assigned = assign_cells_two_level(emb, coarse_df, fine_df).localCheckpoint(eager=True)
    losers = within_cell_neardup_losers(assigned, threshold=0.95)
    kept = assigned.join(losers, "vec_id", "left_anti")
    n_kept = kept.count()
    print(f"semantic dedup: {n_emb} vectors -> {n_kept} kept "
          f"({len(coarse_rows)} coarse cells)")
    cap = 32
    w2 = Window.partitionBy("cluster").orderBy(
        hash48(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    balanced = kept.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= cap)
    print(f"cluster-balanced sample (cap {cap}/cell): {balanced.count()} vectors")

    # 7. epoch-reproducible training order over the curated docs
    from custom_python_vectordb_spark.functions.hashing import seeded_hash48
    from custom_python_vectordb_spark.operators.ranking import global_rank

    epoch = 1
    order = global_rank(
        train_docs.withColumn("h", seeded_hash48(F.col("doc_id").cast("string"), epoch)),
        [F.asc("h"), F.asc("doc_id")],
        rank_col="position",
    )
    head = [r["doc_id"] for r in order.orderBy("position").limit(5).collect()]
    print(f"epoch {epoch} training order starts: {head} (same seed -> same order)")


if __name__ == "__main__":
    main()
