"""Exact shared-substring span detection across documents.

The distributed, suffix-array-free form of substring-level training-data
dedup (Lee et al., "Deduplicating Training Data Makes Language Models
Better"): two documents sharing an exact run of >= `min_span` tokens are
flagged even when their overall Jaccard similarity is low — the case
MinHash-style whole-document dedup misses (a long quoted passage inside two
otherwise-different pages).

Plan shape (all built-ins, two shuffles on a uniform 64-bit key):

1. one projection turns each document into positional token `n`-grams,
   hashed to 64 bits INSIDE the transform lambda — gram strings are never
   materialized, the shuffle carries (doc_id, pos, gram_h) only;
2. gram document-frequency cutoff `min_df..max_df`: grams in one document
   match nothing, grams in more than `max_df` documents are boilerplate
   (detected/removed by its own operator, `boilerplate_ngrams`) and would
   fan the self-join out quadratically — dropping them caps per-gram join
   work at `max_df**2` rows, making the candidate join linear in the true
   shared-span count;
3. self-join on gram_h (`doc_a < doc_b`) then the classic diagonal trick:
   matches of one contiguous shared span all have the same
   `diag = pos_a - pos_b`, and within a (pair, diag) group consecutive
   positions collapse via `pos_a - row_number()` into one run id — a
   window over keys the rows are ALREADY shuffled by;
4. runs of c consecutive grams = a shared span of `c + n - 1` tokens.

The 64-bit gram hash admits a 2^-64 collision per gram pair (could merge two
distinct grams); the DuckDB oracle joins on the gram STRING, so a collision
would fail the hash gate loudly rather than pass silently.

At 100 TB the filtered gram table (step 2's output) is the thing to
materialize once, partitioned by gram_h — it doubles as the incremental
index for new-batch-vs-history probing, the same layout
``streaming/neardup_maintenance.py`` uses for MinHash bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.text import tokenize


def positional_gram_hashes(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, gram_h): 64-bit hashes of every positional token
    n-gram. Not distinct — position matters; repeated grams keep each
    occurrence (a run of a repeated phrase is still a run)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("t")
    ).filter(F.size("t") >= n)
    return toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", *[F.get(F.col("t"), i + j) for j in range(n)])
                ),
            )
        ).alias("pos", "gram_h"),
    )


def spans_from_matches(matches: DataFrame, n: int, min_span: int) -> DataFrame:
    """Collapse per-gram matches (doc_a, doc_b, pos_a, diag) into maximal
    shared runs and aggregate per pair. `matches` must be duplicate-free
    per (doc_a, doc_b, pos_a, diag) — duplicates would break the
    consecutive-position row_number trick."""
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = matches.withColumn("grp", F.col("pos_a") - F.row_number().over(w))
    spans = runs.groupBy("doc_a", "doc_b", "diag", "grp").agg(
        (F.count(F.lit(1)) + (n - 1)).alias("span_tokens")
    )
    return (
        spans.filter(F.col("span_tokens") >= min_span)
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("span_tokens").alias("max_span_tokens"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )


def shared_span_pairs(
    docs: DataFrame | None = None,
    n: int = 5,
    min_df: int = 2,
    max_df: int = 16,
    min_span: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    grams: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, max_span_tokens, n_spans): document pairs sharing at
    least one exact token run of >= `min_span` tokens, with the longest
    shared run and the count of distinct qualifying runs.

    `grams`: a pre-built (doc_id, pos, gram_h) table (see
    ``sources/corpus_view.doc_gram_table``) — the gram projection appears
    under BOTH the df-aggregate and the candidate join, so passing a
    materialized table halves the heaviest stage; when omitted it is
    derived from `docs` inline."""
    if grams is None:
        grams = positional_gram_hashes(docs, n=n, id_col=id_col, text_col=text_col)
    keep = (
        grams.groupBy("gram_h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
        .select("gram_h")
    )
    g = grams.join(keep, "gram_h")
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "gram_h")
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "gram_h")
    pairs = (
        a.join(b, "gram_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a", (F.col("pos_a") - F.col("pos_b")).alias("diag"))
    )
    return spans_from_matches(pairs, n, min_span)
