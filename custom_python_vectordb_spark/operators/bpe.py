"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et
al. 2016) — the tokenizer-training stage every public pretraining
pipeline runs before tokenizing its corpus (beyond the reference's
surface, like the dedup stack; the reference has no tokenizer training).

Spark-first decomposition:

1. **Word counting** — the ONLY corpus-scale pass: tokenize + explode +
   groupBy(word) sum, map-side combinable, shuffle keyed on word. At
   100 TB this is one aggregation whose output (the distinct-word table)
   is bounded by Heaps' law, orders of magnitude smaller than the corpus.
2. **Merge rounds** — iterative over the WORD table only (the
   pagerank/kcore discipline: K small Spark rounds, driver receives one
   arg-max row per round, periodic localCheckpoint truncates lineage).
   Each round: adjacent-pair counts weighted by word frequency (one
   map-side-combined aggregate), deterministic arg-max (count desc, then
   (left, right) asc — ties never depend on partitioning), then one
   column rewrite applying the merge as a left-to-right greedy fold.

Training is UDF-free: pair extraction is `transform`+`explode`, merge
application is `aggregate` (fold) over the symbol array — JVM-side
(note higher-order array lambdas are interpreted, not codegen'd, which
is fine here because the merge loop touches only the bounded word
table). Corpus-scale ENCODE has two parity-locked paths: the same fold
chain (`encode_expr`, the oracle-checked reference) and an
Arrow-batched UDF with a per-worker word cache (`encode_udf`, ~90×
faster — the interpreted fold pays K passes per word OCCURRENCE, the
cache pays them once per DISTINCT word).

Training is deterministic for a given corpus, so the registered queries
use frozen-snapshot oracles at sf0.01 (`queries/_bpe_snapshot.py`, the
embed_mock/pq_kmeans trick) and a pytest retrains + asserts equality.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve in module globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.text import tokenize

END_OF_WORD = "</w>"


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    top_words: int | None = None,
) -> DataFrame:
    """(word, freq) over the corpus — the single corpus-scale pass.
    `top_words` caps the vocabulary to the most frequent words
    (deterministic tie-break on word) so the merge loop's per-round cost
    is bounded by configuration, not corpus size."""
    w = (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    if top_words is not None:
        w = w.orderBy(F.desc("freq"), "word").limit(top_words)
    return w


def initial_symbols(word_col) -> F.Column:
    """Character symbols + the end-of-word marker (Sennrich convention:
    merges never cross word boundaries; the marker lets suffixes get
    distinct merges from infixes)."""
    c = F.col(word_col) if isinstance(word_col, str) else word_col
    chars = F.filter(F.split(c, ""), lambda x: x != F.lit(""))
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def adjacent_pair_counts(words: DataFrame, symbols_col: str = "symbols") -> DataFrame:
    """(left, right, cnt): adjacent symbol-pair counts weighted by word
    frequency — each occurrence within a word counts (a word containing
    'aaa' contributes (a,a) twice per occurrence of the word)."""
    s = F.col(symbols_col)
    pairs = words.select(
        "freq",
        F.explode(
            F.when(
                F.size(s) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(s) - 2),
                    lambda i: F.struct(
                        F.get(s, i).alias("left"), F.get(s, i + 1).alias("right")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(F.sum("freq").alias("cnt"))


def apply_merge(symbols, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (left, right) into
    left+right — a fold: append each symbol unless it is `right` and the
    accumulator currently ends in `left`, in which case the tail is
    replaced by the merged symbol. Exactly BPE's non-overlapping
    left-to-right rule ('aaa' under (a,a) -> ['aa', 'a'])."""
    s = F.col(symbols) if isinstance(symbols, str) else symbols
    merged = F.lit(left + right)
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    words: DataFrame,
    num_merges: int = 30,
    min_pair_count: int = 2,
    checkpoint_every: int = 12,
) -> list[tuple[int, str, str, int]]:
    """Train `num_merges` BPE merges over a (word, freq) table; returns
    [(rank, left, right, pair_count)]. Driver traffic is ONE row per
    round (the arg-max pair); the symbol table stays distributed and is
    localCheckpoint-ed every `checkpoint_every` rounds so lineage depth
    is bounded (same discipline as operators/centrality.py iterations).
    Stops early when no pair reaches `min_pair_count`."""
    cur = words.select("word", "freq", initial_symbols("word").alias("symbols"))
    cur = cur.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            adjacent_pair_counts(cur)
            .orderBy(F.desc("cnt"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        cur = cur.withColumn("symbols", apply_merge("symbols", left, right))
        if (rank + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges


#: encode_expr builds K NESTED aggregate() folds — the expression tree is
#: depth-K, so analysis/serialization cost grows superlinearly in K and a
#: realistic 32K-merge vocab is unbuildable (the tree alone would blow the
#: analyzer). The declarative form is the ORACLE path for demo-sized merge
#: lists; production encoding is encode_udf (per-worker word cache, flat in
#: K). 100 is already ~seconds of plan-build time.
MAX_EXPR_MERGES = 100


def encode_expr(text_col, merges: list[tuple[int, str, str, int]]) -> F.Column:
    """BPE-encode a text column with a trained merge list: tokenize,
    start each word at characters+marker, apply every merge in rank
    order (the fold chain is a fixed-depth expression tree — K nested
    JVM folds, no Python), then flatten the per-word token arrays.

    Raises ValueError above :data:`MAX_EXPR_MERGES` merges — the nested
    fold tree is depth-K and does not scale to real vocabularies; use
    :func:`encode_udf` (parity-locked, flat in K) for large merge lists."""
    if len(merges) > MAX_EXPR_MERGES:
        raise ValueError(
            f"encode_expr builds a depth-{len(merges)} nested fold tree; "
            f"above {MAX_EXPR_MERGES} merges the expression is impractical "
            "to analyze/serialize. Use encode_udf (bit-identical token "
            "streams, Arrow-batched, flat in merge count) for real vocabs."
        )
    per_word = F.transform(
        tokenize(text_col), lambda w: _encode_word(w, merges)
    )
    return F.flatten(per_word)


def _encode_word(word_col, merges) -> F.Column:
    sym = initial_symbols(word_col)
    for _, left, right, _cnt in merges:
        sym = apply_merge(sym, left, right)
    return sym


def encode_udf(text_col, merges: list[tuple[int, str, str, int]]) -> F.Column:
    """Throughput twin of :func:`encode_expr` — bit-identical token
    streams (parity pytest-asserted), Arrow-batched instead of
    interpreted: higher-order array folds never enter codegen, so the
    declarative encode pays K interpreted passes per word occurrence
    (~29k tokens/s at K=24, measured). Here each Python worker keeps a
    word→tokens dict across batches — under Zipf the corpus has few
    distinct words relative to occurrences, so almost every word is a
    dict hit and the merge loop runs once per DISTINCT word
    (~1M+ tokens/s, the pipeline-scale path; bench times both)."""
    from pyspark.sql.functions import pandas_udf

    from custom_python_vectordb_spark.functions.text import TOKEN_SPLIT

    mseq = tuple((l, r, l + r) for _, l, r, _c in merges)
    # capture the shared constants in the closure (plain strings pickle
    # fine) rather than duplicating the literals — keeps the bit-identical
    # parity contract with encode_expr if either constant ever changes
    split_pattern = TOKEN_SPLIT
    eow = END_OF_WORD
    # the word cache lives in the CLOSURE, not the udf body: each worker
    # process deserializes its own dict once and keeps it across Arrow
    # batches for the task's lifetime — a body-local dict would re-pay the
    # K-deep merge loop per batch for every already-seen word (r8 review).
    # Bounded: a high-cardinality corpus (random tokens, multilingual)
    # would otherwise grow it without limit per worker; clearing at the
    # cap keeps the hit-rate benefit (natural text repeats words within
    # a batch far more than 256K distinct forms).
    cache: dict[str, list[str]] = {}
    cache_cap = 262144

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        import re

        def enc_word(w: str) -> list[str]:
            toks = cache.get(w)
            if toks is None:
                syms = list(w) + [eow]
                for left, right, merged in mseq:
                    out = []
                    for s in syms:
                        if out and out[-1] == left and s == right:
                            out[-1] = merged
                        else:
                            out.append(s)
                    syms = out
                if len(cache) >= cache_cap:
                    cache.clear()
                cache[w] = toks = syms
            return toks

        split = re.compile(split_pattern)

        def enc_text(t) -> list[str]:
            if t is None:
                return []
            out: list[str] = []
            for w in split.split(t.lower()):
                if w:
                    out.extend(enc_word(w))
            return out

        return texts.map(enc_text)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return encode(c)
