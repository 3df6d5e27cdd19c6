"""Structured Streaming execution path: file-source stream over the events
table, availableNow trigger, memory sinks. Asserts stream results equal the
batch plans (which are themselves oracle-checked)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.sources.catalog import load_table
from custom_python_vectordb_spark.streaming.events import (
    read_event_stream,
    subscription_filter,
    tumbling_counts,
)


def run_to_memory(stream_df, name: str, mode: str = "complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_stream_tumbling_equals_batch(spark, sf_small):
    stream = read_event_stream(spark, sf_small)
    q = run_to_memory(tumbling_counts(stream, "1 hour"), "t_tumble")
    got = rows_set(spark.sql("select * from t_tumble"), ["window_start", "event_type", "n"])
    batch = rows_set(
        tumbling_counts(load_table(spark, sf_small, "events"), "1 hour"),
        ["window_start", "event_type", "n"],
    )
    assert got == batch
    q.stop()


def test_stream_subscription_filter(spark, sf_small):
    stream = read_event_stream(spark, sf_small).filter(
        subscription_filter(event_types=["error"])
    )
    q = run_to_memory(stream.select("event_id"), "t_sub", mode="append")
    got = spark.sql("select count(*) n from t_sub").collect()[0]["n"]
    batch = load_table(spark, sf_small, "events").filter(F.col("event_type") == "error").count()
    assert got == batch > 0
    q.stop()


def test_two_subscribers_one_source(spark, sf_small):
    """R3 — N independent streaming queries over the same source."""
    s1 = read_event_stream(spark, sf_small).filter(subscription_filter(event_types=["click"]))
    s2 = read_event_stream(spark, sf_small).filter(subscription_filter(event_types=["view"]))
    q1 = run_to_memory(s1.select("event_id"), "t_sub1", mode="append")
    q2 = run_to_memory(s2.select("event_id"), "t_sub2", mode="append")
    ev = load_table(spark, sf_small, "events")
    assert spark.sql("select count(*) n from t_sub1").collect()[0]["n"] == ev.filter(
        F.col("event_type") == "click"
    ).count()
    assert spark.sql("select count(*) n from t_sub2").collect()[0]["n"] == ev.filter(
        F.col("event_type") == "view"
    ).count()
    q1.stop()
    q2.stop()


def test_watermarked_append_emits_closed_windows(spark, sf_small):
    """Watermark bounds state; with availableNow the watermark advances to
    max(ts) − delay after the batch, so every window older than that is
    emitted in append mode."""
    stream = read_event_stream(spark, sf_small)
    q = run_to_memory(
        tumbling_counts(stream, "1 hour", watermark="10 minutes"), "t_wm", mode="append"
    )
    emitted = rows_set(spark.sql("select * from t_wm"), ["window_start", "event_type", "n"])
    batch = rows_set(
        tumbling_counts(load_table(spark, sf_small, "events"), "1 hour"),
        ["window_start", "event_type", "n"],
    )
    # emitted windows are a subset of batch truth, with identical counts,
    # and only the final (still-open) window may be withheld
    assert emitted <= batch
    missing = {w for w, *_ in batch - emitted}
    assert len(missing) <= len({w for w, *_ in batch}) and len(emitted) > 0
    for row in emitted:
        assert row in batch
    q.stop()


def test_stateful_running_totals(spark, sf_small):
    """applyInPandasWithState: per-user running aggregates; final state
    equals the batch groupBy."""
    from custom_python_vectordb_spark.streaming.stateful import running_user_totals

    stream = read_event_stream(spark, sf_small)
    q = run_to_memory(running_user_totals(stream), "t_state", mode="update")
    # memory sink in update mode appends every state emission; the LAST row
    # per user is the final state
    final = spark.sql(
        "select user_id, count, total from "
        "(select *, row_number() over (partition by user_id order by count desc) rn from t_state) "
        "where rn = 1"
    )
    got = {r["user_id"]: (r["count"], round(r["total"], 6)) for r in final.collect()}
    ev = load_table(spark, sf_small, "events")
    exp = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")).collect()
    }
    assert got == exp
    q.stop()


def test_stream_static_enrichment(spark, sf_small):
    """Stream-static broadcast join: every event gets its user's tier."""
    from custom_python_vectordb_spark.streaming.events import enrich_stream

    static = (
        load_table(spark, sf_small, "events")
        .select("user_id").distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("int"))
    )
    stream = enrich_stream(read_event_stream(spark, sf_small), static)
    q = run_to_memory(stream.select("event_id", "user_id", "tier"), "t_enrich", mode="append")
    rows = spark.sql("select * from t_enrich").collect()
    assert len(rows) == load_table(spark, sf_small, "events").count()
    assert all(r["tier"] == r["user_id"] % 3 for r in rows)
    q.stop()


def test_stream_dedup_within_watermark(spark, sf_small):
    """Union of two reads of the same source = every event twice; streaming
    dropDuplicates on event_id restores exactly-once."""
    from custom_python_vectordb_spark.streaming.events import dedup_stream

    doubled = read_event_stream(spark, sf_small).unionByName(read_event_stream(spark, sf_small))
    q = run_to_memory(dedup_stream(doubled).select("event_id"), "t_dedup", mode="append")
    got = spark.sql("select count(*) n, count(distinct event_id) d from t_dedup").collect()[0]
    expect = load_table(spark, sf_small, "events").count()
    assert got["n"] == got["d"] == expect
    q.stop()


def test_stateful_stream_dedup_counts_duplicates(spark, sf_small, tmp_path):
    """dedup_stream_stateful across TWO micro-batches (maxFilesPerTrigger=1
    over two parquet files whose texts overlap): exactly one is_first row
    per content hash, a stable first_doc_id, and a final dup_count equal to
    occurrences-1 — the accounting dropDuplicates cannot produce."""
    from custom_python_vectordb_spark.streaming.events import read_document_stream
    from custom_python_vectordb_spark.streaming.stateful import dedup_stream_stateful

    docs = load_table(spark, sf_small, "documents").limit(40).select("doc_id", "text", "lang", "source", "n_chars")
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)  # batch 1: originals
    docs.withColumn("doc_id", F.col("doc_id") + 100000).coalesce(1).write.mode("append").parquet(src)  # batch 2: same texts, new ids

    stream = read_document_stream(spark, src, max_files_per_trigger=1).withColumn(
        "content_hash", F.md5("text")
    )
    q = run_to_memory(dedup_stream_stateful(stream), "t_sdedup", mode="update")
    out = spark.table("t_sdedup").collect()
    q.stop()

    occurrences = {
        r["content_hash"]: r["n"]
        for r in spark.read.parquet(src)
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(out) >= 2 * len(set(occurrences)) - len(occurrences)  # ≥1 row/key, 2 for cross-batch keys
    first_rows = [r for r in out if r["is_first"]]
    assert len(first_rows) == len(occurrences)  # exactly one birth per hash
    by_hash: dict = {}
    for r in out:
        by_hash.setdefault(r["content_hash"], []).append(r)
    for h, rows in by_hash.items():
        assert len({r["first_doc_id"] for r in rows}) == 1  # stable winner
        assert max(r["dup_count"] for r in rows) == occurrences[h] - 1


def test_foreachbatch_ingest_to_warehouse(spark, sf_small, tmp_path):
    """R1 — continuous ingest into a Parquet collection via foreachBatch."""
    from custom_python_vectordb_spark.sources.warehouse import Warehouse
    from custom_python_vectordb_spark.streaming.events import ingest_to_warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.save("ingested", read_event_stream(spark, sf_small).select("event_id").limit(0).sparkSession.createDataFrame([], "event_id long, event_type string"))
    stream = read_event_stream(spark, sf_small).select("event_id", "event_type")
    q = ingest_to_warehouse(stream, wh, "ingested").trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert wh.load("ingested").count() == load_table(spark, sf_small, "events").count()
    q.stop()


def test_checkpoint_recovery_stateful(spark, sf_small, tmp_path):
    """R4/recovery — stop a stateful query, add new input, restart from the
    SAME checkpoint: per-key state survives the restart (phase-2 outputs
    include phase-1 contributions) and phase-1 files are not reprocessed."""
    from custom_python_vectordb_spark.streaming.stateful import running_user_totals

    indir, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    ev = load_table(spark, sf_small, "events").select("user_id", "ts", "value")
    half1 = ev.filter(F.col("event_id") % 2 == 0) if "event_id" in ev.columns else None
    ev_full = load_table(spark, sf_small, "events").select("event_id", "user_id", "ts", "value")
    half1 = ev_full.filter(F.col("event_id") % 2 == 0).drop("event_id")
    half2 = ev_full.filter(F.col("event_id") % 2 == 1).drop("event_id")
    half1.write.mode("append").parquet(indir)

    def run_phase(outdir):
        # memory sink cannot recover from a checkpoint; foreachBatch into
        # parquet is the recoverable-sink pattern
        stream = spark.readStream.schema(half1.schema).parquet(indir)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(outdir)

        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    out1, out2 = str(tmp_path / "out1"), str(tmp_path / "out2")
    run_phase(out1)
    assert spark.read.parquet(out1).count() > 0

    half2.write.mode("append").parquet(indir)
    run_phase(out2)
    t_cp2 = spark.read.parquet(out2)
    t_cp2.createOrReplaceTempView("t_cp2")

    # phase 2 emits only keys present in the NEW files (no reprocessing of
    # phase-1 input) ...
    phase2_users = {r["user_id"] for r in spark.sql("select distinct user_id from t_cp2").collect()}
    assert phase2_users == {r["user_id"] for r in half2.select("user_id").distinct().collect()}
    # ... and their state carries phase-1 counts: final (count, total) per
    # user equals the batch aggregate over BOTH halves
    final = spark.sql(
        "select user_id, count, total from "
        "(select *, row_number() over (partition by user_id order by count desc) rn from t_cp2) "
        "where rn = 1"
    )
    got = {r["user_id"]: (r["count"], round(r["total"], 6)) for r in final.collect()}
    exp_df = (
        load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .join(half2.select("user_id").distinct(), "user_id")
    )
    exp = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in exp_df.collect()}
    assert got == exp


def test_checkpoint_recovery_windowed_append(spark, sf_small, tmp_path):
    """Windowed agg + watermark across a restart: emitted windows after both
    phases match the batch truth with no duplicate emissions."""
    indir, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    ev = load_table(spark, sf_small, "events").select("event_id", "event_type", "ts")
    half1 = ev.filter(F.col("event_id") % 2 == 0).drop("event_id")
    half2 = ev.filter(F.col("event_id") % 2 == 1).drop("event_id")
    half1.write.mode("append").parquet(indir)

    def run_phase(outdir):
        stream = spark.readStream.schema(half1.schema).parquet(indir)
        counts = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("window_start"), "event_type", "n")
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(outdir)

        q = (
            counts.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    out1, out2 = str(tmp_path / "outw1"), str(tmp_path / "outw2")
    run_phase(out1)
    half2.write.mode("append").parquet(indir)
    run_phase(out2)

    p1 = spark.read.parquet(out1).collect()
    p2 = spark.read.parquet(out2).collect()
    assert p1 and p2
    keys = [(r["window_start"], r["event_type"]) for r in p1 + p2]
    assert len(keys) == len(set(keys)), "window emitted twice across restart"

    def truth(df):
        return {
            (r["ws"], r["event_type"]): r["n"]
            for r in df.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "event_type", "n")
            .collect()
        }

    # phase-1 closes windows over half1 only; a window closed after the
    # RESTART must carry the phase-1 state → its count equals the FULL batch
    half1_truth = truth(half1)
    full_truth = truth(load_table(spark, sf_small, "events"))
    for r in p1:
        assert half1_truth[(r["window_start"], r["event_type"])] == r["n"]
    for r in p2:
        assert full_truth[(r["window_start"], r["event_type"])] == r["n"]
    # at least one phase-2 window must actually have phase-1 contributions,
    # otherwise the state-survival claim is vacuous
    assert any(
        full_truth[(r["window_start"], r["event_type"])]
        > truth(half2).get((r["window_start"], r["event_type"]), 0)
        for r in p2
    )


def test_kafka_shaped_payload_parsing(spark, sf_small):
    """The Kafka source's value-projection maps wire JSON onto the exact
    schema read_event_stream produces, so downstream plans are
    source-agnostic (no broker needed to verify the mapping)."""
    from custom_python_vectordb_spark.streaming.events import parse_kafka_events

    ev = load_table(spark, sf_small, "events").limit(50)
    wire = ev.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                "event_id",
                # ts may load as TIMESTAMP_NTZ; session tz is UTC so the
                # cast is a pure type change before epoch extraction
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                "user_id", "event_type", "value", "props",
            )
        ).cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
    )
    parsed = parse_kafka_events(wire)
    assert parsed.schema == ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).schema
    a = {tuple(r) for r in parsed.collect()}
    b = {tuple(r) for r in ev.select("event_id", "ts", "user_id", "event_type", "value", "props").collect()}
    assert a == b


def test_stream_stream_interval_join(spark, sf_small):
    """Stream-stream inner join with an event-time interval condition and
    watermarks on both sides: each purchase pairs with that user's views
    from the preceding hour. Verified against the identical batch join."""
    ev = read_event_stream(spark, sf_small)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("pts"), "user_id"
    ).withWatermark("pts", "2 hours")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), F.col("ts").alias("vts"),
        F.col("user_id").alias("vuser"),
    ).withWatermark("vts", "2 hours")
    joined = p.join(
        v,
        (F.col("user_id") == F.col("vuser"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("vts") < F.col("pts")),
    ).select("pid", "vid")
    q = run_to_memory(joined, "t_ssj", mode="append")
    got = rows_set(spark.sql("select * from t_ssj"), ["pid", "vid"])

    bev = load_table(spark, sf_small, "events")
    bp = bev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("pts"), "user_id"
    )
    bv = bev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), F.col("ts").alias("vts"),
        F.col("user_id").alias("vuser"),
    )
    expect = rows_set(
        bp.join(
            bv,
            (F.col("user_id") == F.col("vuser"))
            & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("vts") < F.col("pts")),
        ).select("pid", "vid"),
        ["pid", "vid"],
    )
    assert got == expect and len(got) > 0
    q.stop()


def test_streaming_ivf_layout_maintenance(spark, sf_small, tmp_path):
    """The IVF layout stays correct under streaming ingest: two micro-batches
    of vectors land in cluster=<c>/batch_id=<n> partitions; the pruned
    search over the maintained layout equals knn_ivf over the full batch
    table, and replaying a batch is a no-op (idempotence)."""
    from custom_python_vectordb_spark.operators.similarity import knn_ivf, knn_ivf_pruned
    from custom_python_vectordb_spark.streaming.vector_index import (
        load_ivf_layout,
        maintain_ivf_layout,
        write_ivf_batch,
    )

    emb = load_table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id").between(200, 207)).select(
        (F.col("vec_id") - 200).cast("int").alias("cluster"), F.col("embedding").alias("cvec")
    ).cache()
    src = str(tmp_path / "vecs")
    half = emb.count() // 2
    emb.filter(F.col("vec_id") < half).coalesce(1).write.parquet(src)
    emb.filter(F.col("vec_id") >= half).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    layout = str(tmp_path / "ivf")
    q = (
        maintain_ivf_layout(stream, cents, layout)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    stored = load_ivf_layout(spark, layout)
    assert stored.count() == emb.count()

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    expect = knn_ivf(emb, queries, cents, k=10, nprobe=2).collect()
    got = knn_ivf_pruned(spark, layout, queries, cents, k=10, nprobe=2).collect()
    assert [(r["qid"], r["vec_id"]) for r in expect] == [(r["qid"], r["vec_id"]) for r in got]

    # at-least-once replay of batch 0 must overwrite, not duplicate
    batch0 = spark.read.parquet(src).filter(F.col("vec_id") < half)
    write_ivf_batch(batch0, 0, cents, layout)
    assert load_ivf_layout(spark, layout).count() == emb.count()


def test_incremental_neardup_equals_batch(spark, sf_small, tmp_path):
    """The incremental near-dup index (signatures + band keys maintained
    per micro-batch, new-vs-history bucket probe, Jaccard verify) must
    converge to EXACTLY the batch path's verified pair set over the union
    of all batches — including pairs that span batches — and a batch
    replay must not duplicate pairs."""
    from custom_python_vectordb_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures_wide,
    )
    from custom_python_vectordb_spark.streaming.neardup_maintenance import (
        load_neardup_pairs,
        maintain_neardup_index,
        process_neardup_batch,
    )

    base = load_table(spark, sf_small, "documents").select("doc_id", "text").limit(30)
    # batch 1: originals; batch 2: near-copies of batch-1 docs (new ids) +
    # fresh docs -> cross-batch pairs exist by construction
    b2 = base.limit(10).select((F.col("doc_id") + 50000).alias("doc_id"), "text").unionByName(
        load_table(spark, sf_small, "documents").select("doc_id", "text")
        .filter(F.col("doc_id").between(30, 39))
    )
    src = str(tmp_path / "docs_stream")
    base.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    idx = str(tmp_path / "ndidx")
    q = (
        maintain_neardup_index(stream, idx)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = {(r["a"], r["b"]) for r in load_neardup_pairs(spark, idx).collect()}

    corpus = spark.read.parquet(src)
    wide = minhash_signatures_wide(corpus)
    cand = lsh_candidate_pairs(wide, wide=True)
    expect = {
        (r["a"], r["b"])
        for r in jaccard_pairs(corpus, restrict_pairs=cand).collect()
    }
    assert expect, "fixture must produce at least one near-dup pair"
    assert any(a < 30000 < b for a, b in expect), "need a cross-batch pair"
    assert got == expect

    # replay batch 0 (at-least-once): same pair set afterwards
    batch0 = spark.read.parquet(src).filter(F.col("doc_id") < 40)
    process_neardup_batch(batch0, 0, idx)
    got2 = {(r["a"], r["b"]) for r in load_neardup_pairs(spark, idx).collect()}
    assert got2 == expect


def test_trending_decayed_stream_matches_batch_formula(spark, sf_small, tmp_path):
    """trending_decayed_stream across two micro-batches converges to the
    batch decay formula: score(u) = sum over u's events of 0.5^(last_day(u)
    - event_day). The second batch holds OLDER events for half the users,
    exercising the re-decay of stored state in both directions."""
    from custom_python_vectordb_spark.streaming.stateful import trending_decayed_stream

    ev = load_table(spark, sf_small, "events").select("user_id", "ts")
    src = str(tmp_path / "ev")
    newer = ev.filter(F.dayofmonth("ts") > 10)
    older = ev.filter(F.dayofmonth("ts") <= 10)
    newer.coalesce(1).write.parquet(src)
    older.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = run_to_memory(trending_decayed_stream(stream), "t_trend", mode="update")
    out = spark.table("t_trend").collect()
    q.stop()

    # final emission per key = the row with the cumulative max n_events
    final = {}
    for r in out:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r

    import pandas as pd

    pdf = ev.toPandas()
    pdf["day"] = (pdf["ts"] - pd.Timestamp(0)) // pd.Timedelta(days=1)
    for uid, grp in pdf.groupby("user_id"):
        d_last = int(grp["day"].max())
        want = sum(0.5 ** (d_last - int(k)) for k in grp["day"])
        got = final[int(uid)]
        assert got["as_of_day"] == d_last
        assert abs(got["score"] - want) < 1e-9, (uid, got["score"], want)
        assert got["n_events"] == len(grp)
    assert set(final) == set(int(u) for u in pdf["user_id"].unique())


def test_span_index_converges_to_batch_and_replays(spark, tmp_path):
    """Incremental substring-span index over two micro-batches converges to
    the batch operator's exact pair set (within-batch AND cross-batch
    planted spans), and an at-least-once replay of batch 0 leaves the pair
    set unchanged."""
    import random

    from custom_python_vectordb_spark.operators.spans import shared_span_pairs
    from custom_python_vectordb_spark.streaming.span_maintenance import (
        load_span_pairs,
        maintain_span_index,
        process_span_batch,
    )

    rng = random.Random(11)
    vocab = [f"v{i}" for i in range(300)]

    def toks(n):
        return [rng.choice(vocab) for _ in range(n)]

    texts = {d: toks(40) for d in range(10)}
    texts[1][5:20] = texts[0][10:25]            # within batch 0
    texts2 = {d: toks(40) for d in range(100, 105)}
    texts2[100][0:15] = texts[2][20:35]         # cross-batch (2, 100)
    texts2[104][10:28] = texts2[103][4:22]      # within batch 1

    b0 = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in texts.items()], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in texts2.items()], "doc_id long, text string"
    )
    src = str(tmp_path / "docs_stream")
    b0.coalesce(1).write.parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    idx = str(tmp_path / "spanidx")
    q = (
        maintain_span_index(stream, idx, n=5, max_df=16, min_span=10)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = {
        (r.doc_a, r.doc_b): (r.max_span_tokens, r.n_spans)
        for r in load_span_pairs(spark, idx).collect()
    }
    union = b0.unionByName(b1)
    expect = {
        (r.doc_a, r.doc_b): (r.max_span_tokens, r.n_spans)
        for r in shared_span_pairs(union, n=5, min_df=2, max_df=16, min_span=10).collect()
    }
    assert expect, "fixture must produce span pairs"
    assert (0, 1) in expect and (2, 100) in expect and (103, 104) in expect
    assert got == expect

    # at-least-once replay of batch 0: same pair set afterwards
    process_span_batch(b0, 0, idx, n=5, max_df=16, min_span=10)
    got2 = {
        (r.doc_a, r.doc_b): (r.max_span_tokens, r.n_spans)
        for r in load_span_pairs(spark, idx).collect()
    }
    assert got2 == expect


def test_funnel_stream_matches_batch_funnel(spark, sf_small, tmp_path):
    """funnel_stream across two event-time-ordered micro-batches converges
    to the batch event_funnel minima (in-order delivery => the first
    qualifying event IS the batch minimum)."""
    from custom_python_vectordb_spark.streaming.stateful import funnel_stream

    ev = load_table(spark, sf_small, "events").select("user_id", "ts", "event_type")
    src = str(tmp_path / "ev_funnel")
    early = ev.filter(F.dayofmonth("ts") <= 15)
    late = ev.filter(F.dayofmonth("ts") > 15)
    early.coalesce(1).write.parquet(src)
    late.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = run_to_memory(funnel_stream(stream), "t_funnel", mode="update")
    out = spark.table("t_funnel").collect()
    q.stop()

    final = {}
    for r in out:  # stage is monotone: keep the highest per user
        if r.user_id not in final or r.stage > final[r.user_id].stage:
            final[r.user_id] = r

    # batch truth: sequential minima per user (the event_funnel stage logic)
    import pandas as pd

    pdf = ev.toPandas().sort_values("ts")
    want_stage = {}
    want_t = {}
    for uid, grp in pdf.groupby("user_id"):
        t1 = t2 = t3 = None
        for ts, et in zip(grp["ts"], grp["event_type"]):
            if et == "view" and t1 is None:
                t1 = ts
            elif et == "click" and t2 is None and t1 is not None and ts > t1:
                t2 = ts
            elif et == "purchase" and t3 is None and t2 is not None and ts > t2:
                t3 = ts
        want_stage[int(uid)] = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        want_t[int(uid)] = (t1, t2, t3)

    touched = {u for u, s in want_stage.items() if s > 0}
    assert {u for u in final if final[u].stage > 0} == touched
    for uid in touched:
        got = final[uid]
        assert got.stage == want_stage[uid], uid
        t1, t2, t3 = want_t[uid]
        assert (got.t1, got.t2, got.t3) == (
            None if t1 is None else t1.to_pydatetime(),
            None if t2 is None else t2.to_pydatetime(),
            None if t3 is None else t3.to_pydatetime(),
        ), uid

    # per-stage counts equal the oracle-checked batch query's
    from custom_python_vectordb_spark.queries.analytics import event_funnel

    batch = {r.stage_idx: r.n_users for r in event_funnel(spark, sf_small).collect()}
    got_counts = {
        1: sum(1 for u in final if final[u].stage >= 1),
        2: sum(1 for u in final if final[u].stage >= 2),
        3: sum(1 for u in final if final[u].stage >= 3),
    }
    assert got_counts == batch


def test_versioned_sink_exactly_once_append(spark, sf_small, tmp_path):
    """Streaming appends into the commit-log store: each micro-batch is one
    time-travelable version carrying its batch id, and an at-least-once
    replay is a no-op (no duplicate rows, no new version)."""
    from custom_python_vectordb_spark.sources.versioned import VersionedWarehouse
    from custom_python_vectordb_spark.streaming.versioned_sink import (
        load_stream_table,
        process_versioned_append,
        versioned_append_sink,
    )

    ev = load_table(spark, sf_small, "events").select("event_id", "event_type", "value")
    src = str(tmp_path / "ev_sink")
    ev.filter(F.col("event_id") < 500).coalesce(1).write.parquet(src)
    ev.filter(F.col("event_id") >= 500).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    root = str(tmp_path / "vroot")
    q = (
        versioned_append_sink(stream, root, "events", stats_cols=["event_id"])
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    wh = VersionedWarehouse(spark, root)
    assert load_stream_table(spark, root, "events").count() == ev.count()
    hist = wh.history("events")
    assert [m["stream_batch_id"] for m in hist] == [0, 1]
    # manifest stats recorded per streamed dir -> pruning works on the sink
    pruned = wh.scan_pruned("events", "event_id", 0, 10)
    assert pruned.count() == 11
    assert len({p.rsplit("/", 2)[-2] for p in pruned.inputFiles()}) == 1

    # at-least-once replay of batch 0: refused, nothing changes
    b0 = spark.read.parquet(src).filter(F.col("event_id") < 500)
    assert process_versioned_append(b0, 0, root, "events") is False
    assert wh.latest_version("events") == 1
    assert load_stream_table(spark, root, "events").count() == ev.count()
    # a genuinely new batch still lands
    extra = spark.createDataFrame([(99999, "view", 1.0)], "event_id long, event_type string, value double")
    assert process_versioned_append(extra, 2, root, "events") is True
    assert load_stream_table(spark, root, "events").count() == ev.count() + 1


def test_versioned_sink_replay_refused_after_maintenance(spark, tmp_path):
    """OPTIMIZE / delete_where / plain appends must not re-open the
    exactly-once replay window: stream_batch_id is carried through
    maintenance commits."""
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.sources.versioned import VersionedWarehouse
    from custom_python_vectordb_spark.streaming.versioned_sink import (
        process_versioned_append,
    )

    root = str(tmp_path / "vroot2")
    b = spark.createDataFrame([(i, float(i)) for i in range(20)], "id long, v double")
    assert process_versioned_append(b, 0, root, "t") is True
    wh = VersionedWarehouse(spark, root)
    wh.delete_where("t", F.col("id") >= 18, key_col="id")
    wh.optimize("t")
    wh.save("t", spark.createDataFrame([(100, 1.0)], "id long, v double"), mode="append")
    # the head is three maintenance commits past the sink write — batch 0
    # must still be refused
    assert process_versioned_append(b, 0, root, "t") is False
    assert wh.load("t").count() == 19
    # and the next stream batch still lands
    b1 = spark.createDataFrame([(200, 2.0)], "id long, v double")
    assert process_versioned_append(b1, 1, root, "t") is True


def test_versioned_merge_sink_cdc_and_replay(spark, tmp_path):
    """CDC upsert ingest: merge batches converge to last-writer-wins per
    key, a replayed batch id is a no-op, and the merge commits carry the
    stream batch id."""
    from custom_python_vectordb_spark.sources.versioned import VersionedWarehouse
    from custom_python_vectordb_spark.streaming.versioned_sink import (
        process_versioned_merge,
    )

    root = str(tmp_path / "cdc")

    def batch(rows):
        return spark.createDataFrame(rows, "id long, text string")

    assert process_versioned_merge(batch([(1, "a0"), (2, "b0")]), 0, root, "t", "id")
    assert process_versioned_merge(batch([(2, "b1"), (3, "c0")]), 1, root, "t", "id")
    wh = VersionedWarehouse(spark, root)
    got = {r["id"]: r["text"] for r in wh.load("t").collect()}
    assert got == {1: "a0", 2: "b1", 3: "c0"}
    # replay of batch 1: skipped, table unchanged, version unchanged
    head = wh.latest_version("t")
    assert process_versioned_merge(batch([(2, "b1"), (3, "c0")]), 1, root, "t", "id") is False
    assert wh.latest_version("t") == head
    assert {r["id"]: r["text"] for r in wh.load("t").collect()} == got
    # next batch proceeds; manifest records its stream batch id
    assert process_versioned_merge(batch([(1, "a2")]), 2, root, "t", "id")
    m = wh._read_manifest("t", wh.latest_version("t"))
    assert m["mode"] == "merge" and m["stream_batch_id"] == 2
    assert {r["id"]: r["text"] for r in wh.load("t").collect()} == {
        1: "a2", 2: "b1", 3: "c0"
    }


def test_rollup_maintenance_converges_replays_and_compacts(spark, tmp_path):
    """The incremental rollup equals the batch groupBy over the union of
    all batches — after normal batches, after a replay, and after
    compaction."""
    from custom_python_vectordb_spark.streaming.rollup_maintenance import (
        compact_rollup,
        process_rollup_batch,
        read_rollup,
    )

    root = str(tmp_path / "mv")

    def batch(rows):
        return spark.createDataFrame(rows, "k string, v double")

    b0 = [("a", 1.0), ("a", 2.0), ("b", 10.0)]
    b1 = [("a", 3.0), ("c", 5.0)]
    b2 = [("b", 1.0), ("c", 1.0), ("c", 2.0)]
    process_rollup_batch(batch(b0), 0, root, "mv", ["k"], "v")
    process_rollup_batch(batch(b1), 1, root, "mv", ["k"], "v")
    process_rollup_batch(batch(b2), 2, root, "mv", ["k"], "v")

    def view():
        return {
            r["k"]: (r["cnt"], r["total"], r["avg"])
            for r in read_rollup(spark, root, "mv", ["k"]).collect()
        }

    want = {"a": (3, 6.0, 2.0), "b": (2, 11.0, 5.5), "c": (3, 8.0, 8.0 / 3)}
    assert view() == want
    # replay of batch 1 overwrites its own partition: no double counting
    process_rollup_batch(batch(b1), 1, root, "mv", ["k"], "v")
    assert view() == want
    # compaction folds partials without changing the view
    compact_rollup(spark, root, "mv", ["k"])
    assert view() == want
    import glob

    assert glob.glob(str(tmp_path / "mv" / "mv" / "batch_id=-1"))


def test_rollup_sketch_columns_merge_replay_compact(spark, tmp_path):
    """Sketch-augmented rollup: HLL distinct + histogram quantile partials
    merge associatively across batches, survive a replay (partition
    overwrite) and compaction unchanged, and certify against the exact
    batch values over the union of all micro-batches."""
    from custom_python_vectordb_spark.streaming.rollup_maintenance import (
        compact_rollup,
        process_rollup_batch,
        read_rollup,
    )

    root = str(tmp_path / "mv")
    kw = dict(distinct_col="u", quantile_col="v", bins=64, lo=0.0, hi=64.0)

    def batch(rows):
        return spark.createDataFrame(rows, "k string, u bigint, v double")

    # values 0..47 under key a (users 0..23), 0..15 under b (users 0..7)
    rows = [("a", i % 24, float(i)) for i in range(48)] + [
        ("b", i % 8, float(i)) for i in range(16)
    ]
    b0, b1, b2 = rows[:20], rows[20:45], rows[45:]
    for i, b in enumerate((b0, b1, b2)):
        process_rollup_batch(batch(b), i, root, "mv", ["k"], "v", **kw)

    def view():
        out = {}
        for r in read_rollup(
            spark, root, "mv", ["k"], quantiles=(0.5,), bins=64, lo=0.0, hi=64.0
        ).collect():
            out[r["k"]] = (r["cnt"], r["total"], r["approx_distinct"], r["p50"])
        return out

    got = view()
    # exact over the union: a: 48 rows sum 0..47=1128, 24 users, median 23.5
    # b: 16 rows sum 0..15=120, 8 users, median 7.5
    assert got["a"][0] == 48 and got["a"][1] == 1128.0
    assert got["b"][0] == 16 and got["b"][1] == 120.0
    # HLL at this cardinality is exact
    assert got["a"][2] == 24 and got["b"][2] == 8
    # histogram median within one bin width (1.0 at 64 bins over [0, 64))
    assert abs(got["a"][3] - 23.5) <= 1.0
    assert abs(got["b"][3] - 7.5) <= 1.0

    process_rollup_batch(batch(b1), 1, root, "mv", ["k"], "v", **kw)  # replay
    assert view() == got
    compact_rollup(spark, root, "mv", ["k"], bins=64)
    assert view() == got


def test_merge_hist_expr_mismatched_bins_raises(spark):
    """Regression (round-7 ADVICE): the bin-count-mismatch assert used to
    be optimized away because when(ok, merged).otherwise(merged) has
    identical branches — Catalyst collapsed the conditional and dropped
    the assert_true, so mismatched partials silently NULL-padded. Merging
    histogram partials of different lengths must RAISE, not corrupt."""
    import pytest

    from custom_python_vectordb_spark.streaming.rollup_maintenance import (
        merge_hist_expr,
    )

    good = spark.createDataFrame(
        [(1, [1, 2, 3]), (1, [1, 1, 1])], "k int, hist array<long>"
    )
    [row] = good.groupBy("k").agg(merge_hist_expr("hist").alias("h")).collect()
    assert row["h"] == [2, 3, 4]

    bad = spark.createDataFrame(
        [(1, [1, 2, 3]), (1, [4, 5])], "k int, hist array<long>"
    )
    with pytest.raises(Exception, match="bin-count mismatch"):
        bad.groupBy("k").agg(merge_hist_expr("hist").alias("h")).collect()


def test_maintain_rollup_end_to_end_stream(spark, tmp_path):
    """maintain_rollup driven by a real file-source stream: two input
    files arrive as micro-batches through writeStream/foreachBatch, the
    maintained view (with sketch columns) equals the batch aggregate over
    the union, and a restart from the same checkpoint does not
    double-count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from custom_python_vectordb_spark.streaming.rollup_maintenance import (
        maintain_rollup,
        read_rollup,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    root = str(tmp_path / "mv")
    ck = str(tmp_path / "ck")
    pq.write_table(
        pa.table({"k": ["a", "a", "b"], "u": [1, 2, 1], "v": [1.0, 3.0, 10.0]}),
        indir / "f0.parquet",
    )

    def run_stream():
        stream = spark.readStream.schema("k string, u bigint, v double").parquet(
            str(indir)
        )
        q = (
            maintain_rollup(
                stream, root, "mv", ["k"], "v",
                distinct_col="u", quantile_col="v", bins=32, lo=0.0, hi=32.0,
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    pq.write_table(
        pa.table({"k": ["a", "b"], "u": [2, 2], "v": [5.0, 20.0]}),
        indir / "f1.parquet",
    )
    run_stream()
    run_stream()  # no new data: restart must not re-add processed batches

    got = {
        r["k"]: (r["cnt"], r["total"], r["approx_distinct"], r["p50"])
        for r in read_rollup(
            spark, root, "mv", ["k"], quantiles=(0.5,), bins=32, lo=0.0, hi=32.0
        ).collect()
    }
    # a: rows (1,3,5) sum 9, users {1,2}; b: rows (10,20) sum 30, users {1,2}
    assert got["a"][0] == 3 and got["a"][1] == 9.0 and got["a"][2] == 2
    assert got["b"][0] == 2 and got["b"][1] == 30.0 and got["b"][2] == 2
    assert abs(got["a"][3] - 3.0) <= 1.0  # median of {1,3,5} within one bin


def test_incremental_semdedup_equals_batch(spark, sf_small, tmp_path):
    """The incremental semantic-dedup index (cell-assigned vectors
    maintained per micro-batch, new-vs-history within-cell cosine probe)
    must converge to the batch semdedup rule's keep set over the union
    of all batches — including cross-batch near-duplicates and the case
    where the NEWCOMER has the smaller id (historical partner becomes
    the loser) — and a batch replay must not change the result."""
    from custom_python_vectordb_spark.streaming.semdedup_maintenance import (
        load_semdedup_keep,
        maintain_semdedup_index,
        process_semdedup_batch,
    )

    emb = load_table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    cents = (
        emb.filter(F.col("vec_id").between(200, 207))
        .select((F.col("vec_id") - 200).cast("int").alias("cluster"),
                F.col("embedding").alias("cvec"))
    )
    # batch 1: vectors 100..149 plus a HIGH-id clone of vec 5 (so batch 2's
    # original vec 5 arrives later with the SMALLER id -> the clone, already
    # in history, must become the loser); batch 2: vectors 0..49 plus
    # clones of 110/120 at +100000 (ordinary newcomer-loses pairs)
    b1 = emb.filter(F.col("vec_id").between(100, 149)).unionByName(
        emb.filter(F.col("vec_id") == 5)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    b2 = emb.filter(F.col("vec_id") < 50).unionByName(
        emb.filter(F.col("vec_id").isin(110, 120))
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    src = str(tmp_path / "vec_stream")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    idx = str(tmp_path / "sdidx")
    q = (
        maintain_semdedup_index(stream, idx, cents)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = {(r["vec_id"], r["cluster"]) for r in load_semdedup_keep(spark, idx).collect()}

    # batch twin over the union: same assignment, same within-corpus rule
    from custom_python_vectordb_spark.functions.distances import cosine_similarity
    from custom_python_vectordb_spark.operators.similarity import with_ivf_cluster

    corpus = spark.read.parquet(src)
    assigned = with_ivf_cluster(corpus, cents)
    a = assigned.select("cluster", F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = assigned.select("cluster", F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    losers = (
        a.join(b, "cluster")
        .filter((F.col("a") < F.col("b")) & (cosine_similarity("va", "vb") >= 0.95))
        .select(F.col("b").alias("vec_id")).distinct()
    )
    expect = {
        (r["vec_id"], r["cluster"])
        for r in assigned.join(losers, "vec_id", "left_anti")
        .select("vec_id", "cluster").collect()
    }
    dropped = {v for v, _ in set((r["vec_id"], r["cluster"]) for r in assigned.select("vec_id", "cluster").collect()) - expect}
    assert 100005 in dropped, "history clone must lose to the later-arriving smaller id"
    assert {100110, 100120} <= dropped
    assert got == expect

    # replay batch 0 (at-least-once): keep set unchanged
    process_semdedup_batch(spark.read.parquet(src).filter(
        (F.col("vec_id").between(100, 149)) | (F.col("vec_id") == 100005)
    ), 0, idx, cents)
    got2 = {(r["vec_id"], r["cluster"]) for r in load_semdedup_keep(spark, idx).collect()}
    assert got2 == expect

    # balanced-sample view OFF the same maintained index (dedup -> balance,
    # one ingest pipeline feeding both): per cell <= cap of the KEPT
    # members by (hash48, id) — must equal the batch rule over the kept set
    from custom_python_vectordb_spark.functions.hashing import hash48
    from custom_python_vectordb_spark.streaming.semdedup_maintenance import (
        load_balanced_sample,
    )

    cap = 8
    bal = {
        (r["vec_id"], r["cluster"])
        for r in load_balanced_sample(spark, idx, cap=cap).collect()
    }
    kept_rows = [
        (r["vec_id"], r["cluster"], r["h"])
        for r in load_semdedup_keep(spark, idx)
        .withColumn("h", hash48(F.col("vec_id").cast("string")))
        .collect()
    ]
    by_cell: dict[int, list] = {}
    for vid, cl, h in kept_rows:
        by_cell.setdefault(cl, []).append((h, vid))
    expect_bal = {
        (vid, cl)
        for cl, members in by_cell.items()
        for _h, vid in sorted(members)[:cap]
    }
    assert bal == expect_bal
    from collections import Counter

    per = Counter(cl for _v, cl in bal)
    assert max(per.values()) <= cap and sum(per.values()) < len(kept_rows)


def test_incremental_vocab_feeds_bpe_training(spark, sf_small, tmp_path):
    """Word counts maintained per micro-batch must merge to exactly the
    batch word_counts over the union, and BPE merges trained from the
    maintained view must equal training from scratch — so the tokenizer
    retrains after new data lands without re-reading the corpus. A batch
    replay must not change the counts."""
    from custom_python_vectordb_spark.operators.bpe import train_bpe, word_counts
    from custom_python_vectordb_spark.streaming.vocab_maintenance import (
        load_word_counts,
        maintain_vocab,
        process_vocab_batch,
    )

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)
    src = str(tmp_path / "docs_stream")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    root = str(tmp_path / "vocab_idx")
    q = (
        maintain_vocab(stream, root)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = {(r["word"], r["freq"]) for r in load_word_counts(spark, root).collect()}
    expect = {(r["word"], r["freq"]) for r in word_counts(docs).collect()}
    assert got == expect

    streamed_merges = train_bpe(
        load_word_counts(spark, root, top_words=500), num_merges=12
    )
    scratch_merges = train_bpe(word_counts(docs, top_words=500), num_merges=12)
    assert streamed_merges == scratch_merges

    # replay batch 0 (at-least-once): counts unchanged
    process_vocab_batch(b1, 0, root)
    got2 = {(r["word"], r["freq"]) for r in load_word_counts(spark, root).collect()}
    assert got2 == expect


def test_wire_broker_source_to_sink(spark):
    """r12 (VERDICT r11 task 2): the Kafka wire path driven source-to-sink
    with an embedded TCP broker — no broker binary. Insert/delete change
    events published in the wire schema reach a subscription-filtered
    memory sink through the SAME `parse_kafka_events` projection a real
    Kafka reader uses; events published BEFORE the query starts arrive via
    the broker's earliest-offset replay (the reference bus's late-joiner
    replay, realtime.py:132-137); replay_tail orders the materialized
    history."""
    import time

    from custom_python_vectordb_spark.streaming.events import (
        replay_tail,
        subscription_filter,
    )
    from custom_python_vectordb_spark.streaming.wire_broker import (
        EmbeddedWireBroker,
        read_event_stream_wire,
    )

    broker = EmbeddedWireBroker()
    base = 1_700_000_000_000_000  # epoch micros
    # published BEFORE the stream exists — must arrive via replay
    broker.publish_change(1, base + 1_000_000, 7, "insert", 1.0, {"src": "crawler"})
    broker.publish_change(2, base + 2_000_000, 8, "delete", 0.0, {"src": "crawler"})
    broker.publish_change(3, base + 3_000_000, 7, "insert", 2.0, {"src": "manual"})

    stream = read_event_stream_wire(spark, "127.0.0.1", broker.port)
    sub = stream.filter(
        subscription_filter(
            event_types=["insert", "delete"], metadata={"src": "crawler"}
        )
    )
    q = (
        sub.writeStream.format("memory")
        .queryName("wire_sub")
        .outputMode("append")
        .start()
    )

    def wait_rows(n, timeout=90.0):
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            if spark.sql("select * from wire_sub").count() >= n:
                return
            time.sleep(0.25)
        raise AssertionError(
            f"sink never reached {n} rows; have "
            f"{spark.sql('select * from wire_sub').count()}"
        )

    try:
        wait_rows(2)  # replayed 1, 2 (3 fails the metadata constraint)
        # live publishes after the subscriber connected
        broker.publish_change(4, base + 4_000_000, 9, "insert", 3.0, {"src": "crawler"})
        broker.publish_change(5, base + 5_000_000, 9, "update", 3.0, {"src": "crawler"})
        wait_rows(3)  # 4 matches; 5 fails the event-type constraint
        time.sleep(1.0)  # let any (wrongly) matching row 3/5 land
        got = {
            (r["event_id"], r["event_type"], r["user_id"])
            for r in spark.sql("select * from wire_sub").collect()
        }
        assert got == {(1, "insert", 7), (2, "delete", 8), (4, "insert", 9)}
        # wire parse produced real event-time timestamps, not strings
        ts = {
            r["event_id"]: r["ts"]
            for r in spark.sql("select event_id, ts from wire_sub").collect()
        }
        assert ts[4].second - ts[1].second == 3
        # R4 replay tail over the materialized history: newest first
        tail = replay_tail(spark.table("wire_sub"), 2).collect()
        assert [r["event_id"] for r in tail] == [4, 2]
    finally:
        q.stop()
        broker.close()
