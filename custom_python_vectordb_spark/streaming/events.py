"""Realtime layer (SURVEY.md §2.10) as Structured Streaming.

The reference's realtime module is a change-event pub/sub (``realtime.py``):
an EventBus queue, Subscription filters, N-subscriber broadcast, bounded
replay. Spark mapping:

- R1 event emission      → the `events` table IS the stream: `readStream`
  over its directory (file source; Kafka at production scale)
- R2 Subscription.matches (``realtime.py:99-118``) → a filter Column usable
  identically in batch and streaming (empty set = match-all, metadata
  equality over JSON props)
- R3 broadcast to N subscribers (``realtime.py:184-215``) → N streaming
  queries over one source, each with its own sink/offset tracking
- R4 bounded replay (``realtime.py:132-137``) → tail-N batch query (the
  history buffer is just the table)
- R5 drop-oldest backpressure (``realtime.py:242-318``) → engine-level:
  source buffering + watermark eviction replace the hand-rolled queue

Beyond parity (the reference has NO windowed operators): tumbling /
sliding / session windows with watermarked late-data handling over
`events.ts` — see queries/streaming.py for the oracle-checked batch
equivalents.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _event_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events directory.

    The file source needs an explicit schema, and `events.ts` has shipped
    as both TIMESTAMP(NANOS) (unreadable by the vectorized reader → read
    nanos as long, downcast) and plain TIMESTAMP(MICROS); sniff the footer
    with pyarrow (driver-side, one small read) instead of hard-coding
    either generation of the file."""
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampNTZType

    arrow_ts = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    if getattr(arrow_ts, "unit", None) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(_event_schema(LongType()))
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")  # single-file table; the file source wants a directory
            .load(sf_dir)
        )
        # integer `div`, not `/1000`: int64 nanos overflow a double mantissa
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(_event_schema(TimestampNTZType()))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # canonical event-time type: watermarks demand TIMESTAMP, and the batch
    # loader normalizes identically (UTC session → same instant)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def read_document_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming read over a documents directory (same columns as the batch
    `documents` table). `max_files_per_trigger` splits a backlog into
    multiple micro-batches — the way to exercise cross-batch state
    (dedup, counters) against a static fixture."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def subscription_filter(
    collections: list[str] | None = None,
    event_types: list[str] | None = None,
    metadata: dict[str, object] | None = None,
    collection_col: str = "event_type",  # test schema has no collection col
    props_col: str = "props",
) -> Column:
    """R2 — ``Subscription.matches`` semantics: every provided constraint
    must hold; an absent/empty constraint matches everything; metadata
    equality over the JSON props (missing key ⇒ no match)."""
    cond = F.lit(True)
    if collections:
        cond = cond & F.col(collection_col).isin(collections)
    if event_types:
        cond = cond & F.col("event_type").isin(event_types)
    if metadata:
        for k, v in metadata.items():
            extracted = F.get_json_object(F.col(props_col), f"$.{k}")
            cond = cond & extracted.isNotNull() & (extracted == F.lit(str(v)))
    return cond


def replay_tail(events: DataFrame, n: int = 10) -> DataFrame:
    """R4 — last-n replay for late joiners (history buffer = the table)."""
    return events.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(n)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str | None = None) -> DataFrame:
    """Tumbling-window counts per event_type; pass `watermark` on streams
    to bound state and drop late rows."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "avg_value",
        )
    )


def sliding_counts(events: DataFrame, size: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
        )
    )


def enrich_stream(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static join: per-event enrichment against a broadcast
    dimension (the static side is re-read per micro-batch, so a slowly
    changing dim stays current without restarting the query)."""
    return events.join(F.broadcast(dim), key, "left")


def dedup_stream(events: DataFrame, id_col: str = "event_id", watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-id within the watermark horizon: the streaming form
    of exact dedup (state = ids seen inside the horizon; without the
    watermark the state would grow unboundedly)."""
    return events.withWatermark("ts", watermark).dropDuplicates([id_col])


def ingest_to_warehouse(events: DataFrame, warehouse, name: str):
    """R1 — continuous ingest: foreachBatch appends each micro-batch to a
    warehouse collection (idempotence at scale comes from batch-id-aware
    sinks or a table format; append suffices for the file-source demo)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        warehouse.save(name, batch_df, mode="append")

    return events.writeStream.foreachBatch(write_batch)


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows per user (gap-based). In batch this is the classic
    gaps-and-islands; F.session_window expresses it in one operator for
    both batch and streaming."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n",
        )
    )


# ---------------------------------------------------------------- Kafka shape

def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka wire records → the canonical event schema.

    `raw` has Kafka's fixed shape (key BINARY, value BINARY, topic,
    partition, offset, timestamp …); the value payload is the JSON event
    the reference's bus would publish (``realtime.py:69-88``). After this
    projection the stream is IDENTICAL to `read_event_stream`'s output, so
    every downstream operator (windows, subscriptions, stateful totals,
    warehouse ingest) is source-agnostic. Unit-testable without a broker —
    the transformation only needs a DataFrame of that shape.
    """
    parsed = raw.select(
        F.from_json(
            F.col("value").cast("string"),
            "event_id long, ts_us long, user_id long, event_type string, "
            "value double, props string",
        ).alias("e")
    )
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.timestamp_micros(F.col("e.ts_us")).alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
    )


def read_event_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source for the event stream (production scale path of R1).

    Requires the spark-sql-kafka connector on the classpath — absent from
    this runtime, so constructing the reader raises a clear error at
    `.load()`; the payload projection (`parse_kafka_events`) is the part
    unit-tested here, and it is shared verbatim with a real deployment.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_events(raw)
