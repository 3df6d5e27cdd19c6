"""Custom stateful streaming operator via applyInPandasWithState.

The reference's realtime layer keeps no per-key state (pure pub/sub);
a training-data ingest pipeline does: running per-user counters, dedup-
within-stream, rate stats. This module implements the canonical example —
a per-user running aggregate that survives across micro-batches — with
GroupState, timeout-free (state bounded by the user-id domain; add
`GroupStateTimeout.ProcessingTimeTimeout` + `state.setTimeoutDuration`
to evict idle keys on an unbounded domain).

The state layout (count, total value, last event time) is an explicit
tuple schema — on a cluster this state lives in the state store
(RocksDB/HDFS-backed), partitioned by user_id, so the operator scales with
keys × state size, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count long, total double, last_ts timestamp"
OUTPUT_SCHEMA = "user_id long, count long, total double, avg_value double"

DEDUP_STATE_SCHEMA = "first_doc_id long, dup_count long"
DEDUP_OUTPUT_SCHEMA = (
    "content_hash string, first_doc_id long, dup_count long, is_first boolean"
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, total, avg) with explicit state.
    `events` must be a streaming DataFrame with (user_id, ts, value).

    The state function is a closure (not module-level) so cloudpickle ships
    it by value — state-store workers need no access to this package."""

    def update_user_totals(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        count, total, last_ts = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((count, total, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "count": [count],
                "total": [total],
                "avg_value": [total / count if count else 0.0],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream_stateful(docs: DataFrame, hash_col: str = "content_hash") -> DataFrame:
    """Streaming content-dedup WITH duplicate accounting — the stateful
    operator the built-ins can't express: ``dropDuplicates`` can suppress
    repeats but cannot report how often each document recurs, and a
    training-data ingest wants both (emit first-seen docs downstream, track
    dup_count for the quality/repetition signal).

    `docs` must be a streaming DataFrame with (`hash_col`, doc_id). Keyed
    by content hash; GroupState holds (first_doc_id, dup_count). Per
    micro-batch each touched key emits one row: `is_first` marks the batch
    where the key was born (route that row's doc downstream), `dup_count`
    is the running number of EXTRA copies seen. Within a batch the lowest
    doc_id wins first-seen, so results are deterministic under input
    reordering.

    Scale: state is one (long, long) per distinct document in the state
    store (RocksDB at production scale), partitioned by hash — bounded by
    corpus cardinality, not stream length. On an unbounded/expiring corpus
    add a ProcessingTimeTimeout eviction; kept timeout-free here because
    the dedup contract is corpus-lifetime.
    """

    def update_dedup(key, pdfs, state: GroupState):
        import pandas as pd

        (content_hash,) = key
        n = 0
        min_doc = None
        for pdf in pdfs:
            n += len(pdf)
            bmin = int(pdf["doc_id"].min())
            min_doc = bmin if min_doc is None else min(min_doc, bmin)
        if state.exists:
            first_doc_id, dup_count = state.get
            is_first = False
            dup_count += n
        else:
            first_doc_id, dup_count, is_first = min_doc, n - 1, True
        state.update((first_doc_id, dup_count))
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                "first_doc_id": [first_doc_id],
                "dup_count": [dup_count],
                "is_first": [is_first],
            }
        )

    return (
        docs.select(hash_col, "doc_id")
        .withColumnRenamed(hash_col, "content_hash")
        .groupBy("content_hash")
        .applyInPandasWithState(
            update_dedup,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
