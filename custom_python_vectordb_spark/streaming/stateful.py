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
from pyspark.sql import functions as F
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


TREND_STATE_SCHEMA = "score double, last_day long, n_events long"
TREND_OUTPUT_SCHEMA = "user_id long, score double, as_of_day long, n_events long"


def trending_decayed_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming exponentially-decayed activity score — the stateful twin of
    the batch `trending_decayed` query: each event contributes 0.5^(days
    old), so the state store never holds more than one (score, last_day,
    n_events) triple per key no matter how long the stream runs.

    Decay identity that makes this incrementally maintainable: a score
    valid as of day D re-validates to any later day D' by multiplying
    0.5^(D'-D) — so each micro-batch decays the stored score to the
    batch's newest day and adds its own events' (already-decayed)
    contributions. Day indices are absolute (floor of epoch days), unlike
    the batch query's corpus-max-relative buckets — equivalent decay
    semantics, streaming-friendly anchor.

    `n_events` is cumulative and therefore identifies each key's final
    emission (update-mode sinks see one row per touched key per batch).
    """

    def update_trend(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key_tuple
        score, last_day, n_events = state.get if state.exists else (0.0, None, 0)
        days = []
        for pdf in pdfs:
            d = (pdf["ts"] - pd.Timestamp(0)) // pd.Timedelta(days=1)
            days.extend(int(x) for x in d)
        n_events += len(days)
        d_new = max(days) if last_day is None else max(max(days), last_day)
        if last_day is not None:
            score *= 0.5 ** (d_new - last_day)
        score += sum(0.5 ** (d_new - k) for k in days)
        state.update((score, d_new, n_events))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "score": [score],
                "as_of_day": [d_new],
                "n_events": [n_events],
            }
        )

    return (
        events.select(F.col(key).alias("user_id"), "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_trend,
            outputStructType=TREND_OUTPUT_SCHEMA,
            stateStructType=TREND_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_STATE_SCHEMA = "t1 timestamp, t2 timestamp, t3 timestamp"
FUNNEL_OUTPUT_SCHEMA = "user_id long, stage int, t1 timestamp, t2 timestamp, t3 timestamp"


def funnel_stream(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming conversion funnel — the stateful twin of the batch
    `event_funnel` query: per user, the entry times of the ordered stages
    (t1 = first stage-1 event; t_k = first stage-k event strictly after
    t_{k-1}). State is three timestamps per user regardless of stream
    length.

    Exactness contract, stated plainly: with per-user EVENT-TIME-ORDERED
    delivery (each micro-batch's rows sorted here; batches arriving in
    time order) the single-pass state machine equals the batch query
    exactly — under in-order delivery the first qualifying event IS the
    minimum the batch computes (asserted against `event_funnel`'s logic in
    tests). An out-of-order earlier stage-1 event can lower t1
    retroactively in batch semantics but not here; that divergence is the
    price of O(1) state, the same trade Kafka-Streams-style one-pass
    funnels make.

    Update-mode emission: one row per touched user per batch with the
    highest stage reached; the final emission per user is the answer
    (`stage` is monotone)."""
    s1, s2, s3 = stages

    def update_funnel(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key_tuple
        t1, t2, t3 = state.get if state.exists else (None, None, None)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            if etype == s1 and t1 is None:
                t1 = ts
            elif etype == s2 and t2 is None and t1 is not None and ts > t1:
                t2 = ts
            elif etype == s3 and t3 is None and t2 is not None and ts > t2:
                t3 = ts
        state.update((t1, t2, t3))
        stage = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        yield pd.DataFrame(
            {"user_id": [user_id], "stage": [stage], "t1": [t1], "t2": [t2], "t3": [t3]}
        )

    return (
        events.select("user_id", "ts", "event_type")
        .filter(F.col("event_type").isin(*stages))
        .groupBy("user_id")
        .applyInPandasWithState(
            update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
