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
