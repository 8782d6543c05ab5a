"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in window aggregates (windows.py) cover time-bucketed state;
this module covers *arbitrary* per-key running state — the charter's
"custom stateful operator" slot (e.g. per-user running counters with
inactivity timeout, the streaming analogue of the reference's per-queue
progress tracking).

Scale posture: state lives in the state store partitioned by key — one
shuffle per micro-batch on the grouping key, state size O(active keys),
bounded by the processing-time timeout that evicts idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)


def _update_user_stats(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value), max(ts)) per user across batches.

    Emits the updated running totals each time the key appears; evicts
    idle keys on processing-time timeout (set by the caller's timeout
    conf) by just dropping state — the emitted rows already carry the
    final totals.
    """
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        # normalize to ns first: Arrow may hand datetime64[us] or [ns]
        ts_us = (pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64") // 1000).max()
        last_us = ts_us if last_us is None else max(last_us, int(ts_us))
    state.update((n, total, last_us))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts_us": [last_us],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with idle-key eviction.

    ``events`` must be a streaming DataFrame with (user_id, ts, value).
    Output mode: update (one row per key per batch it appears in).
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
