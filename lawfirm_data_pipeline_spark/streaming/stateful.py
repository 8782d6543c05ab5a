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


# --- Spark 4 transformWithStateInPandas variant -------------------------

TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_cents", T.LongType(), False),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)

_TOTALS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_cents", T.LongType(), False),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)


def has_tws_deps() -> bool:
    """transformWithStateInPandas talks to the JVM state server via a
    protobuf protocol — it hard-requires the ``google.protobuf`` Python
    package (pyspark imports ``StateMessage_pb2`` inside the state
    handle).  This container does not ship protobuf, so the TWS path is
    environment-gated: probe here, and fall back to
    ``running_user_totals`` (applyInPandasWithState), which carries the
    exact same state semantics on the classic API.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``applyInPandasWithState`` with
    EXACT integer-cents accumulation — the oracle-gateable variant of
    ``running_user_stats`` (whose float total drifts with batch
    partition order).

    State per user: (n_events, total_cents, last_ts_us).  Cents round
    half-away-from-zero per event (matching SQL ROUND), so the running
    sum is order-independent and the drained output's max-per-key
    equals batch SQL exactly.  Same scale posture as
    ``running_user_stats``: state store partitioned by key, one shuffle
    per micro-batch, O(active keys) state.
    """
    import numpy as np

    def upd(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, cents, last_us = state.get if state.exists else (0, 0, None)
        for pdf in batches:
            n += len(pdf)
            v = pdf["value"].fillna(0.0).to_numpy(dtype="float64") * 100.0
            cents += int((np.sign(v) * np.floor(np.abs(v) + 0.5)).sum())
            ts_us = (
                pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64") // 1000
            ).max()
            last_us = int(ts_us) if last_us is None else max(last_us, int(ts_us))
        state.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "last_ts_us": [last_us],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            upd,
            outputStructType=TOTALS_SCHEMA,
            stateStructType=_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state API (StatefulProcessor + typed ValueState
    on the RocksDB state store), the successor of
    ``applyInPandasWithState`` used by ``running_user_stats``.

    ENVIRONMENT-GATED: requires ``google.protobuf`` (see
    ``has_tws_deps``); raises ``NotImplementedError`` with the fallback
    pointer when absent.  Semantics are identical to
    ``running_user_totals`` — the pytest twin asserts both paths agree
    when the dependency is present.

    State is ONE fixed-width tuple per user: event count, value total in
    integer cents (exact, order-independent — float accumulation would
    drift with batch partition order), and max event-time micros.  Emits
    the updated totals for each key seen in a batch (update mode), so
    ``max(n_events)`` per key over the drained output equals the final
    state — which is what the oracle gate aggregates against batch SQL.

    Scale: state store partitioned by user_id; per-batch shuffle carries
    only that batch's keys; state size O(|active users|) with fixed-size
    rows.  Requires the RocksDB state store provider (caller/test sets
    ``spark.sql.streaming.stateStore.providerClass``).
    """
    import numpy as np

    if not has_tws_deps():
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(pyspark's state-server protocol); not present in this "
            "environment — use running_user_totals (applyInPandasWithState) "
            "for identical semantics"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _TOTALS_STATE)

        def handleInputRows(self, key, rows, timerValues):
            got = self._state.get()
            n, cents, last_us = got if got is not None else (0, 0, None)
            for pdf in rows:
                n += len(pdf)
                v = pdf["value"].fillna(0.0).to_numpy(dtype="float64") * 100.0
                # round half away from zero, matching SQL ROUND
                cents += int((np.sign(v) * np.floor(np.abs(v) + 0.5)).sum())
                ts_us = (
                    pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
                    // 1000
                ).max()
                last_us = int(ts_us) if last_us is None else max(last_us, int(ts_us))
            self._state.update((n, cents, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                    "last_ts_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TotalsProcessor(),
            outputStructType=TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
