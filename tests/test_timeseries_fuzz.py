"""Hypothesis fuzz for the time-series operators vs sequential mirrors.

* ``state_intervals``: gaps-and-islands run-length encoding vs a plain
  sequential scan over (ts, tiebreak)-ordered events — duplicate
  timestamps, single-event runs, alternating states;
* ``resample_ffill``: per-hour grid + forward fill vs a Python mirror —
  multi-hour gaps, leading buckets, all-in-one-bucket.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.operators.timeseries import (
    resample_ffill,
    state_intervals,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_EPOCH = dt.datetime(2030, 1, 1)


@SLOW
@given(
    events=st.lists(
        st.tuples(st.integers(0, 20), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=15,
    )
)
def test_state_intervals_equals_sequential_rle(spark, events):
    rows = [
        (1, eid, st_, _EPOCH + dt.timedelta(seconds=sec))
        for eid, (sec, st_) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = sorted(
        (r["island"], r["state"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in state_intervals(df).collect()
    )
    ordered = sorted(rows, key=lambda r: (r[3], r[1]))  # (ts, tiebreak)
    runs = []
    for _, _eid, st_, ts in ordered:
        if runs and runs[-1][0] == st_:
            runs[-1][2] = ts
            runs[-1][3] += 1
        else:
            runs.append([st_, ts, ts, 1])
    want = sorted(
        (i + 1, s, lo, hi, n) for i, (s, lo, hi, n) in enumerate(runs)
    )
    assert got == want


@SLOW
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(-50, 50)),
        min_size=1,
        max_size=12,
    )
)
def test_resample_ffill_equals_sequential_mirror(spark, obs):
    # observations at minute offsets spread over hours; value in cents
    rows = [
        (1, _EPOCH + dt.timedelta(minutes=10 * m), float(v))
        for m, v in obs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["bucket"]: (r["n"], r["sum_micros"], r["filled_micros"], r["is_gap"])
        for r in resample_ffill(df).collect()
    }
    by_hour: dict[dt.datetime, list[int]] = {}
    for _, ts, v in rows:
        h = ts.replace(minute=0, second=0, microsecond=0)
        by_hour.setdefault(h, []).append(round(v * 1_000_000))
    lo, hi = min(by_hour), max(by_hour)
    want = {}
    cur, last = lo, None
    while cur <= hi:
        if cur in by_hour:
            s = sum(by_hour[cur])
            last = s
            want[cur] = (len(by_hour[cur]), s, last, False)
        else:
            want[cur] = (0, None, last, True)
        cur += dt.timedelta(hours=1)
    assert got == want
