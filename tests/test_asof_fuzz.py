"""Hypothesis fuzz for the as-of join family vs brute-force mirrors.

As-of joins concentrate their bugs at exactly the shapes random
generation finds: equal timestamps on both sides, matches exactly AT
the tolerance boundary, multiple right rows sharing one timestamp,
keys present on one side only.  Mirrors are brute force over all
(left, right) combinations — O(n^2) is the point: no bucketing logic
shared with the implementation under test.

* ``asof_join``: most recent right row with ts <= left.ts (inclusive),
  optional staleness tolerance, max-tie_break on duplicate (key, ts);
* ``asof_nearest``: closest right row within ±tolerance, ties broken
  by (gap, right ts, tie_break) — earlier right row wins equidistant
  pairs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.operators.temporal import asof_join, asof_nearest

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_EPOCH = dt.datetime(2030, 1, 1)


def _ts(sec: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=sec)


_SECS = st.integers(0, 40)
_KEYS = st.sampled_from([1, 2])


@SLOW
@given(
    lefts=st.lists(st.tuples(_KEYS, _SECS), min_size=1, max_size=8),
    rights=st.lists(st.tuples(_KEYS, _SECS), min_size=1, max_size=8),
    tol_s=st.sampled_from([None, 0, 5, 10]),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights, tol_s):
    ldf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(lefts)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(rights)],
        "rid long, k long, ts timestamp",
    )
    got = {
        r["lid"]: (r["asof_ts"], r["rid"])
        for r in asof_join(
            ldf,
            rdf,
            key="k",
            ts="ts",
            right_payload=["rid"],
            tolerance_ms=None if tol_s is None else tol_s * 1000,
            tie_break="rid",
        ).collect()
    }
    for i, (k, s) in enumerate(lefts):
        cands = [
            (rs, ri)
            for ri, (rk, rs) in enumerate(rights)
            if rk == k
            and rs <= s
            and (tol_s is None or s - rs <= tol_s)
        ]
        want = max(cands) if cands else None  # latest ts, then max rid
        have = got[i]
        if want is None:
            assert have == (None, None), (i, have)
        else:
            assert have == (_ts(want[0]), want[1]), (i, have, want)


@SLOW
@given(
    lefts=st.lists(st.tuples(_KEYS, _SECS), min_size=1, max_size=8),
    rights=st.lists(st.tuples(_KEYS, _SECS), min_size=1, max_size=8),
    tol_s=st.sampled_from([0, 3, 7, 40]),
)
def test_asof_nearest_matches_bruteforce(spark, lefts, rights, tol_s):
    ldf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(lefts)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(rights)],
        "rid long, k long, ts timestamp",
    )
    got = {
        r["lid"]: (r["gap_us"], r["rid"])
        for r in asof_nearest(
            ldf,
            rdf,
            key="k",
            left_id="lid",
            ts="ts",
            right_ts="ts",
            tolerance_us=tol_s * 1_000_000,
            right_payload=["rid"],
            tie_break="rid",
        ).collect()
    }
    for i, (k, s) in enumerate(lefts):
        cands = [
            (abs(s - rs) * 1_000_000, rs, ri)
            for ri, (rk, rs) in enumerate(rights)
            if rk == k and abs(s - rs) <= tol_s
        ]
        # rank orders by (gap, right ts, tie_break) ASCENDING — the
        # MIN tuple wins (earlier right row on equidistant pairs)
        want = min(cands) if cands else None
        if want is None:
            assert i not in got, (i, got.get(i))
        else:
            assert got[i] == (want[0], want[2]), (i, got.get(i), want)
