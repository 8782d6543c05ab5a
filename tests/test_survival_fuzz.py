"""Spec-level fuzz for q217 (Kaplan-Meier churn) and q218
(position-based attribution), m56.

Independent Python mirrors re-derive both from the spec — q217:
Monday-truncated activity weeks, per-user last week, the FULL week
grid (weeks where nobody churned still get a row), censoring of the
final observed week, hazard = churned/at-risk, survival = the KM
product via exp(Σ ln(1−h)) accumulated in week order; q218: the
trailing-7-day touch window with the (tts < cts OR tid < cid)
boundary tie rule, first/last by (tts, tid), and the 40/40/20
micro-credit split with the exact integer interior division.  Both
the Spark plan and the DuckDB oracle share one derivation, so the
differential cannot catch a shared mistake in the censoring rule, the
grid densification, or the credit CASE ladder; these mirrors can.

Float discipline: event values are exact multiples of 0.25 (cents are
exact in binary on every engine); survival/hazard are compared at a
6-decimal half-ulp since the queries round to 6.
"""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_BASE = datetime.datetime(2024, 1, 1)  # a Monday
_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in micros


def _events_df(spark, rows):
    """rows: (event_id, user_id, hours_offset, event_type, value)."""
    return spark.createDataFrame(
        [
            (eid, uid, _US + h * 3_600_000_000, et, v)
            for eid, uid, h, et, v in rows
        ],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )


# ---------------------------------------------------------------- q217

def _week(hours: int) -> int:
    d = (_BASE + datetime.timedelta(hours=hours)).date()
    monday = d - datetime.timedelta(days=d.weekday())
    return (monday - _BASE.date()).days // 7 + 1


def _mirror_km(rows):
    lastw: dict[int, int] = {}
    for _eid, uid, h, _et, _v in rows:
        w = _week(h)
        lastw[uid] = max(lastw.get(uid, 0), w)
    mw = max(lastw.values())
    out = {}
    acc = 0.0
    for w in range(1, mw + 1):
        n_risk = sum(1 for lw in lastw.values() if lw >= w)
        n_churned = sum(1 for lw in lastw.values() if lw == w and w < mw)
        h = n_churned / n_risk
        acc += math.log(1.0 - h)
        out[w] = (n_risk, n_churned, h, math.exp(acc))
    return out


_km_rows = st.lists(
    st.tuples(
        st.integers(0, 10_000),   # event_id (unused by q217)
        st.integers(0, 6),        # user_id: few users -> censoring edge
        st.integers(0, 24 * 7 * 6 - 1),  # hours across 6 weeks
        st.just("click"),
        st.just(1.0),
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(_km_rows)
def test_q217_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m56_survival as m

    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        r["w"]: (r["n_risk"], r["n_churned"], r["hazard"], r["survival"])
        for r in m.q217_km_churn(spark, "unused").collect()
    }
    want = _mirror_km(rows)
    assert set(got) == set(want)
    for w, (n_risk, n_churned, hz, sv) in want.items():
        g = got[w]
        assert (g[0], g[1]) == (n_risk, n_churned), (w, g)
        assert abs(g[2] - hz) < 5.001e-7, (w, g[2], hz)
        assert abs(g[3] - sv) < 5.001e-7, (w, g[3], sv)


# ---------------------------------------------------------------- q218

def _mirror_attr(rows):
    convs = [
        (uid, h, eid, round(v * 100))
        for eid, uid, h, et, v in rows
        if et == "purchase"
    ]
    touches = [
        (uid, h, eid, et)
        for eid, uid, h, et, _v in rows
        if et != "purchase"
    ]
    credit = defaultdict(lambda: [0, 0])  # channel -> [n_touches, micro]
    for uid, cts, cid, cents in convs:
        win = sorted(
            (tts, tid, ch)
            for tuid, tts, tid, ch in touches
            if tuid == uid
            and tts <= cts
            and tts >= cts - 168
            and (tts < cts or tid < cid)
        )
        nt = len(win)
        for i, (_tts, _tid, ch) in enumerate(win):
            if nt == 1:
                micro = 1_000_000 * cents
            elif nt == 2:
                micro = 500_000 * cents
            elif i == 0 or i == nt - 1:
                micro = 400_000 * cents
            else:
                micro = (200_000 // (nt - 2)) * cents
            credit[ch][0] += 1
            credit[ch][1] += micro
    return sorted((ch, n, mc) for ch, (n, mc) in credit.items())


@st.composite
def _attr_rows(draw):
    n = draw(st.integers(2, 35))
    rows = []
    for eid in range(n):
        uid = draw(st.integers(0, 2))
        # hour offsets cluster in a 10-day span so the 7-day boundary
        # (exactly 168h) and same-timestamp tid ties both occur
        h = draw(st.integers(0, 240))
        et = draw(st.sampled_from(["purchase", "click", "view", "signup"]))
        v = draw(st.integers(0, 400)) * 0.25  # exact binary cents
        rows.append((eid, uid, h, et, v))
    return rows


@SLOW
@given(_attr_rows())
def test_q218_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m56_survival as m

    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["channel"], r["n_touches"], r["credit_micro_cents"])
        for r in m.q218_position_attribution(spark, "unused").collect()
    )
    assert got == _mirror_attr(rows)
