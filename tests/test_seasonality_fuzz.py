"""Spec-level fuzz for q189 (day-of-week seasonal strength, m44) and
q163 (rolling 7-day correlation, m34).

Independent mirrors: q189 re-derives the one-way ANOVA decomposition —
exact integer moments off the daily grid, fit = Σ sd²/nd over
day-of-week groups, strength = 1 − SS_resid/SS_total; q163 re-derives
the 7-PRESENT-day (ROWS, not calendar RANGE) co-moment windows with
both zero-variance guards.  Gapped day sets are the point: a
calendar-window reading of either kernel would diverge exactly there,
and both engines share one derivation so the differential cannot see
it.
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

_US = 1_704_067_200_000_000  # 2024-01-01 (Monday)


def _events_df(spark, rows):
    """rows: (event_id, day_offset, event_type)."""
    return spark.createDataFrame(
        [(eid, 0, _US + off * 86_400_000_000 + eid, et, 1.0)
         for eid, off, et in rows],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )


# ---------------------------------------------------------------- q189

def _mirror_dow(rows):
    daily = defaultdict(lambda: defaultdict(int))
    for _eid, off, et in rows:
        daily[et][off] += 1
    out = {}
    for et, d in daily.items():
        ns = list(d.values())
        s, ss, m = sum(ns), sum(n * n for n in ns), len(ns)
        if m < 2 or ss - float(s) * s / m == 0:
            continue  # degenerate strength (0/0) — excluded by strategy
        g = defaultdict(lambda: [0, 0])  # dow -> [nd, sd]
        for off, n in d.items():
            dow = (datetime.date(2024, 1, 1) + datetime.timedelta(days=off)).weekday()
            g[dow][0] += 1
            g[dow][1] += n
        fit = sum(float(sd) * sd / nd for nd, sd in g.values())
        strength = 1 - (ss - fit) / (ss - float(s) * s / m)
        out[et] = (m, s / m, strength)
    return out


def _nondegenerate(rows):
    daily = defaultdict(lambda: defaultdict(int))
    for _eid, off, et in rows:
        daily[et][off] += 1
    for d in daily.values():
        ns = list(d.values())
        if len(ns) < 2 or len(set(ns)) < 2:
            return False
    return True


_dow_rows = st.lists(
    st.tuples(st.integers(0, 9_999), st.integers(0, 16),
              st.sampled_from(["a", "b"])),
    min_size=3,
    max_size=60,
    unique_by=lambda t: t[0],
).filter(_nondegenerate)


@SLOW
@given(_dow_rows)
def test_q189_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m44_seasonal_privacy as m

    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        r["etype"]: (r["n_days"], r["mean_daily"], r["seasonal_strength"])
        for r in m.q189_dow_seasonality(spark, "unused").collect()
    }
    want = _mirror_dow(rows)
    assert set(got) == set(want)
    for et, (m_days, mean, strength) in want.items():
        g = got[et]
        assert g[0] == m_days
        assert abs(g[1] - mean) < 5.001e-5
        assert abs(g[2] - strength) < 1e-6, (et, g[2], strength)


# ---------------------------------------------------------------- q163

def _mirror_corr(rows):
    daily = defaultdict(lambda: [0, 0])
    for _eid, off, et in rows:
        d = daily[off]  # ANY event makes the day exist in the rollup
        if et == "click":
            d[0] += 1
        elif et == "purchase":
            d[1] += 1
    days = sorted(daily)
    out = {}
    for i in range(6, len(days)):
        w = [daily[days[j]] for j in range(i - 6, i + 1)]
        m = 7.0
        sx = float(sum(x for x, _ in w))
        sy = float(sum(y for _, y in w))
        sx2 = float(sum(x * x for x, _ in w))
        sy2 = float(sum(y * y for _, y in w))
        sxy = float(sum(x * y for x, y in w))
        vx, vy = m * sx2 - sx * sx, m * sy2 - sy * sy
        if vx > 0 and vy > 0:
            out[days[i]] = (m * sxy - sx * sy) / math.sqrt(vx * vy)
    return out


_corr_rows = st.lists(
    st.tuples(st.integers(0, 9_999), st.integers(0, 13),
              st.sampled_from(["click", "purchase", "view"])),
    min_size=1,
    max_size=80,
    unique_by=lambda t: t[0],
)


@SLOW
@given(_corr_rows)
def test_q163_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m34_experiments as m

    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        r["day"].date(): r["corr7"]
        for r in m.q163_rolling_correlation(spark, "unused").collect()
    }
    want = {
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=off)): c
        for off, c in _mirror_corr(rows).items()
    }
    assert set(got) == set(want)
    for d, c in want.items():
        assert abs(got[d] - c) < 1e-6, (d, got[d], c)
