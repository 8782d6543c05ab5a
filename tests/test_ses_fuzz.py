"""Spec-level fuzz for q190 (single-exponential-smoothing backtest,
m44).

Both engines compute the forecast as the UNROLLED geometric-weight
sum (so one projection, nothing iterates); the actual spec is the
recurrence s_1 = y_1, s_i = α·y_i + (1−α)·s_{i−1}, forecast for day
t = s_{t−1}.  This mirror runs the recurrence directly — an unrolling
mistake (boundary-mass term, off-by-one in the weights, wrong MAE
window) would agree between Spark and DuckDB and disagree here.
Gap days matter: the daily rollup only contains OBSERVED days, so the
series index is observation order, not calendar order — the fuzz
drives gapped day sets.  Outputs round(4); compared at a half-ulp
plus the recurrence-vs-unrolled float slack.
"""

from __future__ import annotations

import datetime
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_ALPHA = 0.3
_US = 1_704_067_200_000_000  # 2024-01-01 UTC


def _mirror(rows):
    """rows: (etype, day_offset).  {etype: (n_days, last_fc, last_y, mae)}"""
    daily = defaultdict(lambda: defaultdict(int))
    for et, off in rows:
        daily[et][off] += 1
    out = {}
    for et, d in daily.items():
        y = [float(d[k]) for k in sorted(d)]
        t = len(y)
        if t < 2:
            continue
        s = [y[0]]
        for i in range(1, t):
            s.append(_ALPHA * y[i] + (1 - _ALPHA) * s[-1])
        fc = s[:-1]  # fc[i] forecasts y[i+1] (day index i+2, 1-based)
        mae = (
            sum(abs(y[i] - fc[i - 1]) for i in range(7, t)) / (t - 7)
            if t >= 8
            else None
        )
        out[et] = (t, fc[-1], y[-1], mae)
    return out


_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 14)),
    min_size=1,
    max_size=60,
)


@SLOW
@given(_rows)
def test_q190_matches_recurrence_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m44_seasonal_privacy as m

    df = spark.createDataFrame(
        [
            (i, 0, _US + off * 86_400_000_000 + i, et, 1.0)
            for i, (et, off) in enumerate(rows)
        ],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        r["etype"]: (r["n_days"], r["last_forecast"], r["last_actual"], r["mae"])
        for r in m.q190_ses_backtest(spark, "unused").collect()
    }
    want = _mirror(rows)
    assert set(got) == set(want)
    for et, (t, fc, y, mae) in want.items():
        g = got[et]
        assert g[0] == t
        assert abs(g[1] - fc) < 6e-5, (et, g[1], fc)
        assert abs(g[2] - y) < 6e-5
        assert (g[3] is None) == (mae is None)
        if mae is not None:
            assert abs(g[3] - mae) < 6e-5, (et, g[3], mae)
