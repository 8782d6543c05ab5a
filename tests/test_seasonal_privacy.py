"""Property tests for the m44 wave: seasonality strength extremes, SES
vs the sequential recurrence, k-anonymity ladder monotonicity, Benford
digit extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _events_daily(spark, counts):
    rows = []
    eid = 0
    base = 1_704_067_200_000_000  # 2024-01-01 UTC in us
    day = 86_400_000_000
    for di, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, 1, base + di * day + eid, "click", 0.0))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string, value double"
    ).select("event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"),
             "event_type", "value")


def test_seasonality_strength_extremes(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m44_seasonal_privacy as m

    # perfect weekly cycle over 4 weeks -> dow means explain everything
    weekly = [2, 9, 9, 9, 9, 9, 4] * 4
    df = _events_daily(spark, weekly)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    r = m.q189_dow_seasonality(spark, "unused").collect()[0]
    assert r["seasonal_strength"] == 1.0
    # flat series: zero total variance is filtered by construction? no —
    # denominator 0 -> null strength; use a tiny non-dow wiggle instead
    wiggle = [5, 5, 5, 5, 5, 5, 5] * 2 + [6] + [5] * 6
    df2 = _events_daily(spark, wiggle)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df2)
    r2 = m.q189_dow_seasonality(spark, "unused").collect()[0]
    assert r2["seasonal_strength"] < 0.5


def test_ses_matches_sequential_recurrence(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m44_seasonal_privacy as m

    counts = [5, 8, 6, 9, 12, 4, 7, 10, 11, 6, 8, 9]
    df = _events_daily(spark, counts)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    r = m.q190_ses_backtest(spark, "unused").collect()[0]
    a, y = 0.3, [float(c) for c in counts]
    f = y[0]
    fcs = []  # fcs[t-2] = forecast for day t
    for t in range(2, len(y) + 1):
        f = a * y[t - 2] + (1 - a) * f if t > 2 else y[0]
        # recurrence with f_2 = y_1: first forecast uses only day 1
        fcs.append(f)
    mae = sum(abs(y[t - 1] - fcs[t - 2]) for t in range(8, len(y) + 1)) / (
        len(y) - 7
    )
    assert r["n_days"] == len(y)
    assert abs(r["last_forecast"] - round(fcs[-1], 4)) < 1e-3
    assert abs(r["mae"] - round(mae, 4)) < 1e-3


def test_k_anonymity_ladder_monotone(spark):
    import lawfirm_data_pipeline_spark.oracle.m44_seasonal_privacy as m

    out = {r["level"]: r for r in m.q191_k_anonymity(spark, SF).collect()}
    assert set(out) == {0, 1, 2}
    # coarsening can only merge groups: risk never increases up the ladder
    assert out[0]["rows_at_risk"] >= out[1]["rows_at_risk"] >= out[2]["rows_at_risk"]
    assert out[0]["n_groups"] >= out[1]["n_groups"] >= out[2]["n_groups"]
    total = spark.read.parquet(f"{SF}/customer.parquet").count()
    for r in out.values():
        assert 0 <= r["rows_at_risk"] <= total
        assert abs(r["risk_share"] - round(r["rows_at_risk"] / total, 6)) < 1e-12


def test_benford_shares_and_digits(spark):
    import lawfirm_data_pipeline_spark.oracle.m44_seasonal_privacy as m

    rows = m.q192_benford_audit(spark, SF).collect()
    assert all(1 <= r["digit"] <= 9 for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi2_term"] >= 0 for r in rows)
    # mirror digit extraction in python
    import collections

    pdf = spark.read.parquet(f"{SF}/orders.parquet").select("o_totalprice").toPandas()
    want = collections.Counter(
        int(str(round(v * 100))[0]) for v in pdf["o_totalprice"]
    )
    got = {r["digit"]: r["n"] for r in rows}
    assert got == dict(want)
