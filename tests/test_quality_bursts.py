"""Property tests for the m40 wave: the CUSUM prefix-minus-min
identity and label-separation sanity."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events_daily(spark, counts):
    # synthesize one event per count unit on consecutive days
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


def test_cusum_matches_sequential_recurrence(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m40_quality_bursts as m

    counts = [3, 3, 3, 10, 11, 3, 3, 2, 2, 3]
    df = _events_daily(spark, counts)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    r = m.q178_cusum_bursts(spark, "unused").collect()[0]
    # sequential reference: S_t = max(0, S_{t-1} + (y*n - sum))
    n, sm = len(counts), sum(counts)
    s_val, best, best_day = 0, 0, 0
    for i, y in enumerate(counts):
        s_val = max(0, s_val + (y * n - sm))
        if s_val > best:
            best, best_day = s_val, i
    assert r["max_excursion"] == best
    assert r["peak_day"].day == best_day + 1  # January days
    assert bool(r["burst"]) == (best > sm)


def test_cusum_flat_series_no_burst(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m40_quality_bursts as m

    df = _events_daily(spark, [4] * 8)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    r = m.q178_cusum_bursts(spark, "unused").collect()[0]
    assert r["max_excursion"] == 0 and not r["burst"]


def test_label_separation_on_orthogonal_clusters(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m40_quality_bursts as m

    # two tight orthogonal clusters: intra ~1, inter ~0
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.001 * i], 0))
        rows.append((100 + i, [0.001 * i, 1.0], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {r["label"]: r for r in m.q177_label_separation(spark, "unused").collect()}
    for lbl in (0, 1):
        assert got[lbl]["intra_mean_cos"] > 0.99
        assert got[lbl]["nearest_other_cos"] < 0.01
