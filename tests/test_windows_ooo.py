"""Property tests for the m47 wave: RANGE-frame velocity semantics,
grouping-set marginal consistency, watermark-audit lateness math."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _events(spark, rows):
    # rows: (event_id, user_id, us_offset, event_type)
    base = 1_704_067_200_000_000
    return spark.createDataFrame(
        [(e, u, base + us, t, 0.0) for e, u, us, t in rows],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "value",
    )


def test_velocity_counts_trailing_window_and_ties(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m47_windows_ooo as m

    minute = 60_000_000
    rows = [
        # user 1: burst of 4 inside 10 min, then a far-away straggler
        (0, 1, 0 * minute, "click"),
        (1, 1, 3 * minute, "click"),
        (2, 1, 6 * minute, "click"),
        (3, 1, 9 * minute, "click"),
        (4, 1, 60 * minute, "click"),
        # user 2: two events at the SAME microsecond — RANGE counts both
        (5, 2, 0, "click"),
        (6, 2, 0, "click"),
        # user 3: evenly spread, never 2 in any 10-min window
        (7, 3, 0 * minute, "click"),
        (8, 3, 20 * minute, "click"),
        (9, 3, 40 * minute, "click"),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    hist = {r["max_velocity"]: r["n_users"] for r in m.q199_event_velocity(spark, "unused").collect()}
    assert hist == {4: 1, 2: 1, 1: 1}


def test_grouping_sets_marginals_consistent(spark):
    import lawfirm_data_pipeline_spark.oracle.m47_windows_ooo as m

    rows = m.q200_grouping_sets(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/orders.parquet").count()
    # gid bit map: grouping(status)*2 + grouping(priority); the status
    # grain aggregates AWAY priority -> grouping(priority)=1 -> gid=1
    by_status = [r for r in rows if r["gid"] == 1]
    by_prio = [r for r in rows if r["gid"] == 2]
    cross = [r for r in rows if r["gid"] == 0]
    assert sum(r["n"] for r in by_status) == total
    assert sum(r["n"] for r in by_prio) == total
    assert sum(r["n"] for r in cross) == total
    assert all(r["priority"] == "ALL" for r in by_status)
    assert all(r["status"] == "ALL" for r in by_prio)
    rev = {True: 0, False: 0}
    for r in rows:
        rev[r["gid"] == 0] = rev[r["gid"] == 0] + r["revenue_cents"]
    assert rev[True] * 2 == rev[False]  # each marginal grain re-sums the total


def test_watermark_audit_lateness(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m47_windows_ooo as m

    s = 1_000_000
    rows = [
        (0, 1, 100 * s, "click"),
        (1, 1, 200 * s, "click"),
        (2, 1, 150 * s, "click"),   # 50 s late vs hwm 200
        (3, 1, 300 * s, "click"),
        (4, 1, 295 * s, "click"),   # 5 s late vs hwm 300
        (5, 1, 400 * s, "click"),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    r = m.q201_watermark_audit(spark, "unused").collect()[0]
    assert r["n"] == 6 and r["n_late"] == 2
    assert r["max_late_s"] == 50
    assert abs(r["late_share"] - round(2 / 6, 6)) < 1e-12


def test_watermark_audit_ordered_stream_zero_late(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m47_windows_ooo as m

    rows = [(i, 1, i * 1_000_000, "view") for i in range(20)]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    r = m.q201_watermark_audit(spark, "unused").collect()[0]
    assert r["n_late"] == 0 and r["max_late_s"] == 0 and r["p99_late_s"] == 0
