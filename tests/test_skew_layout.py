"""Property tests for the m33 wave: TWAP semantics and delta-bit
accounting (the salted-join and digest queries are equivalence-gated
end to end by their oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string, value double"
    ).select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "value",
    )


def test_twap_weights_by_holding_time(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m33_skew_layout as m

    s = 1_000_000
    rows = [
        # user 0 (passes %7): value 10 held 3s, value 40 held 1s, last
        # event open-ended (dropped) -> twap = (1000*3 + 4000*1)/4 = 1750
        (1, 0, 0 * s, "view", 10.0),
        (2, 0, 3 * s, "view", 40.0),
        (3, 0, 4 * s, "view", 99.0),
        # user 7: single event -> no interval -> absent from output
        (4, 7, 0, "view", 5.0),
    ]
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: _events(spark, rows))
    got = {r["user_id"]: (r["n_intervals"], r["twap_cents"])
           for r in m.q158_twap(spark, "unused").collect()}
    assert got == {0: (2, 1750.0)}


def test_delta_bits_hand_computed(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m33_skew_layout as m

    rows = [
        (1, 0, 0, "view", 0.0),        # run head -> 64 bits
        (2, 0, 5, "view", 0.0),        # delta 5 -> bin '101' -> 3 bits
        (3, 0, 5, "view", 0.0),        # delta 0 -> bin '0' -> 1 bit
        (4, 9, 1024, "view", 0.0),     # head of user 9 -> 64 bits
    ]
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: _events(spark, rows))
    r = m.q159_delta_bits(spark, "unused").collect()[0]
    assert (r["n_rows"], r["raw_bits"], r["delta_bits"]) == (4, 256, 64 + 3 + 1 + 64)
    assert r["ratio"] == round(132 / 256, 6)
