"""Property tests for the m27 wave: prefix-filter similarity join,
gaps-and-islands intervals, zone-map pruning, last-touch attribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.behavior import last_touch_attribution
from lawfirm_data_pipeline_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from lawfirm_data_pipeline_spark.operators.profile import zone_map, zone_map_prune
from lawfirm_data_pipeline_spark.operators.timeseries import state_intervals


def test_prefix_filter_equals_quadratic_join(spark):
    # overlapping word soups at varied lengths, including a size-35
    # token stream (the float-ceil trap: ceil(0.8*35) must be 28, the
    # binary-float 28.000000000000004 would ceil to 29 and shrink the
    # prefix below the lossless bound)
    base = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(12):
        toks = base[d % 3 : d % 3 + 30 + (d % 7)]
        docs.append((d, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fast = {
        (r["ida"], r["idb"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(df, 4, 5, n=3).collect()
    }
    brute = {
        (r["ida"], r["idb"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.8, n=3, df_cap=None).collect()
    }
    # brute uses the rounded-float gate; re-filter it with the integer
    # gate semantics by keeping only pairs the exact ratio admits
    assert fast == {p for p in brute if p in fast} and len(fast) >= 1
    assert {p[:2] for p in fast} == {p[:2] for p in brute}


def test_state_intervals_runs_and_bounds(spark):
    rows = [
        (1, 1, 100, "A"), (2, 1, 200, "A"), (3, 1, 300, "B"),
        (4, 1, 400, "A"),  # A again -> new island, not merged with the first
        (5, 2, 100, "C"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).select("event_id", "user_id", F.timestamp_micros((F.col("us") * 1_000_000)).alias("ts"), "event_type")
    got = sorted(
        (r["user_id"], r["island"], r["state"], r["n_events"])
        for r in state_intervals(df).collect()
    )
    assert got == [(1, 1, "A", 2), (1, 2, "B", 1), (1, 3, "A", 1), (2, 1, "C", 1)]


def test_zone_map_prune_all_decisions(spark):
    rows = [(1, 5), (1, 9), (2, 20), (2, 30), (3, 25), (3, 45), (4, 100)]
    df = spark.createDataFrame(rows, "p long, v long")
    zm = zone_map(df, F.col("p"), "v")
    got = {r["part"]: r["decision"] for r in zone_map_prune(zm, 20, 40).collect()}
    assert got == {1: "skip", 2: "full", 3: "partial", 4: "skip"}


def test_attribution_window_and_none_bucket(spark):
    m = 60_000_000
    day = 24 * 60 * m
    base = 1_700_000_000_000_000
    rows = [
        # user 1: click then purchase 1 day later -> attributed to click
        (1, 1, base, "click", 0.0),
        (2, 1, base + day, "purchase", 10.0),
        # user 1: next purchase 9 days after the click -> 'none'
        (3, 1, base + 10 * day, "purchase", 5.0),
        # user 2: purchase with no prior event -> 'none'
        (4, 2, base, "purchase", 2.5),
        # user 2: view then purchase -> view
        (5, 2, base + m, "view", 0.0),
        (6, 2, base + 2 * m, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string, value double"
    ).select("event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "event_type", "value")
    got = {
        r["touch_type"]: (r["n_conversions"], r["value_cents"])
        for r in last_touch_attribution(df).collect()
    }
    assert got == {"click": (1, 1000), "none": (2, 750), "view": (1, 100)}
