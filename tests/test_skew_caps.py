"""Degenerate-group caps (r11 zipf-skew corpus findings).

The adversarial skew corpus (tools/freshdraw_sf1.py --skew 1.2; hot
orderkey = 19% of lineitem) proved three output-explosion classes that
no partitioning strategy can fix because the OUTPUT itself is
quadratic in the hot group:

1. pair mining over a mega-basket  -> C(b, 2) pairs
2. clique-degenerate co-purchase graphs -> superlinear wedge/edge work
3. hot-user attribution            -> conversions x touches per key

Each is closed by a deterministic, engine-mirrored cap (the SQL twins
carry matching QUALIFYs), invisible on all standard corpora (baskets
<= ~60 items, users <= ~150 events).  These pins exercise the caps on
crafted degenerate inputs so a refactor cannot silently drop them.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_basket_pairs_excludes_mega_baskets(spark):
    from lawfirm_data_pipeline_spark.operators.itemsets import basket_pairs

    # disjoint item ids so big-basket pairs can't merge with small's
    rows = [("big", i) for i in range(50)] + [("small", 100 + i) for i in range(4)]
    items = spark.createDataFrame(rows, "ok string, pk int")
    got = basket_pairs(items, max_basket=10).collect()
    # only the small basket's C(4,2)=6 pairs survive
    assert len(got) == 6
    assert all(r["w"] == 1 for r in got)
    # uncapped: C(50,2) + C(4,2)
    assert basket_pairs(items, max_basket=None).count() == 1225 + 6


def test_association_rules_cap_consistent_universe(spark):
    """Excluded mega-baskets must vanish from supports AND the basket
    count, not just the pair list — lift uses n_baskets."""
    from lawfirm_data_pipeline_spark.operators.itemsets import association_rules

    rows = (
        [("mega", i) for i in range(40)]
        + [("b1", 1), ("b1", 2), ("b2", 1), ("b2", 2), ("b3", 1), ("b3", 2)]
    )
    baskets = spark.createDataFrame(rows, "ok string, pk int")
    out = association_rules(baskets, min_support=3, max_basket=10).collect()
    by = {(r["ante"], r["cons"]): r for r in out}
    assert set(by) == {(1, 2), (2, 1)}
    r = by[(1, 2)]
    # universe = 3 kept baskets; support(1)=support(2)=3, support(12)=3
    assert r["support"] == 3
    assert r["confidence"] == 1.0
    assert r["lift"] == 1.0  # 3*3/(3*3)


def test_copurchase_edges_graph_cap_tighter(spark):
    from lawfirm_data_pipeline_spark.operators.graph_metrics import (
        GRAPH_MAX_BASKET,
        copurchase_edges,
    )
    from lawfirm_data_pipeline_spark.operators.itemsets import MAX_BASKET

    assert GRAPH_MAX_BASKET < MAX_BASKET  # cliques cost more than pairs
    rows = [(1, i) for i in range(GRAPH_MAX_BASKET + 1)] + [(2, 1), (2, 2)]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    )
    edges = copurchase_edges(li).collect()
    assert [(e["src"], e["dst"]) for e in edges] == [(1, 2)]


def test_attribution_bot_filter_excludes_hot_user(spark, tmp_path):
    """q218's 5000-events-per-user cap: a degenerate user contributes
    nothing; normal users' credit is unchanged."""
    import __spark_entry__ as e

    import pandas as pd
    import numpy as np

    n_bot = 6000
    ts0 = pd.Timestamp("2024-01-10")
    rows = []
    # bot user 99: alternating view/purchase far above the cap
    for i in range(n_bot):
        rows.append(
            (i, ts0 + pd.Timedelta(minutes=i), 99,
             "purchase" if i % 5 == 0 else "view", 1.0, "{}")
        )
    # normal user 1: two touches then a purchase
    rows += [
        (10_000, ts0, 1, "view", 0.0, "{}"),
        (10_001, ts0 + pd.Timedelta(hours=1), 1, "click", 0.0, "{}"),
        (10_002, ts0 + pd.Timedelta(hours=2), 1, "purchase", 10.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # write via pyarrow us-timestamps — the loader footer-sniffs the
    # events.ts physical unit and expects the testdata layout
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    table = pa.table(
        {
            "event_id": pa.array(pdf["event_id"], type=pa.int64()),
            "ts": pa.array(pdf["ts"], type=pa.timestamp("us")),
            "user_id": pa.array(pdf["user_id"], type=pa.int64()),
            "event_type": pa.array(pdf["event_type"]),
            "value": pa.array(pdf["value"], type=pa.float64()),
            "props": pa.array(pdf["props"]),
        }
    )
    pq.write_table(table, f"{d}/events.parquet")

    out = {
        r["channel"]: (r["n_touches"], r["credit_micro_cents"])
        for r in e.queries()["q218_position_attribution"](spark, d).collect()
    }
    # ONLY user 1's two touches: 50/50 split of 1000 cents in micro-shares
    assert out == {
        "view": (1, 500_000 * 1000),
        "click": (1, 500_000 * 1000),
    }


def test_skew_axis_is_a_standing_close_gate_step():
    """r11 verdict task #3: the zipf-skew differential must be part of
    the per-round close gate (a one-shot adversarial corpus is a
    fixture after its first pass).  Pins the step's presence in both
    execution paths, the artifact in the dirty-tree allowance and the
    summary, and the rotating-seed materialization."""
    import inspect

    from tools import close_gate

    src = inspect.getsource(close_gate)
    assert close_gate.SKEW_EXP == 1.2
    # parallel steps dict + sequential path + summary row + own-set
    assert src.count('differential_skew_r{args.round}.json"') >= 4
    assert '"skew": (' in src  # parallel launch entry
    assert "zipf-skew hot-key differential" in src  # sequential entry
    # per-round seed rotation (never a fixed corpus)
    assert "freshdraw_sf1.out_dir(seed, 10, skew=SKEW_EXP)" in src
    assert "freshdraw_sf1.materialize(seed, 10, skew=SKEW_EXP)" in src
    # the r12 null-injection axis is standing the same way
    assert close_gate.NULLS_RATE == 0.1
    assert src.count('differential_nulls_r{args.round}.json"') >= 4
    assert '"nulls": (' in src
    assert "null-injection differential" in src
    assert "freshdraw_sf1.materialize(seed, 10, nulls=NULLS_RATE)" in src
