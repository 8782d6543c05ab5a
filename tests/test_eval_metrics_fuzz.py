"""Spec-level fuzz for q253 (calibration/ECE bins) and q254 (NDCG@5),
m71.

Independent Python mirrors re-derive both metrics from their specs —
q253: conf_milli = key·2654435761 mod 1000, decile bin = conf//100,
mean confidence from the exact integer sum, per-bin ECE term =
(n/total)·|mean_conf − obs_rate|; q254: relevance = 5 − priority
digit, prediction ranking by (totalprice DESC, orderkey), ideal
ranking by (rel DESC, orderkey), DCG@5 = Σ rel/log2(r+1), zero-IDCG
customers define NDCG = 1.  The Spark plan and the DuckDB oracle
share one derivation, so the differential cannot catch a shared
mistake in the bin edges, the tie-break order, the @5 cutoff, or the
zero-IDCG convention; these mirrors can (r8 verdict task #3).

Prices are exact quarters (binary-exact doubles) with deliberate
duplicates so tie-breaks are load-bearing; rounded doubles compare at
the 6-decimal half-ulp per the repo convention.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_ULP6 = 5.0000001e-7


# ---------------------------------------------------------------- q253

def _mirror_ece(keys_prices: list[tuple[int, float]]):
    bins: dict[int, list[int]] = {}
    for k, price in keys_prices:
        conf = k * 2654435761 % 1000
        y = 1 if price > 150000 else 0
        b = conf // 100
        n, cs, np_ = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, cs + conf, np_ + y)
    total = sum(n for n, _, _ in bins.values())
    out = {}
    for b, (n, cs, np_) in bins.items():
        mean_conf = cs / n / 1000.0
        obs = np_ / n
        out[b] = (n, mean_conf, obs, n / total * abs(mean_conf - obs))
    return out


@st.composite
def _orders_ece(draw):
    n = draw(st.integers(1, 60))
    keys = draw(st.lists(st.integers(1, 100_000), min_size=n, max_size=n, unique=True))
    # prices straddle the 150000 label threshold; exact quarters
    return [
        (k, draw(st.integers(599_000, 601_000)) / 4.0)
        for k in keys
    ]


@SLOW
@given(_orders_ece())
def test_q253_matches_spec_mirror(spark, monkeypatch, keys_prices):
    import lawfirm_data_pipeline_spark.oracle.m71_eval_fairness as m

    df = spark.createDataFrame(keys_prices, "o_orderkey long, o_totalprice double")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    exp = _mirror_ece(keys_prices)
    got = m.q253_calibration_ece(spark, "unused").collect()
    assert {r["bin"] for r in got} == set(exp)
    for r in got:
        n, mean_conf, obs, ece = exp[r["bin"]]
        assert r["n"] == n, r["bin"]
        assert abs(r["mean_conf"] - mean_conf) <= _ULP6, r["bin"]
        assert abs(r["obs_rate"] - obs) <= _ULP6, r["bin"]
        assert abs(r["ece_term"] - ece) <= _ULP6, r["bin"]


def test_q253_exactly_calibrated_bin_has_zero_ece(spark, monkeypatch):
    """A bin whose mean confidence equals its observed rate must emit
    ece_term = 0 exactly — a sign slip or a swapped operand in the
    |conf − acc| term shows up here first."""
    import lawfirm_data_pipeline_spark.oracle.m71_eval_fairness as m

    # key 250 -> conf = 250*2654435761 % 1000 = 250; bin 2. Build a
    # bin with mean conf 0.25 and a 1-in-4 positive rate.
    keys = [k for k in range(1, 100_000) if k * 2654435761 % 1000 == 250][:4]
    assert len(keys) == 4
    rows = [(keys[0], 200_000.0)] + [(k, 1_000.0) for k in keys[1:]]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {r["bin"]: r for r in m.q253_calibration_ece(spark, "unused").collect()}
    assert got[2]["mean_conf"] == 0.25
    assert got[2]["obs_rate"] == 0.25
    assert got[2]["ece_term"] == 0.0


# ---------------------------------------------------------------- q254

def _mirror_ndcg(rows: list[tuple[int, int, float, str]]):
    by_cust: dict[int, list[tuple[int, float, int]]] = {}
    for ck, ok, price, prio in rows:
        if ck % 7 != 0:
            continue
        rel = 5 - int(prio[0])
        by_cust.setdefault(ck, []).append((ok, price, rel))
    out = {}
    for ck, orders in by_cust.items():
        pred = sorted(orders, key=lambda t: (-t[1], t[0]))[:5]
        ideal = sorted(orders, key=lambda t: (-t[2], t[0]))[:5]
        dcg = sum(rel / math.log2(r + 1.0) for r, (_, _, rel) in enumerate(pred, 1))
        idcg = sum(rel / math.log2(r + 1.0) for r, (_, _, rel) in enumerate(ideal, 1))
        out[ck] = (dcg, idcg, dcg / idcg if idcg > 0 else 1.0)
    return out


_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@st.composite
def _orders_ndcg(draw):
    n = draw(st.integers(1, 40))
    okeys = draw(st.lists(st.integers(1, 10_000), min_size=n, max_size=n, unique=True))
    rows = []
    for ok in okeys:
        ck = draw(st.integers(0, 4)) * 7 + draw(st.integers(0, 1))  # mostly %7==0
        # tiny price domain (quarters) -> frequent ties on totalprice
        price = draw(st.integers(0, 12)) * 0.25 + 100.0
        rows.append((ck, ok, price, draw(st.sampled_from(_PRIOS))))
    return rows


@SLOW
@given(_orders_ndcg())
def test_q254_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m71_eval_fairness as m

    df = spark.createDataFrame(
        rows,
        "o_custkey long, o_orderkey long, o_totalprice double, "
        "o_orderpriority string",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    exp = _mirror_ndcg(rows)
    got = m.q254_ndcg_at_5(spark, "unused").collect()
    assert {r["cust"] for r in got} == set(exp)
    for r in got:
        dcg, idcg, ndcg = exp[r["cust"]]
        assert abs(r["dcg"] - dcg) <= _ULP6, r["cust"]
        assert abs(r["idcg"] - idcg) <= _ULP6, r["cust"]
        assert abs(r["ndcg"] - ndcg) <= _ULP6, r["cust"]


def test_q254_all_low_priority_customer_gets_ndcg_one(spark, monkeypatch):
    """rel = 5 − '5' = 0 everywhere -> IDCG = 0 -> NDCG defined as 1.0
    (the zero-IDCG convention both engines share; a 0/0 -> NULL or 0
    implementation fails loudly here)."""
    import lawfirm_data_pipeline_spark.oracle.m71_eval_fairness as m

    rows = [(7, i, 100.0 + i, "5-LOW") for i in range(1, 4)]
    df = spark.createDataFrame(
        rows,
        "o_custkey long, o_orderkey long, o_totalprice double, "
        "o_orderpriority string",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = m.q254_ndcg_at_5(spark, "unused").collect()
    assert len(got) == 1
    assert got[0]["dcg"] == 0.0 and got[0]["idcg"] == 0.0
    assert got[0]["ndcg"] == 1.0
