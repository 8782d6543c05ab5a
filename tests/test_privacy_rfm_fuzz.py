"""Spec-level fuzz for q191 (k-anonymity ladder), q228 (l-diversity),
and q215 (RFM quintile segments).

Independent mirrors: q191 re-derives the three generalization levels'
group histograms and k=5 risk stats (true-floor balance bands on
negative balances included); q228 the per-group distinct-sensitive
count and the l>=3 verdict; q215 the per-customer (recency, frequency,
monetary) triple, the continuous 20/40/60/80 quantile cuts (linear
interpolation, lower + d·(higher−lower)), and the strictly-greater
quintile coding.  Small integer domains make cut-equals-value
boundaries common — exactly where a strictly-vs-weakly-greater coding
mistake, shared by both engines, would hide from the differential.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _cust_df(spark, rows):
    """rows: (nationkey, segment, cents_balance)."""
    return spark.createDataFrame(
        [(i, f"c{i}", nk, c / 100.0, seg) for i, (nk, seg, c) in enumerate(rows)],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )


_cust_rows = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.sampled_from(["A", "B"]),
        st.sampled_from([-150_000, -1, 0, 99_999, 499_999, 500_000, 999_999]),
    ),
    min_size=1,
    max_size=40,
)


# ---------------------------------------------------------------- q191

def _mirror_k_anon(rows):
    total = len(rows)
    qi = [(nk, seg, math.floor(c / 100.0 / 1000)) for nk, seg, c in rows]
    out = []
    for lvl, label, key in (
        (0, "nation+segment+balband", lambda t: t),
        (1, "nation+segment", lambda t: (t[0], t[1])),
        (2, "segment", lambda t: (t[1],)),
    ):
        hist = Counter(key(t) for t in qi)
        ns = list(hist.values())
        below = [n for n in ns if n < 5]
        out.append(
            (lvl, label, len(ns), len(below), sum(below), min(ns),
             round(sum(below) / total, 10))
        )
    return out


@SLOW
@given(_cust_rows)
def test_q191_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m44_seasonal_privacy as m

    df = _cust_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["level"], r["quasi_ids"], r["n_groups"], r["groups_below_k"],
         r["rows_at_risk"], r["min_group"], r["risk_share"])
        for r in m.q191_k_anonymity(spark, "unused").collect()
    )
    want = _mirror_k_anon(rows)
    assert [g[:6] for g in got] == [w[:6] for w in want]
    for g, w in zip(got, want):
        assert abs(g[6] - w[6]) < 5.001e-7


# ---------------------------------------------------------------- q228

def _mirror_l_div(rows):
    g = defaultdict(set)
    n = Counter()
    for nk, seg, c in rows:
        bal = c / 100.0
        sens = "neg" if bal < 0 else ("mid" if bal < 5000 else "high")
        g[(nk, seg)].add(sens)
        n[(nk, seg)] += 1
    return sorted(
        (nk, seg, n[(nk, seg)], len(s), len(s) >= 3)
        for (nk, seg), s in g.items()
    )


@SLOW
@given(_cust_rows)
def test_q228_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m62_er_privacy_multimodal as m

    df = _cust_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["nat"], r["seg"], r["n_rows"], r["l_distinct"], r["l_ok"])
        for r in m.q228_l_diversity(spark, "unused").collect()
    )
    assert got == _mirror_l_div(rows)


# ---------------------------------------------------------------- q215

def _qcont(xs, q):
    xs = sorted(xs)
    h = (len(xs) - 1) * q
    lo = math.floor(h)
    if lo + 1 >= len(xs):
        return float(xs[-1])
    return xs[lo] + (h - lo) * (xs[lo + 1] - xs[lo])


def _mirror_rfm(orders):
    per = defaultdict(lambda: [0, 0, 0])  # c -> [last_us, freq, monetary]
    for c, day, cents in orders:
        us = day * 86_400_000_000
        p = per[c]
        p[0] = max(p[0], us)
        p[1] += 1
        p[2] += cents
    vals = list(per.values())
    cuts = [
        [_qcont([v[i] for v in vals], q) for q in (0.2, 0.4, 0.6, 0.8)]
        for i in range(3)
    ]
    seg = Counter()
    for v in vals:
        seg[tuple(1 + sum(1 for c in cuts[i] if v[i] > c) for i in range(3))] += 1
    return sorted((r, f, m2, n) for (r, f, m2), n in seg.items())


_order_rows = st.lists(
    st.tuples(
        st.integers(0, 6),          # custkey
        st.integers(0, 20),         # orderdate day offset from epoch
        st.sampled_from([100, 200, 300, 500]),  # cents
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(_order_rows)
def test_q215_matches_spec_mirror(spark, monkeypatch, orders):
    import datetime

    import lawfirm_data_pipeline_spark.oracle.m55_segmentation as m

    df = spark.createDataFrame(
        [
            (i, c, datetime.datetime(1970, 1, 1) + datetime.timedelta(days=day),
             cents / 100.0)
            for i, (c, day, cents) in enumerate(orders)
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["r"], r["f"], r["m"], r["n_customers"])
        for r in m.q215_rfm_segments(spark, "unused").collect()
    )
    assert got == _mirror_rfm(orders)
