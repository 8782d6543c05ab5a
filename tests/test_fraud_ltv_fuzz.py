"""Spec-level fuzz for q219 (duplicate-payment screen) and q220
(cohort LTV), m57.

q219's Spark plan finds candidate pairs through a (user, cents,
10-minute-bucket) equi-join plus the +1-bucket twin — the bounded
range-join trick whose completeness argument ("a pair within 10
minutes lands in the same or adjacent bucket, and in exactly one of
the two joins") is exactly what a mirror should brute-force: all
ordered pairs, the inclusive 0..600s gap, and the (ts, event_id) tie
rule, with timestamps planted ON bucket boundaries and at exactly-600s
gaps.  q220's mirror re-derives first-touch weekly cohorts, cohort
age, cohort sizes, and the cumulative LTV curve from scratch.
Values are exact quarter-cents; LTV compares at the query's 4-decimal
half-ulp.
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

_US = 1_704_067_200_000_000  # 2024-01-01 00:00 UTC (a Monday)
_BUCKET_S = 600


def _events_df(spark, rows):
    """rows: (event_id, user_id, seconds_offset, event_type, value)."""
    return spark.createDataFrame(
        [(eid, uid, _US + s * 1_000_000, et, v) for eid, uid, s, et, v in rows],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )


# ---------------------------------------------------------------- q219

def _mirror_dups(rows):
    p = [
        (uid, s, eid, round(v * 100))
        for eid, uid, s, et, v in rows
        if et == "purchase"
    ]
    agg = {}
    for ua, sa, ia, ca in p:
        for ub, sb, ib, cb in p:
            if (
                ua == ub
                and ca == cb
                and 0 <= sb - sa <= _BUCKET_S
                and (sa < sb or (sa == sb and ia < ib))
            ):
                k = (ua, ca)
                n, mg = agg.get(k, (0, None))
                gap = (sb - sa) * 1_000_000
                agg[k] = (n + 1, gap if mg is None else min(mg, gap))
    return sorted((u, c, n, g) for (u, c), (n, g) in agg.items())


@st.composite
def _dup_rows(draw):
    n = draw(st.integers(2, 30))
    rows = []
    for eid in range(n):
        uid = draw(st.integers(0, 1))
        # offsets hugging bucket boundaries: multiples of 600s ± {0,1},
        # plus exact 600s gaps and repeated timestamps for the tie rule
        s = draw(st.integers(0, 5)) * _BUCKET_S + draw(
            st.sampled_from([0, 1, 299, 599, 600 - 1])
        )
        et = draw(st.sampled_from(["purchase", "purchase", "click"]))
        v = draw(st.sampled_from([1.0, 2.0]))
        rows.append((eid, uid, s, et, v))
    return rows


@SLOW
@given(_dup_rows())
def test_q219_matches_brute_force(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m57_fraud_ltv as m

    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["user_id"], r["cents"], r["n_pairs"], r["min_gap_us"])
        for r in m.q219_duplicate_payments(spark, "unused").collect()
    )
    assert got == _mirror_dups(rows)


# ---------------------------------------------------------------- q220

def _week(seconds: int) -> int:
    d = (datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=seconds)).date()
    monday = d - datetime.timedelta(days=d.weekday())
    return (monday - datetime.date(2024, 1, 1)).days // 7


def _mirror_ltv(rows):
    first = {}
    for _eid, uid, s, _et, _v in rows:
        first[uid] = min(first.get(uid, s), s)
    cohort = {u: _week(s) for u, s in first.items()}
    sz = defaultdict(int)
    for u in cohort:
        sz[cohort[u]] += 1
    wk = defaultdict(int)
    for _eid, uid, s, et, v in rows:
        if et == "purchase":
            wk[(cohort[uid], _week(s) - cohort[uid])] += round(v * 100)
    out = []
    for co in {c for c, _ in wk}:
        cum = 0
        for age in sorted(a for c, a in wk if c == co):
            cum += wk[(co, age)]
            out.append((co, age, sz[co], cum, cum / sz[co] / 100))
    return sorted(out)


_ltv_rows = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.integers(0, 3),
        st.integers(0, 86_400 * 7 * 5 - 1),
        st.sampled_from(["purchase", "click"]),
        st.sampled_from([1.0, 2.5, 10.0]),
    ),
    min_size=1,
    max_size=50,
).filter(lambda rs: any(et == "purchase" for _, _, _, et, _ in rs))


@SLOW
@given(_ltv_rows)
def test_q220_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m57_fraud_ltv as m

    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["cohort"], r["age"], r["n_users"], r["cum_cents"], r["ltv_per_user"])
        for r in m.q220_cohort_ltv(spark, "unused").collect()
    )
    want = _mirror_ltv(rows)
    assert [(c, a, n, cc) for c, a, n, cc, _ in got] == [
        (c, a, n, cc) for c, a, n, cc, _ in want
    ]
    for (_, _, _, _, gl), (_, _, _, _, wl) in zip(got, want):
        assert abs(gl - wl) < 5.001e-5
