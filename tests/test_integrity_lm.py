"""Unit + plan tests for constraint audits, winsorization, the bigram
LM, and the Q5-shape multi-join."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.constraints import (
    constraint_audit,
    domain_violations,
    fk_orphans,
    uniqueness_violations,
)
from lawfirm_data_pipeline_spark.operators.curation import winsorized_stats
from lawfirm_data_pipeline_spark.operators.text import bigram_logprob_scores
from lawfirm_data_pipeline_spark.oracle.m21_integrity_lm import q114_supply_chain

from .test_plans import plan_of

SF = "/root/testdata/sf0.01"


def test_uniqueness_and_fk_and_domain(spark):
    child = spark.createDataFrame(
        [Row(id=1, fk=10), Row(id=1, fk=10), Row(id=2, fk=99), Row(id=3, fk=None)]
    )
    parent = spark.createDataFrame([Row(pk=10)])
    uv = uniqueness_violations(child, ["id"]).collect()
    assert [(r.id, r.n_rows) for r in uv] == [(1, 2)]
    orphans = fk_orphans(child, "fk", parent, "pk").collect()
    assert [r.id for r in orphans] == [2]  # NULL fk is not an orphan
    dv = domain_violations(
        spark.createDataFrame([Row(v="a"), Row(v="b"), Row(v=None)]), "v", ["a"]
    ).collect()
    assert [r.v for r in dv] == ["b"]


def test_constraint_audit_summary_shape(spark):
    df = spark.createDataFrame([Row(id=1), Row(id=1), Row(id=2)])
    out = constraint_audit(
        {
            "dupes": uniqueness_violations(df, ["id"]),
            "clean": uniqueness_violations(df.select(F.monotonically_increasing_id().alias("id")), ["id"]),
        }
    ).collect()
    got = {r.check: r.n_violations for r in out}
    assert got == {"dupes": 1, "clean": 0}


def test_winsorized_stats_hand_case(spark):
    # 100 values 1..100 plus one extreme outlier per side
    rows = [Row(g="a", v=float(i)) for i in range(1, 101)]
    rows += [Row(g="a", v=-1000.0), Row(g="a", v=1000.0)]
    df = spark.createDataFrame(rows)
    r = winsorized_stats(df, "g", "v", 0.01, 0.99).first()
    assert r.n == 102
    assert r.n_clipped_low >= 1 and r.n_clipped_high >= 1
    assert -1000.0 < r.p_low < r.p_high < 1000.0
    # clipped mean is bounded by the clip bounds
    assert r.p_low <= r.clipped_mean <= r.p_high


def test_bigram_lm_scores_transitions(spark):
    # "a b" transitions dominate the corpus; doc 9 uses unseen pairs of
    # SEEN unigrams -> much lower bigram score
    rows = [Row(doc_id=i, text="a b " * 20) for i in range(9)]
    rows.append(Row(doc_id=9, text="b b a a b b a a"))
    docs = spark.createDataFrame(rows)
    got = {r.doc_id: r.avg_bigram_logp for r in bigram_logprob_scores(docs).collect()}
    assert got[9] < got[0] - 1.0


def test_bigram_lm_partition_invariant(spark):
    docs = load_table(spark, SF, "documents").limit(100)
    a = sorted(
        (r.doc_id, r.avg_bigram_logp) for r in bigram_logprob_scores(docs).collect()
    )
    b = sorted(
        (r.doc_id, r.avg_bigram_logp)
        for r in bigram_logprob_scores(docs.repartition(13)).collect()
    )
    assert a == b


def test_supply_chain_broadcasts_dims_and_pushes_date(spark):
    plan = plan_of(q114_supply_chain(spark, SF))
    # supplier/nation/region ride broadcast joins; the only sort-merge
    # (if any) is the fact-fact pair
    assert plan.count("BroadcastHashJoin") >= 3
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "GreaterThanOrEqual(o_orderdate" in plan
