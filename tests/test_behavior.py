"""Unit + plan tests for funnels, cohort retention, and PMI collocations."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.behavior import cohort_retention, funnel_steps
from lawfirm_data_pipeline_spark.operators.text import pmi_bigrams

from .test_plans import plan_of

SF = "/root/testdata/sf0.01"


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                user_id=u,
                ts=datetime.datetime(2024, 1, d, h),
                event_type=t,
            )
            for (u, d, h, t) in rows
        ]
    )


def test_funnel_strict_ordering(spark):
    ev = _ev(
        spark,
        [
            # u1 completes in order
            (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
            # u2 clicked BEFORE first view -> click step not converted
            (2, 1, 1, "click"), (2, 1, 2, "view"),
            # u3 views only
            (3, 2, 0, "view"),
            # u4 purchase before click -> purchase step not converted
            (4, 1, 0, "view"), (4, 1, 1, "purchase"), (4, 1, 2, "click"),
        ],
    )
    got = {r.step: (r.n_users, r.conversion) for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert got["view"] == (4, 1.0)
    assert got["click"] == (2, 0.5)      # u1, u4
    assert got["purchase"] == (1, 0.25)  # u1 only


def test_funnel_reconverting_user_counts_once(spark):
    ev = _ev(spark, [(1, 1, 0, "view"), (1, 1, 1, "click"), (1, 2, 0, "view"), (1, 2, 1, "click")])
    got = {r.step: r.n_users for r in funnel_steps(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_funnel_single_user_exchange(spark):
    ev = load_table(spark, SF, "events")
    plan = plan_of(funnel_steps(ev, ["view", "click", "purchase"]))
    # formatted explain mentions each node twice (tree + details):
    # ") Window" counts detail entries once per physical node
    assert plan.count(") Window") == 3
    # all three windows + the per-user aggregate ride ONE user_id shuffle
    assert plan.count("hashpartitioning(user_id") == 1
    # single event-table scan: conversion is computed inside the one-row
    # reshape, not via a second branch over the window pipeline
    assert plan.count(") Scan parquet") == 1


def test_cohort_retention_hand_case(spark):
    ev = _ev(
        spark,
        [
            (1, 1, 0, "view"),   # cohort week of Jan 1 (Mon)
            (1, 2, 0, "click"),  # same week -> offset 0
            (1, 15, 0, "view"),  # two weeks later -> offset 2
            (2, 9, 0, "view"),   # cohort week of Jan 8 -> offset 0 only
        ],
    )
    got = {
        (r.cohort_week.date().isoformat(), r.week_offset): r.n_users
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_pmi_matches_manual(spark):
    # corpus: "a b" x 30, "a c" x 10 -> bigrams: (a,b)=30, (b,a)=29+..
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=" ".join(["a b"] * 30)), Row(doc_id=1, text=" ".join(["a c"] * 10))]
    )
    out = {(r.w1, r.w2): (r.c_ab, r.pmi) for r in pmi_bigrams(docs, min_count=10, k=10).collect()}
    # doc0: tokens a b a b ... -> (a,b) x30, (b,a) x29; doc1: (a,c) x10, (c,a) x9
    n = 30 + 29 + 10 + 9
    c_l = {"a": 40, "b": 29, "c": 9}
    c_r = {"b": 30, "a": 38, "c": 10}
    for (w1, w2), (c_ab, pmi) in out.items():
        want = round(math.log(c_ab * n / (c_l[w1] * c_r[w2])), 6)
        assert abs(pmi - want) < 1e-9, (w1, w2)
    assert set(out) == {("a", "b"), ("b", "a"), ("a", "c")}


def test_pmi_single_corpus_scan(spark):
    # the bigram table is checkpointed at build: marginal branches read
    # the materialized table, so the final plan contains NO parquet
    # re-scan of the corpus (pre-fix: 8 scans, one per branch)
    docs = load_table(spark, SF, "documents")
    plan = plan_of(pmi_bigrams(docs, min_count=25, k=20))
    assert plan.count("Scan parquet") == 0
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
