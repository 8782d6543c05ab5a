"""Differential tests for operators/ranking.py: the two-phase
distributed rank / running sum must equal the single-task global
window bit-for-bit on every input shape that matters — heavy ties
(boundary-straddling groups), skew, descending keys, tiny inputs,
empty inputs — because four driver-gated queries (q216/q249/q252/q268)
ride on the equivalence."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.ranking import (
    global_row_number,
    global_running_sum,
    top_k_ranked,
)


def _mkdf(spark, n, tie_heavy, seed):
    rng = random.Random(seed)
    # tie_heavy: key domain of 3 so every range boundary splits a tie
    # group; otherwise a wide domain with occasional duplicates
    dom = 3 if tie_heavy else max(4, n // 2)
    rows = [
        Row(id=i, key=rng.randrange(dom), val=rng.randrange(-50, 500))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, key long, val long")


@pytest.mark.parametrize("n,tie_heavy,parts", [
    (0, False, 4),
    (1, False, 4),
    (7, True, 4),
    (500, True, 8),
    (500, False, 8),
    (1000, True, 32),
])
def test_row_number_matches_global_window(spark, n, tie_heavy, parts):
    df = _mkdf(spark, n, tie_heavy, seed=n + parts)
    order = [F.col("key").desc(), F.col("id")]
    got = {
        r["id"]: r["rk"]
        for r in global_row_number(df, order, "rk", num_partitions=parts).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.col("key").desc(), "id"))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("exclusive", [False, True])
@pytest.mark.parametrize("n,tie_heavy", [(0, False), (1, True), (400, True), (400, False)])
def test_running_sum_matches_global_window(spark, n, tie_heavy, exclusive):
    df = _mkdf(spark, n, tie_heavy, seed=91 * n + exclusive)
    order = [F.col("key"), F.col("id").desc()]
    got = {
        r["id"]: r["cum"]
        for r in global_running_sum(
            df, "val", order, "cum", exclusive=exclusive, num_partitions=8
        ).collect()
    }
    hi = -1 if exclusive else Window.currentRow
    w = (
        Window.orderBy(F.col("key"), F.col("id").desc())
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum", F.coalesce(F.sum("val").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("k", [1, 5, 50])
def test_top_k_ranked_matches_window_filter(spark, k):
    df = _mkdf(spark, 300, tie_heavy=True, seed=k)
    order = [F.col("val").desc(), F.col("id")]
    got = sorted(
        (r["id"], r["rank"])
        for r in top_k_ranked(df, k, order, "rank").collect()
    )
    w = Window.orderBy(F.col("val").desc(), "id")
    want = sorted(
        (r["id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )
    assert got == want
    assert len(got) == min(k, 300)


def test_reserved_scratch_name_collision_raises(spark):
    """r7 ADVICE: a caller column named _rk_pid/_rk_val/_rk_off/_rk_tot
    would be silently overwritten then dropped — must raise instead."""
    base = _mkdf(spark, 10, tie_heavy=False, seed=3)
    for bad in ("_rk_pid", "_rk_val", "_rk_off", "_rk_tot"):
        df = base.withColumn(bad, F.lit(1))
        with pytest.raises(ValueError, match=bad):
            global_row_number(df, [F.col("id")], "rk")
        with pytest.raises(ValueError, match=bad):
            global_running_sum(df, "val", [F.col("id")], "cum")


def test_float_value_col_raises(spark):
    """r7 ADVICE: the integer/exact-value contract of global_running_sum
    is enforced, not just documented — float/double accumulation order
    differs between the two-phase scan and the single window."""
    df = _mkdf(spark, 10, tie_heavy=False, seed=5)
    with pytest.raises(TypeError, match="double"):
        global_running_sum(
            df.withColumn("fval", F.col("val").cast("double")),
            "fval", [F.col("id")], "cum",
        )
    with pytest.raises(TypeError, match="float"):
        global_running_sum(df, F.col("val").cast("float"), [F.col("id")], "cum")
    # decimal stays allowed — it is exact
    got = global_running_sum(
        df.withColumn("dval", F.col("val").cast("decimal(18,2)")),
        "dval", [F.col("id")], "cum", num_partitions=4,
    ).count()
    assert got == 10


def test_no_single_task_window_in_plan(spark):
    """The physical plan must window-partition by the pid column —
    i.e. the only unpartitioned window allowed is the one over the
    <=P-row totals table, never over the input rows."""
    df = _mkdf(spark, 100, tie_heavy=False, seed=7)
    out = global_row_number(df, [F.col("key"), F.col("id")], "rk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node over the data carries the _rk_pid partition spec;
    # the offsets window runs over the totals agg (grep for its sum col)
    for line in plan.splitlines():
        if "Window [" in line and "_rk_pid" not in line:
            assert "_rk_tot" in line, f"unpartitioned data window: {line}"
