"""Property tests for the m26 wave: blocked linkage, incremental view
maintenance, skyline, session paths — each checked against a brute
force or hand-computed answer on data crafted to hit the edge paths
(group moves, frontier ties, session breaks, cross-block pairs)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.behavior import consecutive_paths
from lawfirm_data_pipeline_spark.operators.ivm import maintain_group_totals
from lawfirm_data_pipeline_spark.operators.linkage import name_variant_pairs
from lawfirm_data_pipeline_spark.operators.pareto import skyline_2d


def test_ivm_matches_recompute_with_moves_inserts_deletes(spark):
    # old: keys 1-6; new: 2-8 with key 3 moved to group 'b' and key 4's
    # cents changed — exercises delete(1), insert(7,8), update-move(3),
    # update-in-place(4), untouched(2,5,6).
    old_rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 40), (5, "b", 50), (6, "c", 60)]
    new_rows = [(2, "a", 20), (3, "b", 30), (4, "b", 45), (5, "b", 50), (6, "c", 60), (7, "c", 70), (8, "d", 80)]
    schema = "k long, grp string, cents long"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    got = {
        r["grp"]: (r["n_rows"], r["sum_cents"])
        for r in maintain_group_totals(old, new, ["k"], "grp", F.col("cents")).collect()
    }
    want = {}
    for _, g, c in new_rows:
        n, s = want.get(g, (0, 0))
        want[g] = (n + 1, s + c)
    assert got == want


def test_ivm_drops_emptied_groups(spark):
    schema = "k long, grp string, cents long"
    old = spark.createDataFrame([(1, "only", 5)], schema)
    new = spark.createDataFrame([(1, "moved", 5)], schema)
    got = maintain_group_totals(old, new, ["k"], "grp", F.col("cents")).collect()
    assert {r["grp"] for r in got} == {"moved"}


def _brute_skyline(rows):
    out = []
    for p in rows:
        dominated = any(
            q[2] <= p[2] and q[1] >= p[1] and (q[2] < p[2] or q[1] > p[1])
            for q in rows
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force_with_ties(spark):
    # two rows tie at (size=5, cost=100): both survive; a row equal in
    # cost to a larger size is dominated.
    rows = [
        (1, 5, 100), (2, 5, 100),  # frontier ties, both kept
        (3, 4, 100),               # dominated by size-5 at same cost
        (4, 7, 300), (5, 9, 900),
        (6, 9, 950),               # dominated at same size
        (7, 2, 40), (8, 1, 40),    # 8 dominated by 7 (same cost, less size)
    ]
    df = spark.createDataFrame(rows, "id long, sz long, cents long")
    got = sorted(
        (r["id"], r["gain"], r["cost_cents"])
        for r in skyline_2d(df, F.col("cents"), "sz", ["id"]).collect()
    )
    assert got == _brute_skyline(rows)


def test_consecutive_paths_respects_session_breaks(spark):
    base = 1_700_000_000_000_000  # us
    m = 60_000_000
    rows = [
        # user 1: A B C within gaps -> one ABC trigram
        (1, 1, base, "A"), (2, 1, base + 5 * m, "B"), (3, 1, base + 10 * m, "C"),
        # user 1: D arrives 40 min later -> BCD spans a break, not counted
        (4, 1, base + 50 * m, "D"),
        # user 2: only two events -> no trigram
        (5, 2, base, "A"), (6, 2, base + m, "B"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).select("event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "event_type")
    got = {
        (r["e0"], r["e1"], r["e2"]): r["n_paths"]
        for r in consecutive_paths(df, gap_minutes=30, length=3).collect()
    }
    assert got == {("A", "B", "C"): 1}


def test_name_variants_block_and_threshold(spark):
    rows = [("cold widget",), ("bold widget",), ("cold bolt",), ("zzzzzzzz widget",)]
    df = spark.createDataFrame(rows * 2, "nm string")  # counts = 2 each
    got = sorted(
        (r["name_a"], r["name_b"], r["dist"], r["n_a"], r["n_b"])
        for r in name_variant_pairs(
            df, "nm", F.split(F.col("name"), " ").getItem(1), max_dist=4
        ).collect()
    )
    # same block + within distance: only (bold widget, cold widget);
    # "cold bolt" is another block, "zzzzzzzz widget" exceeds distance.
    assert got == [("bold widget", "cold widget", 1, 2, 2)]


def test_skyline_plan_has_no_quadratic_join(spark):
    rows = [(i, i % 7, 100 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, sz long, cents long")
    plan = skyline_2d(df, F.col("cents"), "sz", ["id"])._jdf.queryExecution().executedPlan().toString()
    # the join-back must be broadcast (survivors are |distinct gain| rows)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
