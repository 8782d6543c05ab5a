"""Crafted edge tests for thin-coverage r7-window kernels (q273, q285,
q286) — the queries the rotation is about to hand the driver whose only
gate so far was the oracle differential on generator-shaped data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_q286_trim_edges(spark, monkeypatch):
    """n < 10 means floor(n*0.1) = 0 — NO trim (plain mean), and at
    n = 10 exactly one value drops from each tail; ties must trim by
    VALUE order, not arrival order."""
    import lawfirm_data_pipeline_spark.oracle.m90_groupedagg_bloom as m

    # grp 0: n=3 (no trim). grp 1: n=10 with tied extremes (trim one 0
    # and one 100, keep the tied duplicates). user_id%3==0 and %50
    # are the query's own derivations — feed user_id/value directly.
    rows = []
    for c in (300, 600, 900):                      # grp 0 <- user 0
        rows.append((0, c / 100.0))
    g1 = [0, 0, 10, 20, 30, 40, 50, 60, 100, 100]  # grp 1 <- user 51
    for c in g1:
        rows.append((51, c / 100.0))
    df = spark.createDataFrame(
        [(u, v) for u, v in rows], "user_id long, value double"
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = {
        r["grp"]: (r["n_kept"], r["tmean"])
        for r in m.q286_grouped_agg_trimmed_mean(spark, "unused").collect()
    }
    assert out[0] == (3, (300 + 600 + 900) / 3)
    kept = sorted(g1)[1:-1]
    assert out[51 % 50] == (8, sum(kept) / 8)


def test_q285_pseudonym_mapping_is_referentially_consistent(spark):
    """md5('s3cr3t:' || id) must map the SAME id to the SAME pseudonym
    in both tables (the join survives) and distinct ids to distinct
    pseudonyms (no collision at test scale)."""
    from lawfirm_data_pipeline_spark.oracle.m89_dpp_pseudonym import pseudonymize

    a = pseudonymize(
        spark.range(0, 200).select(F.col("id").alias("pid")), "pid"
    )
    b = pseudonymize(
        spark.range(100, 300).select(F.col("id").alias("pid")), "pid"
    )
    joined = a.join(b, "pid")
    assert joined.count() == 100  # exactly the id overlap survives
    assert a.select("pid").distinct().count() == 200  # injective


def test_q273_entropy_and_fd_known_values(spark, monkeypatch):
    """Uniform k-way column ⇒ entropy ln(k); a planted FD violation
    must count exactly the violating LHS groups."""
    import lawfirm_data_pipeline_spark.oracle.m84_governance2 as m

    # orders: status uniform over 2 values, priority uniform over 4;
    # priority->status violated for exactly one priority group
    orders = spark.createDataFrame(
        [
            (1, 10, "A", "P1"), (2, 10, "B", "P1"),   # P1 -> {A,B}: violates
            (3, 20, "A", "P2"), (4, 20, "A", "P2"),
            (5, 30, "B", "P3"), (6, 30, "B", "P3"),
            (7, 40, "A", "P4"), (8, 40, "B", "P4"),   # P4 -> {A,B}: violates
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "SEG1"), (20, "SEG1"), (30, "SEG2"), (40, "SEG2")],
        "c_custkey long, c_mktsegment string",
    )
    tables = {"orders": orders, "customer": customer}
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: tables[n])
    out = {r["item"]: r for r in m.q273_entropy_fd_profile(spark, "unused").collect()}

    # o_orderstatus: 4 A / 4 B -> ln 2; o_orderpriority: 4 x 2 -> ln 4
    assert out["o_orderstatus"]["n_distinct"] == 2
    assert math.isclose(out["o_orderstatus"]["entropy"], math.log(2), abs_tol=1e-6)
    assert math.isclose(out["o_orderpriority"]["entropy"], math.log(4), abs_tol=1e-6)
    # custkey -> segment holds (each custkey one segment)
    assert out["o_custkey->c_mktsegment"]["n_violating"] == 0
    # priority -> status: P1 and P4 violate
    assert out["o_orderpriority->o_orderstatus"]["n_violating"] == 2
    assert out["o_orderpriority->o_orderstatus"]["n_distinct"] == 4
