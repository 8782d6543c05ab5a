"""Tests for the m51 Z-order audit: Morton-code bit math against a
Python mirror, and the economics claim itself (Z-order prunes the
2-D box strictly better than the linear layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.profile import morton_code

SF = "/root/testdata/sf0.001"


def _morton_py(x: int, y: int, bits: int = 10) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_python_mirror(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023), (512, 1), (100, 260)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton_code("x", "y").alias("z")).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == _morton_py(x, y), (x, y)


def test_morton_preserves_locality_prefixes(spark):
    # points sharing high bits of BOTH dims share high Morton bits —
    # the property that makes Z-range zones box-prunable
    a = _morton_py(100, 200)
    b = _morton_py(101, 201)   # same 2-D neighborhood
    c = _morton_py(900, 800)   # far corner
    assert (a >> 10) == (b >> 10)
    assert (a >> 10) != (c >> 10)


def test_zorder_audit_consistent(spark):
    from lawfirm_data_pipeline_spark.oracle.m51_zorder import q209_zorder_audit

    out = {r["layout"]: r for r in q209_zorder_audit(spark, SF).collect()}
    assert set(out) == {"zorder", "linear"}
    total = spark.read.parquet(f"{SF}/orders.parquet").count()
    for r in out.values():
        assert 0 <= r["n_pruned"] <= r["n_zones"]
        assert 0 <= r["rows_scanned"] <= total
    # zone-map soundness: every row matching the box survives pruning
    matching = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            (F.col("o_custkey") % 1024).alias("x"),
            (
                F.datediff(
                    F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
                ).cast("long")
                % 1024
            ).alias("y"),
        )
        .filter(
            F.col("x").between(100, 150) & F.col("y").between(200, 260)
        )
        .count()
    )
    assert all(r["rows_scanned"] >= matching for r in out.values())


def test_zorder_prunes_secondary_dimension_linear_cannot(spark):
    # the structural claim: for a predicate on the NON-sort dimension,
    # a linear layout prunes nothing (every zone spans all y) while the
    # Morton layout bounds y per zone and prunes most of them
    from lawfirm_data_pipeline_spark.oracle.m51_zorder import _BITS

    pts = spark.read.parquet(f"{SF}/orders.parquet").select(
        (F.col("o_custkey") % 1024).alias("x"),
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            % 1024
        ).alias("y"),
    )
    keyed = pts.select("x", "y", morton_code("x", "y", _BITS).alias("zkey"))

    def zone_stats(zone_col):
        zm = keyed.groupBy(zone_col.alias("zone")).agg(
            F.min("y").alias("min_y"), F.max("y").alias("max_y")
        )
        total = zm.count()
        pruned = zm.filter((F.col("max_y") < 200) | (F.col("min_y") > 260)).count()
        return total, pruned

    _, lin_pruned = zone_stats(F.shiftright("x", _BITS - 6))
    z_total, z_pruned = zone_stats(F.shiftright("zkey", 2 * _BITS - 6))
    assert lin_pruned == 0
    assert z_pruned * 2 > z_total  # most populated Z-zones skip the y-box
