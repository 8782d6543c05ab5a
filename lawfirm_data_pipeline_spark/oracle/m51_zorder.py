"""M51 — Z-order (Morton) clustering economics (round 3 continuation).

q209 quantifies what multi-dimensional clustering buys: the same
orders land in 64 zones under (a) a one-dimensional customer-sorted
layout and (b) a Morton-interleaved (customer, day) layout; a 2-D box
predicate then prunes zones by their min/max stats.  The linear layout
can only prune on its sort dimension — the Z-order layout prunes on
both, and the audit reports zones-skipped and rows-scanned for each so
the layout decision is a measured number, not folklore
(operators/profile.morton_code + zone_map; complements q159's
delta-encoding sort-key economics and q138's zone-map prune classes).

Registered after m50 — outside round 3's 50-query window (round-4
rotation note in ``oracle/__init__.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.profile import morton_code
from ..queries import query

_BITS = 10
# 2-D box predicate under audit (x = custkey mod 1024, y = day mod 1024)
_X_LO, _X_HI = 100, 150
_Y_LO, _Y_HI = 200, 260


def _morton_sql(x: str, y: str, bits: int = _BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# -- q209: Z-order vs linear layout, zone-prune audit
@query(
    "q209_zorder_audit",
    f"""
    WITH pts AS (SELECT o_custkey % 1024 AS x,
                        ((CAST(date_diff('day', DATE '1995-01-01',
                                         CAST(o_orderdate AS DATE)) AS BIGINT)
                          % 1024) + 1024) % 1024 AS y
                 FROM orders),
         keyed AS (SELECT x, y,
                          CAST(({_morton_sql('x', 'y')}) AS BIGINT) AS zkey
                   FROM pts),
         zones AS (
           SELECT 'zorder' AS layout, zkey >> {2 * _BITS - 6} AS zone, x, y
           FROM keyed
           UNION ALL
           SELECT 'linear', x >> {_BITS - 6}, x, y FROM keyed),
         zm AS (SELECT layout, zone,
                       CAST(count(*) AS BIGINT) AS n_rows,
                       min(x) AS min_x, max(x) AS max_x,
                       min(y) AS min_y, max(y) AS max_y
                FROM zones GROUP BY 1, 2),
         cls AS (SELECT layout, n_rows,
                        (max_x < {_X_LO} OR min_x > {_X_HI}
                         OR max_y < {_Y_LO} OR min_y > {_Y_HI}) AS prunable
                 FROM zm)
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_zones,
           CAST(sum(CASE WHEN prunable THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned,
           CAST(sum(CASE WHEN prunable THEN 0 ELSE n_rows END) AS BIGINT)
             AS rows_scanned
    FROM cls GROUP BY 1
    """,
)
def q209_zorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64 zones per layout (top-6 key bits — value-space ranges, the
    shape a range-partitioned write produces); zone min/max on both
    dims; a zone is pruned iff its box misses the predicate box.  The
    whole audit is two groupBys over the scan — no data is actually
    rewritten, which is the point: measure the layout BEFORE paying
    for the re-cluster."""
    pts = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 1024).alias("x"),
        # pmod, not %: dates before the 1995-01-01 epoch would go
        # negative under arithmetic remainder and quietly lose Morton
        # locality (r3 ADVICE); both engines use the positive residue
        F.pmod(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).cast("long"),
            F.lit(1024),
        ).alias("y"),
    )
    keyed = pts.select(
        "x", "y", morton_code("x", "y", _BITS).cast("long").alias("zkey")
    )
    zorder = keyed.select(
        F.lit("zorder").alias("layout"),
        F.shiftright("zkey", 2 * _BITS - 6).alias("zone"),
        "x",
        "y",
    )
    linear = keyed.select(
        F.lit("linear").alias("layout"),
        F.shiftright("x", _BITS - 6).alias("zone"),
        "x",
        "y",
    )
    zm = (
        zorder.unionByName(linear)
        .groupBy("layout", "zone")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )
    prunable = (
        (F.col("max_x") < _X_LO)
        | (F.col("min_x") > _X_HI)
        | (F.col("max_y") < _Y_LO)
        | (F.col("min_y") > _Y_HI)
    )
    return (
        zm.select("layout", "n_rows", prunable.alias("prunable"))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_zones"),
            F.sum(F.col("prunable").cast("int")).cast("long").alias("n_pruned"),
            F.sum(F.when(F.col("prunable"), 0).otherwise(F.col("n_rows")))
            .cast("long")
            .alias("rows_scanned"),
        )
    )
