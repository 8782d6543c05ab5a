"""Flagship query: lineitem pricing summary (TPC-H Q1 shape).

SURVEY.md §7 M0: scan → shipdate filter → groupBy(l_returnflag,
l_linestatus) → 8 aggregates → orderBy.  Exercises parquet pushdown,
partial (map-side) hash aggregation, and sort in a single plan.

Scale notes (100 TB): the groupBy keys have tiny cardinality (≤ 6
groups), so the shuffle after partial aggregation moves only
n_partitions × n_groups rows — this plan is shuffle-light by
construction and survives arbitrary scale-up as long as the scan
parallelizes (it does: maxPartitionBytes-sized parquet splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def pricing_summary(spark: SparkSession, sf_dir: str, cutoff: str = "1998-09-02") -> DataFrame:
    """Money columns are 2dp fixed point, so every aggregate runs in
    EXACT decimal (r10: the fresh-draw 6M-row differential caught the
    former ``sum(double)`` drifting in its last ulp with addend order
    — the q07 class hitting the flagship).  Tight scales keep every
    product exact: price d(12,2) × (1−disc) d(3,2) → d(16,4); × 
    (1+tax) d(3,2) → d(20,6); decimal SUMs are order-independent and
    cast to double ONCE, identically in the DuckDB twin."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(3,2)")
    disc_price = price * (F.lit(1).cast("decimal(3,2)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + tax)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
WITH d AS (SELECT l_returnflag, l_linestatus,
                  CAST(l_quantity      AS DECIMAL(12,2)) AS qty,
                  CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
                  CAST(l_discount      AS DECIMAL(3,2))  AS disc,
                  CAST(l_tax           AS DECIMAL(3,2))  AS tax
           FROM lineitem
           WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
SELECT l_returnflag,
       l_linestatus,
       -- decimal -> double goes through VARCHAR: DuckDB's direct
       -- decimal cast is off by one ulp once the unscaled value
       -- passes 2^53 (observed on sum_charge's scale-6 sums at sf1:
       -- ...941593 vs the correctly rounded ...94159 Spark produces);
       -- string -> double is correctly rounded in both engines, so
       -- both sides convert the identical exact decimal identically.
       CAST(CAST(sum(qty)   AS VARCHAR) AS DOUBLE)            AS sum_qty,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE)            AS sum_base_price,
       CAST(CAST(sum(price * (CAST(1 AS DECIMAL(3,2)) - disc))
                 AS VARCHAR) AS DOUBLE)                       AS sum_disc_price,
       CAST(CAST(sum(price * (CAST(1 AS DECIMAL(3,2)) - disc)
                       * (CAST(1 AS DECIMAL(3,2)) + tax))
                 AS VARCHAR) AS DOUBLE)                       AS sum_charge,
       CAST(CAST(sum(qty)   AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
       CAST(CAST(sum(price) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
       CAST(CAST(sum(disc)  AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
       count(*)                                               AS count_order
FROM d
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
