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
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag,
       l_linestatus,
       sum(l_quantity)                                        AS sum_qty,
       sum(l_extendedprice)                                   AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
       avg(l_quantity)                                        AS avg_qty,
       avg(l_extendedprice)                                   AS avg_price,
       avg(l_discount)                                        AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
