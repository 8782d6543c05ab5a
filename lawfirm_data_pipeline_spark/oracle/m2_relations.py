"""M2 — join & relation-semantics oracle queries (SURVEY.md §2.A3-A4, §2.B).

The reference's relation shapes mapped onto the driver's star schema:
customer⋈nation⋈region stands in for 1:1 ``include`` hydration,
customer/orders for the ``some``/``none`` list filters (the CRM-sync
anti-join poll, syncCrm.ts:60-69), orders→lineitem→part for m:n bridge
hydration (company→bridge→firm_service).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..queries import query
from ..operators.relations import (
    hydrate_many_to_many,
    hydrate_one_to_one,
    relation_every,
    relation_none,
    relation_some,
)


# -- q09: 1:1/N:1 hydration join chain with broadcast dims (A3/A4 include)
@query(
    "q09_hydration_join",
    """
    SELECT c_custkey, c_name, c_acctbal, n_name, r_name
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey
    LEFT JOIN region ON n_regionkey = r_regionkey
    WHERE c_acctbal < 0
    """,
)
def q09_hydration_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    step1 = hydrate_one_to_one(customer, nation, "c_nationkey", "n_nationkey", broadcast_child=True)
    step2 = hydrate_one_to_one(step1, region, "n_regionkey", "r_regionkey", broadcast_child=True)
    return step2.select("c_custkey", "c_name", "c_acctbal", "n_name", "r_name")


# -- q10: relation `some` ≡ EXISTS ≡ left semi (FirmService.ts:272-275)
@query(
    "q10_relation_some",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q10_relation_some(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return relation_some(
        customer, orders, "c_custkey", "o_custkey", F.col("o_totalprice") > 300000
    ).select("c_custkey", "c_name")


# -- q11: relation `none` / 1:1-is-null ≡ NOT EXISTS ≡ left anti —
#    the CRM-sync poll shape (syncCrm.ts:60-69) with the not-null email
#    filter mapped to a scalar predicate.
@query(
    "q11_relation_none_anti",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      AND c_acctbal IS NOT NULL
    """,
)
def q11_relation_none_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        relation_none(customer, orders, "c_custkey", "o_custkey", F.col("o_totalprice") > 450000)
        .filter(F.col("c_acctbal").isNotNull())
        .select("c_custkey", "c_name", "c_acctbal")
    )


# -- q12: relation `every` ≡ anti join against violating children;
#    zero-children parents pass (Prisma semantics).
@query(
    "q12_relation_every",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_orderkey % 331 = 0
                        AND NOT (l_quantity <= 45))
    """,
)
def q12_relation_every(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    # child set restricted so both pass and fail branches are populated
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 331 == 0)
    return relation_every(
        supplier, lineitem, "s_suppkey", "l_suppkey", F.col("l_quantity") <= 45
    ).select("s_suppkey", "s_name")


# -- q13: m:n hydration through a bridge with deterministic array order
#    (company→_CompanyToFirmService→firm_service ⇒ orders→lineitem→part).
#    Array flattened to a joined string so the value-hash is collation-free.
@query(
    "q13_mn_hydration",
    """
    SELECT o_orderkey,
           coalesce(string_agg(DISTINCT p_brand, ',' ORDER BY p_brand), '') AS brands
    FROM orders
    LEFT JOIN lineitem ON l_orderkey = o_orderkey
    LEFT JOIN part ON p_partkey = l_partkey
    WHERE o_orderkey % 7 = 0
    GROUP BY o_orderkey
    """,
)
def q13_mn_hydration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    hydrated = hydrate_many_to_many(
        orders,
        bridge=lineitem,
        dim=part,
        fact_key="o_orderkey",
        bridge_fact_fk="l_orderkey",
        bridge_dim_fk="l_partkey",
        dim_key="p_partkey",
        dim_value="p_brand",
        array_col="brands_arr",
    )
    return hydrated.select(
        "o_orderkey",
        F.array_join(F.array_distinct("brands_arr"), ",").alias("brands"),
    )


# -- q14: top-k per group via window rank (charter §2.C window functions)
@query(
    "q14_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
)
def q14_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


# -- q14b: running / lag window aggregates (ordered accumulation is
#    sequential within the frame on both engines, so sums match exactly)
@query(
    "q14b_running_window",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(sum(l_quantity) OVER w AS DOUBLE)  AS running_qty,
           lag(l_quantity) OVER w                  AS prev_qty,
           rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS qty_rank
    FROM lineitem
    WHERE l_suppkey <= 3 AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q14b_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_suppkey") <= 3)
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("l_suppkey").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(w).alias("running_qty"),
        F.lag("l_quantity").over(
            Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        ).alias("prev_qty"),
        F.rank().over(w_rank).alias("qty_rank"),
    )
