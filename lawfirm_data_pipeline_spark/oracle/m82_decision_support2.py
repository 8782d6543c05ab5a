"""M82 — round-5 wave 3: TPC-H Q21 shape (correlated EXISTS / NOT
EXISTS over the fact table).

Q21 ("suppliers who kept waiting") is the classic planner stressor the
m38 wave didn't cover: a fact-table self-correlation twice over — an
EXISTS (another supplier in the same order) and a NOT EXISTS (no OTHER
supplier was late).  The driver's lineitem has no commit/receipt
dates, so lateness derives as l_shipdate > o_orderdate + 60 days —
the same correlation structure on the available columns.

Engine plan: the double correlated subquery rewrites to ONE aggregate
over the order's supplier set — count(DISTINCT supplier) and
count(DISTINCT late supplier) per order — then a semi filter; the fact
table is scanned once and shuffled once on l_orderkey (the oracle runs
the literal EXISTS/NOT EXISTS form, so the rewrite is value-gated).
At 100 TB the EXISTS form would re-shuffle lineitem twice; the
aggregate form is the one you'd run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..queries import query


@query(
    "q271_waiting_suppliers",
    """
    WITH li AS (
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM li l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q271_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate rewrite of the double correlated subquery: per order,
    count distinct suppliers and distinct LATE suppliers in one
    combinable groupBy; a late line qualifies iff its order has >= 2
    suppliers and exactly its own supplier late.  One lineitem shuffle
    (on l_orderkey), supplier dim broadcast; the oracle runs the
    literal EXISTS / NOT EXISTS form."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")

    fact = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("late"),
    )
    per_order = fact.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_sup"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_sup"),
    )
    waiting = (
        fact.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_sup") >= 2) & (F.col("n_late_sup") == 1))
    )
    return (
        waiting.join(F.broadcast(sup), waiting["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
