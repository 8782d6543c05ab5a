"""M1 — predicate / query-layer oracle queries (SURVEY.md §2.B).

Each query is built through the ``Model`` API so the Prisma-shaped layer
itself is what's differentially tested, not hand-rolled DataFrame code.
The tri-state queue semantics (reference schema.prisma:23,40,83 —
``Boolean?`` where NULL means pending) are exercised on a status column
derived deterministically from ``orders`` so the null path is non-vacuous
on the driver tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..query import Model
from ..queries import query


# -- q02: scalar comparators + boolean composition (commonInputTypes.ts:18-24)
@query(
    "q02_filter_predicates",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_totalprice >= 50000 AND o_totalprice < 300000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND NOT (o_orderstatus = 'P')
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Model(load_table(spark, sf_dir, "orders"), "orders")
    return orders.find_many(
        where={
            "o_totalprice": {"gte": 50000, "lt": 300000},
            "o_orderpriority": {"in": ["1-URGENT", "2-HIGH"]},
            "o_orderdate": {"gte": "1996-01-01 00:00:00"},
            "NOT": {"o_orderstatus": "P"},
        },
        select=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )


# -- q03: string predicates incl. case-insensitive mode
#    (commonInputTypes.ts:25-28; contains/startsWith/endsWith + QueryMode)
@query(
    "q03_string_predicates",
    """
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_name LIKE '%gear%'
       OR (lower(p_type) LIKE lower('Econ%'))
       OR (p_brand LIKE '%#2' AND p_name NOT LIKE 'small%')
    """,
)
def q03_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = Model(load_table(spark, sf_dir, "part"), "part")
    return part.find_many(
        where={
            "OR": [
                {"p_name": {"contains": "gear"}},
                {"p_type": {"startsWith": "Econ", "mode": "insensitive"}},
                {"p_brand": {"endsWith": "#2"}, "p_name": {"not": {"startsWith": "small"}}},
            ]
        },
        select=["p_partkey", "p_name", "p_brand", "p_type"],
    )


# -- q04: findMany pagination — orderBy + skip/take (Company.ts:1290-1321)
@query(
    "q04_pagination",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    OFFSET 10 LIMIT 20
    """,
)
def q04_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = Model(load_table(spark, sf_dir, "customer"), "customer")
    return customer.find_many(
        order_by=[{"c_acctbal": "desc"}, {"c_custkey": "asc"}],
        skip=10,
        take=20,
        select=["c_custkey", "c_name", "c_acctbal"],
    )


# -- q04b: cursor (keyset) pagination — Prisma `cursor` arg (Company.ts:1302)
@query(
    "q04b_cursor_pagination",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey >= 100
    ORDER BY c_custkey ASC
    LIMIT 15
    """,
)
def q04b_cursor_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = Model(load_table(spark, sf_dir, "customer"), "customer")
    return customer.find_many(
        cursor={"c_custkey": 100},
        order_by=[{"c_custkey": "asc"}],
        take=15,
        select=["c_custkey", "c_name"],
    )


# -- q05: distinct on field list (Prisma `distinct`, Company.ts:1320)
@query(
    "q05_distinct",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q05_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = Model(load_table(spark, sf_dir, "customer"), "customer")
    return customer.find_many(
        distinct=["c_mktsegment", "c_nationkey"],
        select=["c_mktsegment", "c_nationkey"],
    )


# -- q06: aggregate — _count/_min/_max/_sum/_avg (Company.ts:1091,108-155)
@query(
    "q06_aggregate",
    """
    SELECT count(*)                       AS count_all,
           count(l_quantity)              AS count_l_quantity,
           min(l_shipdate)                AS min_l_shipdate,
           min(l_returnflag)              AS min_l_returnflag,
           max(l_shipdate)                AS max_l_shipdate,
           max(l_returnflag)              AS max_l_returnflag,
           sum(l_quantity)                AS sum_l_quantity,
           avg(l_quantity)                AS avg_l_quantity
    FROM lineitem
    WHERE l_discount > 0.02
    """,
)
def q06_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Model(load_table(spark, sf_dir, "lineitem"), "lineitem")
    return li.aggregate(
        where={"l_discount": {"gt": 0.02}},
        _count={"_all": True, "l_quantity": True},
        _min={"l_shipdate": True, "l_returnflag": True},
        _max={"l_shipdate": True, "l_returnflag": True},
        _sum={"l_quantity": True},
        _avg={"l_quantity": True},
    )


# -- q07: groupBy + HAVING on aggregates + order-by-aggregate + limit
#    (Company.ts:1111,168-178,278-292)
@query(
    "q07_groupby_having",
    """
    SELECT o_orderpriority, o_orderstatus,
           count(*)                         AS count_all,
           -- exact micro-fixed-point sum: sum(double) drifts in its
           -- last ulp with addend order once the group holds
           -- ~sf3-many rows.  The engine's _sum_exact takes this
           -- decimal branch only for LOSSLESS groups (r10 ADVICE #1
           -- added a plain-SUM fallback for NaN/Inf/sub-micro/1e24+
           -- floats); o_totalprice is 2dp money by construction, so
           -- the unconditional snap here mirrors the branch the
           -- engine actually takes.  If a corpus ever put
           -- non-fixed-point doubles in o_totalprice this oracle
           -- would need the same conditional.
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                                            AS sum_o_totalprice,
           max(o_orderdate)                 AS max_o_orderdate
    FROM orders
    WHERE o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
    GROUP BY o_orderpriority, o_orderstatus
    HAVING count(*) > 100
    ORDER BY sum_o_totalprice DESC, o_orderpriority, o_orderstatus
    LIMIT 8
    """,
)
def q07_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Model(load_table(spark, sf_dir, "orders"), "orders")
    return orders.group_by(
        by=["o_orderpriority", "o_orderstatus"],
        where={"o_orderdate": {"lt": "2001-01-01 00:00:00"}},
        having={"count_all": {"gt": 100}},
        order_by=[
            {"sum_o_totalprice": "desc"},
            {"o_orderpriority": "asc"},
            {"o_orderstatus": "asc"},
        ],
        take=8,
        _count={"_all": True},
        _sum={"o_totalprice": True},
        _max={"o_orderdate": True},
    )


# -- q08: tri-state Boolean? queue semantics — NULL=pending filter is
#    null-AWARE equals (schema.prisma:23; runner/locator.ts:61-67;
#    commonInputTypes.ts:33,48). Status derived deterministically so the
#    driver tables exercise all three states.
_TRI = """CASE WHEN o_orderkey % 10 < 5 THEN NULL
               WHEN o_orderkey % 10 < 8 THEN true
               ELSE false END"""


@query(
    "q08_tristate_queue",
    f"""
    WITH queue AS (SELECT *, {_TRI} AS status FROM orders)
    SELECT o_orderpriority,
           count(*) AS count_all
    FROM queue
    WHERE status IS NULL AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def q08_tristate_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn("status", F.expr(_TRI))
    return Model(orders, "queue").group_by(
        by=["o_orderpriority"],
        where={"status": None, "o_orderstatus": {"equals": "O"}},
        _count={"_all": True},
    )


# -- q08b: `not: null` ≡ IS NOT NULL + not-equals three-valued logic
#    (runner/syncCrm.ts:63 `emailAddress: {not: null}`)
@query(
    "q08b_not_null_semantics",
    f"""
    WITH queue AS (SELECT *, {_TRI} AS status FROM orders)
    SELECT count(*) AS count_all,
           count(CASE WHEN status = true THEN 1 END) AS count_done
    FROM queue
    WHERE status IS NOT NULL
    """,
)
def q08b_not_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn("status", F.expr(_TRI))
    q = Model(orders, "queue")
    filtered = q.find_many(where={"status": {"not": None}})
    return filtered.agg(
        F.count(F.lit(1)).alias("count_all"),
        F.count(F.when(F.col("status") == True, 1)).alias("count_done"),  # noqa: E712
    )
