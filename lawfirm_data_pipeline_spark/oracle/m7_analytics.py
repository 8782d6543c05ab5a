"""M7 — analytics extensions beyond the reference's query surface.

The reference has no window functions, grouping sets, set ops, or
statistical aggregates anywhere (SURVEY.md §2.C "gaps"); a standalone
analytics engine needs them, so they land here as first-class,
oracle-checked capabilities.

Float discipline: every aggregate that feeds a hash comparison is either
(a) a sum of exactly-representable integers (quantities are integral
doubles ≤ 50; prices are 2-decimal → ``round(x*100)`` cents as BIGINT),
or (b) a deterministic scalar expression over such exact sums (the moment
formulas in q45).  That keeps Spark and DuckDB bit-identical regardless
of accumulation order — the engines are free to parallelize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.text import tfidf_topk
from ..queries import query
from lawfirm_data_pipeline_spark.functions.rounding import bfround

_CENTS = "CAST(CASE WHEN isnan(CAST((o_totalprice * 100) AS DOUBLE)) OR abs(CAST((o_totalprice * 100) AS DOUBLE)) >= 9007199254740992.0 THEN CAST((o_totalprice * 100) AS DOUBLE) ELSE floor(CAST((o_totalprice * 100) AS DOUBLE) * 1e0 + 0.5) / 1e0 END AS BIGINT)"


# -- q41: ROLLUP — subtotal hierarchy (nation → nation+year → grand total)
@query(
    "q41_rollup",
    f"""
    WITH base AS (
        SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_CENTS} AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT coalesce(n_name, 'ALL') AS n_name,
           coalesce(o_year, -1) AS o_year,
           GROUPING(n_name, o_year) AS gid,
           count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM base
    GROUP BY ROLLUP (n_name, o_year)
    """,
)
def q41_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ``rollup``; broadcast dims keep the only
    wide stage the final aggregation.  ``grouping_id`` disambiguates
    rollup NULLs from data NULLs (both engines emit the same bit mask)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("int").alias("o_year"),
            bfround(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return base.rollup("n_name", "o_year").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
    ).select(
        F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
        F.coalesce("o_year", F.lit(-1)).alias("o_year"),
        "gid",
        "n_orders",
        "sum_cents",
    )


# -- q42: CUBE over the classic returnflag × linestatus grid
@query(
    "q42_cube",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n_items,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q42_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").cast("long").alias("sum_qty"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
        "gid",
        "n_items",
        "sum_qty",
    )


# -- q43: GROUPING SETS — two independent groupings in one pass
@query(
    "q43_grouping_sets",
    f"""
    SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
           coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
           count(*) AS n_orders, CAST(sum({_CENTS}) AS BIGINT) AS sum_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
)
def q43_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
               count(*) AS n_orders,
               sum(CAST(CASE WHEN isnan(CAST((o_totalprice * 100) AS DOUBLE)) OR abs(CAST((o_totalprice * 100) AS DOUBLE)) >= 9007199254740992.0 THEN CAST((o_totalprice * 100) AS DOUBLE) ELSE floor(CAST((o_totalprice * 100) AS DOUBLE) * 1e0 + 0.5) / 1e0 END AS BIGINT)) AS sum_cents
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


# -- q44: set operations — INTERSECT / EXCEPT as queries
@query(
    "q44_set_ops",
    """
    WITH urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         high   AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM urgent INTERSECT SELECT * FROM high)
    UNION ALL
    SELECT 'urgent_only' AS tag, o_custkey FROM (SELECT * FROM urgent EXCEPT SELECT * FROM high)
    """,
)
def q44_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT compile to semi/anti joins after aggregate-dedup.
    Each branch consumes both distinct key-sets, and exchange reuse does
    NOT dedupe the repeated subtrees (round-6 census: 4 orders scans +
    4 distinct shuffles) — cache the two custkey-sized sets instead."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey").distinct().cache()
    )
    high = (
        orders.filter(F.col("o_orderpriority") == "2-HIGH")
        .select("o_custkey").distinct().cache()
    )
    both = urgent.intersect(high).select(F.lit("both").alias("tag"), "o_custkey")
    only = urgent.exceptAll(high).select(F.lit("urgent_only").alias("tag"), "o_custkey")
    return both.unionByName(only)


# -- q45: moment statistics from exact integer sums (order-independent)
@query(
    "q45_moment_stats",
    """
    WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(l_quantity) AS BIGINT) AS sq,
               CAST(sum(l_quantity * l_quantity) AS BIGINT) AS sqq,
               CAST(sum(l_linenumber) AS BIGINT) AS sl,
               CAST(sum(l_linenumber * l_linenumber) AS BIGINT) AS sll,
               CAST(sum(l_quantity * l_linenumber) AS BIGINT) AS sql_
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CASE WHEN isnan(CAST((CAST(sq AS DOUBLE) / n) AS DOUBLE)) OR abs(CAST((CAST(sq AS DOUBLE) / n) AS DOUBLE)) >= 9007199254.740992 THEN CAST((CAST(sq AS DOUBLE) / n) AS DOUBLE) ELSE floor(CAST((CAST(sq AS DOUBLE) / n) AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS mean_qty,
           CASE WHEN isnan(CAST((sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n) / (n - 1))) AS DOUBLE)) OR abs(CAST((sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n) / (n - 1))) AS DOUBLE)) >= 9007199254.740992 THEN CAST((sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n) / (n - 1))) AS DOUBLE) ELSE floor(CAST((sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n) / (n - 1))) AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS stddev_qty,
           CASE WHEN isnan(CAST(((CAST(sql_ AS DOUBLE) - CAST(sq AS DOUBLE) * sl / n)
                 / sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n)
                        * (CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * sl / n))) AS DOUBLE)) OR abs(CAST(((CAST(sql_ AS DOUBLE) - CAST(sq AS DOUBLE) * sl / n)
                 / sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n)
                        * (CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * sl / n))) AS DOUBLE)) >= 9007199254.740992 THEN CAST(((CAST(sql_ AS DOUBLE) - CAST(sq AS DOUBLE) * sl / n)
                 / sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n)
                        * (CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * sl / n))) AS DOUBLE) ELSE floor(CAST(((CAST(sql_ AS DOUBLE) - CAST(sq AS DOUBLE) * sl / n)
                 / sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n)
                        * (CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * sl / n))) AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS corr_qty_line
    FROM s
    """,
)
def q45_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/corr computed from exact integer power sums rather than the
    engines' native accumulators (Welford vs naive would drift in the last
    bits and break the hash gate); one aggregation pass either way."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("long").alias("sq"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).cast("long").alias("sqq"),
        F.sum("l_linenumber").cast("long").alias("sl"),
        F.sum(F.col("l_linenumber") * F.col("l_linenumber")).cast("long").alias("sll"),
        F.sum(F.col("l_quantity") * F.col("l_linenumber")).cast("long").alias("sql_"),
    )
    n, sq, sqq = F.col("n"), F.col("sq").cast("double"), F.col("sqq").cast("double")
    sl, sll, sql_ = F.col("sl").cast("double"), F.col("sll").cast("double"), F.col("sql_").cast("double")
    var_q = sqq - sq * F.col("sq") / n
    var_l = sll - sl * F.col("sl") / n
    return s.select(
        "l_returnflag",
        "n",
        bfround(sq / n, 6).alias("mean_qty"),
        bfround(F.sqrt(var_q / (n - 1)), 6).alias("stddev_qty"),
        bfround((sql_ - sq * F.col("sl") / n) / F.sqrt(var_q * var_l), 6).alias("corr_qty_line"),
    )


# -- q46: TF-IDF top-terms (corpus-level text analytics)
_LTOKS = "list_filter(str_split_regex(trim(lower(text)), '\\s+'), t -> t != '')"


@query(
    "q46_tfidf_topk",
    f"""
    WITH docs AS (SELECT doc_id, {_LTOKS} AS toks FROM documents WHERE doc_id < 200),
         tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
         tc AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY 1),
         dfc AS (SELECT term, count(*) AS dfreq FROM tc GROUP BY 1),
         nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
         scored AS (
            SELECT tc.doc_id, tc.term,
                   CASE WHEN isnan(CAST(((CAST(cnt AS DOUBLE) / dlen) * ln(CAST(n_docs AS DOUBLE) / dfreq)) AS DOUBLE)) OR abs(CAST(((CAST(cnt AS DOUBLE) / dlen) * ln(CAST(n_docs AS DOUBLE) / dfreq)) AS DOUBLE)) >= 9007199254.740992 THEN CAST(((CAST(cnt AS DOUBLE) / dlen) * ln(CAST(n_docs AS DOUBLE) / dfreq)) AS DOUBLE) ELSE floor(CAST(((CAST(cnt AS DOUBLE) / dlen) * ln(CAST(n_docs AS DOUBLE) / dfreq)) AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS tfidf
            FROM tc JOIN dl USING (doc_id) JOIN dfc USING (term) CROSS JOIN nd
         ),
         ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term) AS rank
            FROM scored
         )
    SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
    """,
)
def q46_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return tfidf_topk(docs, k=3)


# -- q47: pivot (conditional aggregation grid)
@query(
    "q47_pivot",
    """
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q47_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pivot`` with an explicit value list — no extra distinct-values
    job, single aggregation pass (same plan as the conditional-sum SQL)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


# -- q48: sequence analytics — lag / lead / ntile over per-customer orders
@query(
    "q48_lead_lag",
    """
    WITH seq AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               lag(o_orderdate) OVER w AS prev_dt,
               lead(o_orderdate) OVER w AS next_dt,
               ntile(4) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate NULLS FIRST, o_orderkey)
                 AS quartile
        FROM orders
        -- NULLS FIRST mirrors Spark's ASC default; DuckDB's
        -- default_null_order is nulls_last even ASC (r12 nulls axis)
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    )
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', prev_dt::DATE, o_orderdate::DATE) AS INT) AS days_since_prev,
           CAST(date_diff('day', o_orderdate::DATE, next_dt::DATE) AS INT) AS days_to_next,
           quartile
    FROM seq
    """,
)
def q48_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gaps per customer: one shuffle on o_custkey serves all
    three window functions (same partitioning + ordering)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lag("o_orderdate").over(w).cast("date")).alias("days_since_prev"),
        F.datediff(F.lead("o_orderdate").over(w).cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_next"),
        F.ntile(4).over(w).alias("quartile"),
    )


# -- q49: exact interpolated percentiles (same operands → same doubles)
@query(
    "q49_percentiles",
    """
    SELECT l_returnflag,
           CASE WHEN isnan(CAST((quantile_cont(l_quantity, 0.5)) AS DOUBLE)) OR abs(CAST((quantile_cont(l_quantity, 0.5)) AS DOUBLE)) >= 9007199254.740992 THEN CAST((quantile_cont(l_quantity, 0.5)) AS DOUBLE) ELSE floor(CAST((quantile_cont(l_quantity, 0.5)) AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS p50_qty,
           CASE WHEN isnan(CAST((quantile_cont(l_quantity, 0.9)) AS DOUBLE)) OR abs(CAST((quantile_cont(l_quantity, 0.9)) AS DOUBLE)) >= 9007199254.740992 THEN CAST((quantile_cont(l_quantity, 0.9)) AS DOUBLE) ELSE floor(CAST((quantile_cont(l_quantity, 0.9)) AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q49_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``): integral quantities make the interpolation
    arithmetic identical on both engines.  The approximate scale path
    (``approx_percentile``/t-digest) is benchmarked in tests, not here,
    because sketches differ across engines by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        bfround(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        bfround(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
    )


# -- q50: approximate distinct-count with a value-level oracle gate
@query(
    "q50_approx_distinct",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS exact_custs,
           true AS within_tol
    FROM orders GROUP BY o_orderpriority
    """,
)
def q50_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate count-distinct per order priority.

    Sketch values differ across engines by design, so the sketch itself
    can't be hash-compared; instead the query emits the EXACT distinct
    count (hash-comparable) plus a Spark-side tolerance verdict
    ``within_tol = |approx-exact|/exact <= 5%`` that the oracle pins to
    ``true`` — a value-level gate on the sketch's accuracy, not just a
    row count (r2 VERDICT item #7)."""
    orders = load_table(spark, sf_dir, "orders")
    # pre-distinct once, then both aggregates are plain counts over the
    # distinct pairs — mixing countDistinct with a non-distinct agg in
    # one groupBy makes Catalyst Expand-duplicate every input row
    pairs = orders.select("o_orderpriority", "o_custkey").distinct()
    agg = pairs.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
        F.count(F.lit(1)).alias("exact_custs"),
    )
    return agg.select(
        "o_orderpriority",
        "exact_custs",
        (
            F.abs(F.col("approx_custs") - F.col("exact_custs"))
            / F.col("exact_custs")
            <= 0.05
        ).alias("within_tol"),
    )
