"""Table profiling: the engine's ANALYZE / data-quality summary.

One aggregation pass computes every column's stats (count/null-rate/
distinct/min/max), then unpivots to long form — profiling a 100 TB
table costs one scan + one tiny shuffle, not one scan per column.
Exact distinct counts shuffle per-column hashes; at extreme widths
switch the same shape to approx_count_distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) with min/max rendered as strings so mixed
    column types share one schema."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def zone_map(df, part_expr, value_col, part_name: str = "part"):
    """Per-partition (min, max, count) zone map over an exact-integer
    measure — the statistics a lakehouse keeps per file/row-group for
    data skipping.  One map-side-combinable aggregate; output
    cardinality = number of partitions."""
    return df.groupBy(part_expr.alias(part_name)).agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def zone_map_prune(zm, lo_bound: int, hi_bound: int):
    """Classify each zone against a BETWEEN predicate: 'skip' (no
    overlap — the scan never opens it), 'full' (entirely inside — rows
    qualify without evaluating the predicate), 'partial' (must scan and
    filter).  The skip ratio is the number a 100 TB layout audit
    optimizes: at scale this table IS the pruning decision the reader
    makes from footer stats, computed here explicitly so it can be
    asserted on."""
    return zm.select(
        "*",
        F.when((F.col("hi") < lo_bound) | (F.col("lo") > hi_bound), F.lit("skip"))
        .when((F.col("lo") >= lo_bound) & (F.col("hi") <= hi_bound), F.lit("full"))
        .otherwise(F.lit("partial"))
        .alias("decision"),
    )


def table_checksum(df, cols: list[str], label: str):
    """Order-independent content checksum: one row
    (tbl, n_rows, checksum) where checksum = SUM over rows of
    (first-8-hex-digits of the null-safe row md5) mod 1e9+7.

    The replication/snapshot-equality check: integer addition commutes,
    so any partitioning/ordering of the same multiset of rows produces
    the same value, and two engines agree bit-for-bit (md5 and the mod
    are exact).  Per-row residues are < 1e9, so 64-bit sums hold to
    ~9e9 rows per table; the map-side-combined sum ships one pair per
    partition."""
    from .cdc import row_hash

    v = F.conv(F.substring(row_hash(cols), 1, 8), 16, 10).cast("long") % 1000000007
    return df.select(v.alias("v")).agg(
        F.lit(label).alias("tbl"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("v").cast("long").alias("checksum"),
    ).select("tbl", "n_rows", "checksum")


def morton_code(x: Column | str, y: Column | str, bits: int = 10) -> Column:
    """Morton (Z-order) interleave of two ``bits``-bit non-negative
    ints: bit i of x lands at position 2i, bit i of y at 2i+1.

    The space-filling-curve sort key that makes ONE physical order
    serve range predicates on BOTH dimensions — the lakehouse
    multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE
    ZORDER).  Pure bit arithmetic, fully inside codegen; q209 measures
    what it buys against a one-dimensional sort via zone-map pruning.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out
