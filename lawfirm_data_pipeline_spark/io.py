"""Parquet read helpers for the driver test tables.

Reads are schema-pinned (schemas.py) so column pruning and predicate
pushdown operate on known types, and a drifting input fails loudly instead
of silently changing semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _events_ts_to_timestamp(df: DataFrame) -> DataFrame:
    """ns-long → µs timestamp with exact integer division (`div`), the
    same truncation DuckDB applies reading TIMESTAMP(NANOS)."""
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def rebalance_scan(df: DataFrame) -> DataFrame:
    """Fan a poorly-split scan out to every core before a CPU-bound
    stage.

    Spark parallelizes parquet scans by byte-range splits, but a split
    only does work if a row group starts inside it — and the driver's
    synthetic tables are single-row-group files, so every scan collapses
    to ONE task no matter what ``maxPartitionBytes`` says.  A round-robin
    repartition of the (sub-MB here) raw rows is cheap insurance that
    tokenize/shingle/matmul stages use the whole machine.  At production
    scale inputs arrive as many files/row groups and the probe makes
    this a no-op rather than an extra full shuffle.

    ONLY safe upstream of exact arithmetic (counts, md5, integer-valued
    sums, per-row projections): repartitioning reorders float
    aggregation, which breaks bit-exact oracle parity for
    order-sensitive double sums.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    """Load one driver table.

    The explicit schema keeps the scan's ReadSchema minimal once a
    downstream select prunes columns, and avoids footer-based inference
    differences across scale factors.  ``rebalance=True`` applies
    ``rebalance_scan`` for CPU-bound consumers.
    """
    reader = spark.read
    if name == "events":
        df = _events_ts_to_timestamp(
            reader.schema(schemas.EVENTS_RAW).parquet(table_path(sf_dir, name))
        )
        return rebalance_scan(df) if rebalance else df
    schema = schemas.DRIVER_TABLES.get(name)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(table_path(sf_dir, name))
    return rebalance_scan(df) if rebalance else df


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a streaming source with the logical schema.

    File streaming sources need a directory or glob (not a bare file);
    the trailing ``*`` makes the single-parquet layout streamable.
    """
    return _events_ts_to_timestamp(
        spark.readStream.schema(schemas.EVENTS_RAW).parquet(table_path(sf_dir, "events") + "*")
    )


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    names = names or list(schemas.DRIVER_TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each driver table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
