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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table.

    The explicit schema keeps the scan's ReadSchema minimal once a
    downstream select prunes columns, and avoids footer-based inference
    differences across scale factors.
    """
    reader = spark.read
    if name == "events":
        return _events_ts_to_timestamp(
            reader.schema(schemas.EVENTS_RAW).parquet(table_path(sf_dir, name))
        )
    schema = schemas.DRIVER_TABLES.get(name)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(table_path(sf_dir, name))


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
