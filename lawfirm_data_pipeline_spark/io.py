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


# path → (parquet ts unit, tz-aware?) — footer metadata is immutable for the
# driver's read-only testdata, so one sniff per path per process.
_EVENTS_TS_CACHE: dict[str, tuple[str, bool]] = {}
# paths whose loaded ts range already passed the year sanity probe
_EVENTS_TS_CHECKED: set[str] = set()


def _sniff_events_ts(path: str) -> tuple[str, bool]:
    """Read the parquet footer and return ``(unit, tz_aware)`` for ``ts``.

    The driver regenerates testdata between rounds and has already flipped
    the physical unit once (NANOS → MICROS), which silently compressed the
    engine's event timeline 1000× when the conversion was hard-coded.  The
    footer is the source of truth; trusting it instead of a pinned unit
    makes any future flip a visible branch change, not a data corruption.
    """
    cached = _EVENTS_TS_CACHE.get(path)
    if cached is not None:
        return cached
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        inner = [f for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        if not inner:
            raise ValueError(f"no parquet files under {path}")
        probe = os.path.join(path, inner[0])
    t = pq.ParquetFile(probe).schema_arrow.field("ts").type
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        result = (t.unit, t.tz is not None)
    elif pa.types.is_integer(t):
        # plain int64, no logical type: the round-1 layout stored raw nanos
        result = ("ns", False)
    else:
        raise ValueError(f"unsupported events.ts parquet type: {t}")
    _EVENTS_TS_CACHE[path] = result
    return result


def _read_events(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """Read the events table with ``ts`` normalized to session-TZ TIMESTAMP.

    * MICROS/MILLIS (current driver layout, NTZ): scan as TimestampNTZ and
      cast — identity under the UTC session zone, matching DuckDB's naive
      timestamps.
    * NANOS / raw long (round-1 layout): Spark has no nanos timestamp, so
      scan as long (``spark.sql.legacy.parquet.nanosAsLong``) and apply
      exact integer ns→µs division, the same truncation DuckDB uses.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    unit, tz_aware = _sniff_events_ts(path.rstrip("*"))
    reader = spark.readStream if streaming else spark.read
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = reader.schema(schemas.EVENTS_RAW).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ts_type = T.TimestampType() if tz_aware else T.TimestampNTZType()
    df = reader.schema(schemas.events_scan_schema(ts_type)).parquet(path)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _assert_events_ts_sane(df: DataFrame, path: str) -> None:
    """One-row probe: a mis-scaled epoch lands decades off; fail fast.

    Cached per path — a single-row limit job, run once per process, so the
    guard costs nothing at scale but catches a unit regression in seconds
    instead of as cryptic driver hash mismatches.
    """
    if path in _EVENTS_TS_CHECKED:
        return
    from pyspark.sql import functions as F

    row = df.select(F.year("ts").alias("y")).limit(1).collect()
    if row and row[0]["y"] is not None and not (2000 <= row[0]["y"] <= 2100):
        raise ValueError(
            f"events.ts decoded to year {row[0]['y']} — parquet unit mismatch at {path}"
        )
    _EVENTS_TS_CHECKED.add(path)


# path → scan partition count: the probe converts the plan to an RDD
# (a full physical-planning pass), so repeated loads of the same static
# file shouldn't pay it twice
_SCAN_PARTS_CACHE: dict[str, int] = {}


def rebalance_scan(df: DataFrame, cache_key: str | None = None) -> DataFrame:
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
    n = _SCAN_PARTS_CACHE.get(cache_key) if cache_key else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if cache_key:
            _SCAN_PARTS_CACHE[cache_key] = n
    if n < target:
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
    path = table_path(sf_dir, name)
    if name == "events":
        df = _read_events(spark, path)
        _assert_events_ts_sane(df, path)
        return rebalance_scan(df, cache_key=path) if rebalance else df
    schema = schemas.DRIVER_TABLES.get(name)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    return rebalance_scan(df, cache_key=path) if rebalance else df


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a streaming source with the logical schema.

    File streaming sources need a directory or glob (not a bare file);
    the trailing ``*`` makes the single-parquet layout streamable.
    """
    return _read_events(spark, table_path(sf_dir, "events") + "*", streaming=True)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    names = names or list(schemas.DRIVER_TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each driver table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
