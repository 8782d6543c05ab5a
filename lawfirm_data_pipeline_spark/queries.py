"""Registry wiring engine capabilities to the driver's oracle harness.

Each registered query is a (PySpark callable, DuckDB SQL) pair over the
driver parquet tables.  The callable takes (spark, sf_dir) and returns a
DataFrame; the SQL is the ANSI twin the driver runs in DuckDB at sf0.01
for the row-count + schema + value-hash comparison.

Conventions that keep the hash comparison honest:
  * every computed column is aliased the same on both sides;
  * float aggregates whose mathematical value is an exact decimal are
    rounded to that resolution on both sides (summation order differs
    between engines, so raw double sums can drift in the last bits);
  * timestamps rely on the UTC session time zone set in session.py.

Modules under ``oracle/`` self-register via the ``query`` decorator at
import time; importing this module pulls them all in.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    """Register a driver-visible query; ``sql=None`` → rows-only check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# Import for side effects: oracle modules register themselves.
from . import oracle  # noqa: E402,F401
