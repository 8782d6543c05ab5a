"""Local replica of the driver's differential check.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares row count, column names, and an
order-insensitive value comparison.  Floats are compared exactly (the
driver hashes values), so a failure here flags summation-order drift the
query definitions must absorb (by rounding on both sides).
"""

from __future__ import annotations

import math
from datetime import datetime, timezone


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime):
        # Spark returns naive datetimes in session TZ (UTC); duckdb naive UTC.
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in idx) for r in rows)


def compare(spark_df, duck_con, sql: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: {len(s_rows)} vs {len(d_rows)}"

    s_ms = _rows_to_multiset(s_cols, s_rows)
    d_ms = _rows_to_multiset(d_cols, d_rows)
    if s_ms != d_ms:
        diff_s = [r for r in s_ms if r not in set(d_ms)][:5]
        diff_d = [r for r in d_ms if r not in set(s_ms)][:5]
        raise AssertionError(
            f"value multiset differs;\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )
