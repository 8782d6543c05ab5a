"""Local replica of the driver's differential check.

The driver materializes BOTH sides as pandas DataFrames (Spark via
``toPandas``, DuckDB via ``.df()``), canonicalizes (columns sorted by
name, rows sorted), and hashes the string rendering of every cell.
Mirroring that exactly matters:

  * DuckDB ``sum()`` over integers yields HUGEINT, which pandas renders
    as float64 ("967.0") while Spark's bigint renders "967".  The old
    ``fetchall()`` path converted HUGEINT to Python int and hid that
    class of mismatch (round-1 q41/q43/q47 hash failures).
  * The driver's canonicalizer (pandas ``sort_values``) raises
    ``TypeError: unhashable type`` on list/array-valued cells (round-1
    q40 crash) — so array-typed output columns are a hard error here
    too, even for rows-only queries.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _norm_cell(v) -> str:
    if v is None:
        return "None"
    if isinstance(v, (np.ndarray, list, tuple, dict, set)):
        raise TypeError(
            f"cell of type {type(v).__name__}: array-typed output columns "
            "crash the driver canonicalizer — project to scalars"
        )
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if v is pd.NaT:
        return "NaT"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    try:
        if pd.isna(v):
            return "NaN"
    except (TypeError, ValueError):
        pass
    return repr(v)


def canon_multiset(pdf: pd.DataFrame) -> list[str]:
    """Order-insensitive canonical form: one string per row, columns
    sorted by name, rows sorted.  Raises on driver-incompatible cells."""
    cols = sorted(pdf.columns)
    rows = [
        "|".join(_norm_cell(v) for v in tup)
        for tup in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, duck_con, sql: str) -> None:
    s_pdf = spark_df.toPandas()
    d_pdf = duck_con.execute(sql).df()

    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    assert s_cols == d_cols, f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_pdf) == len(d_pdf), f"row count differs: {len(s_pdf)} vs {len(d_pdf)}"

    s_ms = canon_multiset(s_pdf)
    d_ms = canon_multiset(d_pdf)
    if s_ms != d_ms:
        d_set, s_set = set(d_ms), set(s_ms)
        diff_s = [r for r in s_ms if r not in d_set][:5]
        diff_d = [r for r in d_ms if r not in s_set][:5]
        raise AssertionError(
            f"value multiset differs;\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )
