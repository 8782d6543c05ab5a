"""Versioned tables: atomic multi-write commits over vanilla parquet.

The reference gets atomicity from Postgres transactions
(``$transaction``, src/db/client/effect.ts:369-396).  Plain parquet
overwrites are NOT atomic — a reader racing a rewrite sees partial
state, and a failed job corrupts the table.  The standard lake answer is
a transaction log (Delta/Iceberg); this module implements the minimal
honest version of the same idea so the engine's mutation transforms
(operators/mutations.py) can be committed transactionally:

* every write lands in a fresh ``v=<n>/`` directory (copy-on-write —
  never in place);
* a tiny ``_LATEST`` pointer file names the committed version;
* the pointer is published by atomic rename, so readers see either the
  old version or the new one, never a mix;
* a multi-table commit writes all tables' new versions first, then
  flips all pointers; a crash before the flips leaves every pointer on
  the old state (readers unaffected; orphan dirs are vacuumable).

At 100 TB the same design holds: data writes are the heavy distributed
part and remain parallel; the commit point is one small filesystem
rename per table (object stores: one small PUT), exactly how real table
formats commit.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, _POINTER)


def current_version(table_dir: str) -> int | None:
    try:
        with open(_pointer_path(table_dir)) as f:
            return json.load(f)["version"]
    except (FileNotFoundError, json.JSONDecodeError, KeyError):
        return None


def _publish(table_dir: str, version: int) -> None:
    """Atomic pointer flip: write-temp + rename within the directory."""
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._latest_")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, _pointer_path(table_dir))


def write_version(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the next version directory WITHOUT publishing it.
    Returns the staged version number (commit with ``publish`` /
    ``commit_many``)."""
    os.makedirs(table_dir, exist_ok=True)
    cur = current_version(table_dir)
    nxt = 0 if cur is None else cur + 1
    # skip over orphaned uncommitted dirs from crashed writers
    while os.path.exists(os.path.join(table_dir, f"v={nxt}")):
        nxt += 1
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, f"v={nxt}"))
    return nxt


def publish(table_dir: str, version: int) -> None:
    _publish(table_dir, version)


def read_latest(spark: SparkSession, table_dir: str) -> DataFrame:
    v = current_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Time-travel read of a specific committed-or-staged version.

    Version dirs are immutable once written, so any retained version is
    readable forever (until ``vacuum`` reclaims it) — the AS OF
    semantics Delta/Iceberg expose, at pointer-file cost (gated by
    q206)."""
    path = os.path.join(table_dir, f"v={version}")
    if not os.path.exists(path):
        raise FileNotFoundError(f"version {version} not found in {table_dir}")
    return spark.read.parquet(path)


def commit_many(staged: dict[str, int]) -> None:
    """$transaction for table mutations: publish several staged versions
    together.  All data is already durable before the first flip; the
    flips are small and fast, so the non-atomic window is the gap
    between renames — the same window real multi-table lake commits
    have without a coordinating catalog. Single-table commits (the
    common case, like Delta) are fully atomic."""
    for table_dir, version in staged.items():
        _publish(table_dir, version)


def vacuum(table_dir: str, keep: int = 2) -> list[str]:
    """Delete version dirs older than the newest ``keep`` (never the
    committed one).  Returns removed paths."""
    import shutil

    cur = current_version(table_dir)
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    survivors = set(versions[-keep:])
    if cur is not None:
        survivors.add(cur)
    removed = []
    for v in versions:
        if v not in survivors:
            p = os.path.join(table_dir, f"v={v}")
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
    return removed


def compact(spark: SparkSession, path: str, target_file_bytes: int = 128 << 20) -> int:
    """Rewrite a parquet directory into ~target-sized files (the
    small-files problem: streaming sinks and fine-grained mutations
    accrete files; scans then pay per-file open cost).  Returns the new
    file count.  For versioned tables, compact INTO a new version:
    ``write_version(read_latest(...).coalesce(n), dir)``."""
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    )
    n = max(1, -(-size // target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(n).write.mode("errorifexists").parquet(tmp)
    import shutil

    backup = path.rstrip("/") + "__precompact"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup, ignore_errors=True)
    return n
