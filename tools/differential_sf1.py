"""Value differential at sf1 (r8 verdict task #4).

The driver's differential runs at sf0.01 and the slope program proves
TIMING stays linear to sf3 — but nothing above sf0.1 ever proved
VALUES.  The round-2 events-unit bug class was scale-dependent
(a unit sniff that read one row group), so one more decade of value
evidence closes the gap the slope program leaves open.

This tool replays the driver comparison (row count + sorted-column
schema + order-insensitive value hash, via tests/oracle_compare's
canonicalizer) over the ORGANIC sf1 replica (`bench_sf1.materialize`:
ten key-shifted copies, orthogonally-rotated embeddings,
token-suffixed text — sf0.1 ⊂ sf1 as copy 0).

Feasibility: a handful of registry ORACLES are deliberately quadratic
(all-pairs SQL twins of bucketed/banded Spark paths) and cannot finish
at 50k docs / 20k vectors; each side runs under a watchdog (Spark:
cancelAllJobs, DuckDB: interrupt) and a query whose ORACLE times out
is recorded as excluded-with-reason, never silently dropped.  The
SPARK side timing out would itself be a scale finding and is recorded
distinctly.

Usage:
  python tools/differential_sf1.py [--only q37,q41] [--out FILE]
Prints one JSON line; writes differential_sf1.json (git-stamped).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF1_DIR = os.path.join(_REPO, "benchdata", "sf1")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

SPARK_TIMEOUT = int(os.environ.get("DIFF_SF1_SPARK_TIMEOUT", "420"))
DUCK_TIMEOUT = int(os.environ.get("DIFF_SF1_DUCK_TIMEOUT", "240"))


def is_oracle_resource_failure(exc: BaseException, duckdb_mod) -> bool:
    """True iff the oracle-side exception is a local-resource
    exhaustion (OOM / disk-full) rather than a genuine oracle bug.

    r10 ADVICE #3: classify by exception TYPE — MemoryError,
    duckdb.OutOfMemoryException, OSError ENOSPC — never by message
    substring; a real oracle defect whose text contained "Out of
    Memory" used to silently drop out of the differential.  The single
    remaining text check is scoped UNDER duckdb.IOException, because
    DuckDB wraps the OS disk-full error there and discards errno."""
    import errno

    resource_types: tuple[type, ...] = (MemoryError,)
    oom = getattr(duckdb_mod, "OutOfMemoryException", None)
    if isinstance(oom, type):
        resource_types += (oom,)
    ioexc = getattr(duckdb_mod, "IOException", None)
    return (
        isinstance(exc, resource_types)
        or (isinstance(exc, OSError) and exc.errno == errno.ENOSPC)
        or (
            isinstance(ioexc, type)
            and isinstance(exc, ioexc)
            and "No space left on device" in str(exc)
        )
    )


def _canon_hash(rows: list[str]) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


class _Watchdog:
    """Fire ``cancel`` after ``seconds`` unless disarmed; remembers
    whether it fired so a cancellation error can be told apart from a
    genuine query error."""

    def __init__(self, seconds: float, cancel):
        self.fired = False

        def _fire():
            self.fired = True
            try:
                cancel()
            except Exception:
                pass

        self._t = threading.Timer(seconds, _fire)
        self._t.daemon = True
        self._t.start()

    def disarm(self) -> None:
        self._t.cancel()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated name prefixes")
    ap.add_argument("--sf-dir", default=SF1_DIR)
    ap.add_argument("--out", default=os.path.join(_REPO, "differential_sf1.json"))
    args = ap.parse_args()

    import duckdb

    from lawfirm_data_pipeline_spark.queries import ORACLE_SQL, QUERIES
    from lawfirm_data_pipeline_spark.session import get_spark
    from tests.oracle_compare import canon_multiset
    from tools._stamp import git_stamp

    # stamp at RUN START: it describes the code that ran, and lets
    # several gate artifacts run CONCURRENTLY from one clean commit
    # without a sibling's end-of-run write flipping git_dirty (r10)
    stamp = git_stamp()

    if not os.path.isdir(args.sf_dir):
        from bench_sf1 import materialize

        materialize(get_spark())

    spark = get_spark(app_name="differential_sf1")
    con = duckdb.connect()
    # Cap the oracle's memory (default would be ~80% of RAM): sharing
    # the box with a Spark JVM, an uncapped DuckDB spill-to-RAM gets
    # the WHOLE differential process kernel-OOM-killed mid-run (r12:
    # the sf3 q127 twin reached 81 GB RSS and took the run with it).
    # Capped, it raises OutOfMemoryException instead — which
    # is_oracle_resource_failure classifies as a clean excluded-with-
    # reason row, preserving the rest of the run.
    duck_mem = os.environ.get("DIFF_SF1_DUCK_MEM", "40GB")
    con.execute(f"SET memory_limit='{duck_mem}'")
    con.execute(f"SET temp_directory='{tempfile.gettempdir()}/duckspill'")
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    names = list(QUERIES)
    if args.only:
        pres = args.only.split(",")
        names = [n for n in names if any(n.startswith(p) for p in pres)]

    results: dict[str, dict] = {}
    n_green = n_excluded = n_red = 0
    for i, name in enumerate(names):
        fn = QUERIES[name]
        sql = ORACLE_SQL.get(name)
        row: dict = {}

        t0 = time.time()
        wd = _Watchdog(SPARK_TIMEOUT, spark.sparkContext.cancelAllJobs)
        try:
            s_pdf = fn(spark, args.sf_dir).toPandas()
            wd.disarm()
            s_rows = canon_multiset(s_pdf)
            row["secs_spark"] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001
            wd.disarm()
            row["secs_spark"] = round(time.time() - t0, 2)
            if wd.fired:
                row["excluded"] = (
                    f"SPARK side exceeded {SPARK_TIMEOUT}s — scale "
                    "finding, investigate"
                )
            else:
                row["err"] = f"spark: {type(exc).__name__}: {exc}"[:300]
            results[name] = row
            n_excluded += wd.fired
            n_red += not wd.fired
            print(json.dumps({name: row}), flush=True)
            continue

        if sql is None:
            row["rows_only"] = len(s_rows)
            row["hash_spark"] = _canon_hash(s_rows)
            results[name] = row
            n_green += 1
            print(json.dumps({name: row}), flush=True)
            continue

        t1 = time.time()
        wd = _Watchdog(DUCK_TIMEOUT, con.interrupt)
        try:
            d_pdf = con.execute(sql).df()
            wd.disarm()
            d_rows = canon_multiset(d_pdf)
            row["secs_duck"] = round(time.time() - t1, 2)
        except Exception as exc:  # noqa: BLE001
            wd.disarm()
            row["secs_duck"] = round(time.time() - t1, 2)
            # Oracle infeasibility at this scale is an exclusion, not a
            # red: the differential verifies the ENGINE; an oracle that
            # cannot complete (watchdog timeout, or spill exhausting
            # the box's disk/memory — q156's quadratic BFS twin needed
            # >78G of DuckDB temp at sf3) says nothing about engine
            # correctness.  Both record the reason; a SPARK-side
            # failure stays red.  Classification is type-based
            # (is_oracle_resource_failure, r10 ADVICE #3) and every
            # exclusion is echoed loudly in the end-of-run summary.
            resource = is_oracle_resource_failure(exc, duckdb)
            if wd.fired:
                row["excluded"] = (
                    f"oracle exceeded {DUCK_TIMEOUT}s (quadratic "
                    "all-pairs SQL twin of a bucketed/banded Spark path)"
                )
            elif resource:
                row["excluded"] = (
                    "oracle exhausted local resources at this scale: "
                    + f"{type(exc).__name__}: {exc}"[:200]
                )
            else:
                row["err"] = f"duckdb: {type(exc).__name__}: {exc}"[:300]
            excluded = wd.fired or resource
            results[name] = row
            n_excluded += excluded
            n_red += not excluded
            print(json.dumps({name: row}), flush=True)
            continue

        row["rows_match"] = len(s_rows) == len(d_rows)
        row["schema_match"] = sorted(s_pdf.columns) == sorted(d_pdf.columns)
        row["hash_match"] = _canon_hash(s_rows) == _canon_hash(d_rows)
        if not (row["rows_match"] and row["schema_match"] and row["hash_match"]):
            d_set, s_set = set(d_rows), set(s_rows)
            row["spark_only"] = [r for r in s_rows if r not in d_set][:3]
            row["duck_only"] = [r for r in d_rows if r not in s_set][:3]
            n_red += 1
        else:
            n_green += 1
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    # a fresh-draw corpus carries its draw parameters (seed/factor/row
    # counts) in MANIFEST.json; echo it into the artifact so the
    # rotating-seed evidence is self-describing (r10 verdict task #3)
    manifest = None
    mpath = os.path.join(args.sf_dir, "MANIFEST.json")
    if os.path.isfile(mpath):
        with open(mpath) as mf:
            manifest = json.load(mf)

    out = {
        "sf_dir": args.sf_dir,
        **({"sf_manifest": manifest} if manifest else {}),
        "n_queries": len(names),
        "n_green": n_green,
        "n_excluded": n_excluded,
        "n_red": n_red,
        "spark_timeout_s": SPARK_TIMEOUT,
        "duck_timeout_s": DUCK_TIMEOUT,
        **stamp,
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    # r10 ADVICE #3: surface every exclusion loudly — an excluded case
    # is a judgement call a human must be able to review from the log
    # alone, not a silent drop.
    excluded_rows = {
        n: r["excluded"] for n, r in results.items() if "excluded" in r
    }
    for n, why in excluded_rows.items():
        print(f"# EXCLUDED (review): {n}: {why}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                **{k: out[k] for k in ("n_queries", "n_green", "n_excluded", "n_red")},
                "excluded": sorted(excluded_rows),
            }
        )
    )
    sys.exit(1 if n_red else 0)


if __name__ == "__main__":
    main()
