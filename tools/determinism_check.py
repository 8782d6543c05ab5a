"""Partitioning-determinism differential over the whole registry.

The repo-wide numeric discipline (exact integers / fixed-point snaps
before every order-sensitive accumulation, explicit tie-breaks on every
rank) exists to make results partition-order independent.  This tool
PROVES it empirically: run every registered query twice in one session
— once at spark.sql.shuffle.partitions=7, once at 32 (coprime, so
every hash-partitioned exchange routes rows differently) — hash the
sorted result rows, and report any query whose hash moves.

The Spark cache is cleared between passes so the second pass cannot
trivially reuse data materialized by the first.  Streaming-harness
queries scope their own shuffle-partition count and so see identical
plans both passes; they still run (their determinism across reruns —
fresh scratch dirs, checkpoint ids — is worth gating too).

Usage:  python tools/determinism_check.py [sf_dir]   # default sf0.01
Prints one JSON line; exit 1 if any query's hash differs.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# stamp at RUN START (describes the code that ran; concurrent-gate safe)
from tools._stamp import git_stamp  # noqa: E402

_STAMP = git_stamp()


def result_hash(df) -> str:
    rows = sorted(map(repr, map(tuple, df.collect())))
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    from lawfirm_data_pipeline_spark.session import get_spark
    from lawfirm_data_pipeline_spark.queries import QUERIES

    spark = get_spark(app_name="determinism_check")
    passes: list[dict[str, str]] = []
    errs: dict[str, str] = {}
    # axis 1: shuffle partition count (reduce-side routing/order)
    # axis 2: input split size (map-side scan partitioning/order —
    #         1m splits every multi-row-group file differently)
    for sp, mpb in (("7", "128m"), ("32", "128m"), ("32", "1m")):
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        hashes: dict[str, str] = {}
        for name, fn in QUERIES.items():
            try:
                hashes[name] = result_hash(fn(spark, SF_DIR))
            except Exception as e:  # noqa: BLE001 — census must finish
                errs[name] = f"sp={sp},mpb={mpb}: {type(e).__name__}: {e}"
        passes.append(hashes)
        print(
            f"# pass sp={sp} mpb={mpb}: {len(hashes)} hashed",
            file=sys.stderr,
            flush=True,
        )
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    base = passes[0]
    diff = sorted(
        n
        for n in set.intersection(*[set(p) for p in passes])
        if any(p[n] != base[n] for p in passes[1:])
    )
    out = {
        "metric": "partitioning_determinism",
        **_STAMP,
        "n_queries": len(set.union(*[set(p) for p in passes])),
        "mismatched": diff,
        "errors": errs,
        "sf_dir": SF_DIR,
    }
    print(json.dumps(out))
    spark.stop()
    if diff or errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
