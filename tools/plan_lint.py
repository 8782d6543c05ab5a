"""Plan-lint census: static physical-plan audit of every registered query.

Runs ``explain``-level planning (no execution) for all registry entries at
$SPARK_GRAFT_SF_DIR and flags anti-patterns the timing sweep can hide:

* ``CartesianProduct`` — a non-broadcast cross join is never acceptable at
  100 TB (broadcast nested-loop over a 1-row side is fine and common for
  scalar totals; those show as BroadcastNestedLoopJoin).
* ``BatchEvalPython`` — row-at-a-time Python UDF in the plan; every Python
  hot path in this repo must be Arrow-batched (ArrowEvalPython / mapInPandas
  show as ArrowEvalPython / MapInPandas and are allowed).
* exchange count per query — informational histogram; outliers (> 12
  shuffles in one plan) get listed for manual review.

Streaming queries (real readStream harnesses) can't be planned without
running the stream, so the registry entries that build one are executed
normally by the sweep instead; here they're skipped by catching the
AnalysisException that ``explain`` on an unstarted stream raises — the
skip list is printed so nothing silently drops.

Usage:  python tools/plan_lint.py            # one JSON line + flag report
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Queries whose callable DRIVES a real stream (memory-sink harness) or
# mutates catalog state as a side effect of being called: planning them
# means running them, so the static census skips these — they are covered
# by their own plan pins in tests/test_plans.py and the streaming gates.
_EXECUTING = re.compile(
    r"q(22|23|24|25|104|110|232|242|257|270|275|276|277|283)_"
)


def main() -> None:
    from lawfirm_data_pipeline_spark.session import get_spark
    from lawfirm_data_pipeline_spark.queries import QUERIES

    spark = get_spark(app_name="plan_lint")
    flags: dict[str, list[str]] = {}
    exchanges: dict[str, int] = {}
    skipped: list[str] = []
    for name, fn in QUERIES.items():
        if _EXECUTING.match(name):
            skipped.append(name)
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — census must finish
            flags.setdefault(name, []).append(f"plan-error: {type(e).__name__}: {e}")
            continue
        probs = []
        if "CartesianProduct" in plan:
            probs.append("CartesianProduct")
        if re.search(r"\bBatchEvalPython\b", plan):
            probs.append("BatchEvalPython (row-at-a-time Python)")
        n_ex = plan.count("Exchange ") + plan.count("Exchange\n")
        exchanges[name] = n_ex
        if n_ex > 12:
            probs.append(f"exchange-count {n_ex}")
        if probs:
            flags[name] = probs
    out = {
        "metric": "plan_lint",
        "n_planned": len(exchanges),
        "n_skipped_streaming": len(skipped),
        "flagged": flags,
        "max_exchanges": max(exchanges.values(), default=0),
        "top_exchanges": dict(
            sorted(exchanges.items(), key=lambda kv: -kv[1])[:10]
        ),
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    if flags:
        sys.exit(1)


if __name__ == "__main__":
    main()
