#!/usr/bin/env python
"""Rounding/tie-class audit (r10 verdict task #4).

The r9/r10 close gates caught four cross-engine exactness defects in
the ROUNDING class: Spark's ``round(double, d)`` rounds the shortest
DECIMAL REPR of the double (``BigDecimal.valueOf`` semantics: 1.005 →
1.01) while DuckDB rounds the BINARY value (1.005 is really
1.00499999999999989… → 1.00), so any query that pairs the two engines'
``round`` on a double column is latent-wrong for inputs whose shortest
repr lands a '5' exactly at digit d+1 (empirically confirmed by
``tests/test_rounding_convention.py``).  The q144/q266 fix replaced
both sides with the SAME IEEE expression — binary-floor
``floor(x*10^d + 0.5)/10^d`` — and the q01 fix moved money sums to
tight-scale decimal end-to-end, where both engines' HALF_UP agree
exactly.

The overflow class got an analytic headroom audit in r10 (SCALE.md);
this tool is the same closure for the rounding class: instead of
grepping source text (500+ ``round(`` tokens, mostly safe), it walks
the ANALYZED Catalyst plan of every registered query and records every
``Round``/``BRound`` expression node with its child's resolved
dataType.  The dangerous class is exactly `child_type in (double,
float)` on a query whose DuckDB oracle also calls ``round(`` — decimal
children agree across engines (both HALF_UP on exact decimals), and
binary-floor sites compile to Floor, not Round, so they never appear.

Python-side kernels (mapInPandas) can't round-drift through this walk;
they are inventoried by the companion grep in the artifact
(`python_kernel_rounds`) and covered by the mirror inventory
(SURVEY §5.0).

Usage: python tools/rounding_audit.py [--out rounding_audit_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# streaming / state-mutating queries cannot be planned statically (the
# plan_lint census executes them instead); their rounding surface is
# the Python grep + the captured-plan census, not this walk
_EXECUTING = re.compile(r"q(22|25|104|110|232|242|257|270|275|276|277|283)_")


def _walk_expr(expr, hits: list, qname: str) -> None:
    cls = expr.getClass().getSimpleName()
    if cls in ("Round", "BRound"):
        child = expr.child()
        hits.append(
            {
                "query": qname,
                "kind": cls,
                "child_type": child.dataType().simpleString(),
                "scale": expr.scale().toString(),
                "expr": expr.toString()[:160],
            }
        )
    ch = expr.children()
    for i in range(ch.size()):
        _walk_expr(ch.apply(i), hits, qname)
    # subquery expressions carry whole plans
    name = expr.getClass().getName()
    if name.endswith(("ScalarSubquery", "ListQuery", "Exists", "LateralSubquery")):
        try:
            _walk_plan(expr.plan(), hits, qname)
        except Exception:
            pass


def _walk_plan(plan, hits: list, qname: str) -> None:
    exprs = plan.expressions()
    for i in range(exprs.size()):
        _walk_expr(exprs.apply(i), hits, qname)
    ch = plan.children()
    for i in range(ch.size()):
        _walk_plan(ch.apply(i), hits, qname)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "rounding_audit_r11.json"))
    args = ap.parse_args()

    from tools._stamp import git_stamp

    st = git_stamp()

    import __spark_entry__ as e
    from lawfirm_data_pipeline_spark.session import get_spark

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = e.queries()
    sqls = e.oracle_sql()

    hits: list[dict] = []
    errors: dict[str, str] = {}
    skipped: list[str] = []
    for name, fn in qs.items():
        if _EXECUTING.match(name):
            skipped.append(name)
            continue
        try:
            df = fn(spark, SF_DIR)
            _walk_plan(df._jdf.queryExecution().analyzed(), hits, name)
        except Exception as ex:  # noqa: BLE001
            errors[name] = str(ex)[:200]

    # pair with the DuckDB side: which oracles also round?
    sql_rounds = {
        n: len(re.findall(r"\bround\s*\(", sql, re.IGNORECASE))
        for n, sql in sqls.items()
    }

    risky = [
        h
        for h in hits
        if h["child_type"] in ("double", "float")
        # paired engine-round: the oracle rounds too, so BOTH engines'
        # repr-vs-binary tie semantics are in play on the same value
        and sql_rounds.get(h["query"], 0) > 0
    ]
    spark_only = [
        h
        for h in hits
        if h["child_type"] in ("double", "float")
        and sql_rounds.get(h["query"], 0) == 0
    ]

    # Python-kernel rounding inventory (informational; covered by the
    # SURVEY §5.0 mirror inventory, not by the plan walk)
    py_rounds = []
    pkg = os.path.join(_REPO, "lawfirm_data_pipeline_spark")
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            for i, ln in enumerate(open(path), 1):
                if re.search(r"(?<![.\w])(np\.round|round)\s*\(", ln) and not re.search(
                    r"F\.round|#.*round|\"\"\"|'''", ln
                ):
                    py_rounds.append(f"{os.path.relpath(path, _REPO)}:{i}")

    out = {
        "sf_dir": SF_DIR,
        "n_queries_planned": len(qs) - len(skipped) - len(errors),
        "n_round_nodes": len(hits),
        "by_child_type": {
            t: sum(1 for h in hits if h["child_type"] == t)
            for t in sorted({h["child_type"] for h in hits})
        },
        "risky_paired_double_rounds": risky,
        "spark_only_double_rounds": spark_only,
        "skipped_streaming": skipped,
        "errors": errors,
        "python_kernel_round_sites": len(py_rounds),
        **st,
        "round_nodes": hits,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                "n_round_nodes": len(hits),
                "by_child_type": out["by_child_type"],
                "risky_paired": len(risky),
                "spark_only_double": len(spark_only),
                "errors": len(errors),
            }
        )
    )
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
