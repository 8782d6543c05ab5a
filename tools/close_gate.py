#!/usr/bin/env python
"""Per-round close gate: regenerate every standing scale-evidence
artifact at the FINAL tree, with pristine git stamps (r9 verdict task
#3 — the sf1+sf3 value differential is a standing gate from r10 on,
like plan-lint and the determinism census, not one-shot evidence).

Runs, in order (each subprocess so sessions don't share state):

  1. plan-lint census          -> plan_lint_r{N}.json
  1b. rounding audit           -> rounding_audit_r{N}.json
      (plan-walk: zero engine Round-on-double in paired positions)
  2. determinism (sf0.1)       -> determinism_r{N}.json
  3. sf1 VALUE differential    -> differential_sf1.json
  4. sf3 VALUE differential    -> differential_sf3.json
  5. fresh-draw differential   -> differential_freshdraw_r{N}.json
     (cardinality-sensitive family on the non-copy 10x corpus)
  6. zipf-skew differential    -> differential_skew_r{N}.json
     (full registry on the per-round hot-key corpus, skew 1.2 —
      hottest orderkey ~19% of lineitem: exercises the AQE-skew-join/
      salting plans and the three degenerate-group caps for real;
      r11 verdict task — a one-shot adversarial corpus is a fixture
      after its first pass, so the seed rotates with the round)
  7. null-injection differential -> differential_nulls_r{N}.json
     (full registry on the per-round nulls-0.1 corpus — measure/
      attribute columns at 5-10% NULL, keys non-null: the 3VL/window-
      null-ordering/observed-sample conventions of r12, standing)
  8. edge-value differential     -> differential_edge_r{N}.json
     (full registry on the per-round edge-0.1 corpus — empty/emoji/
      combining-mark/4000-token documents, zero/extreme/duplicate
      embedding vectors, exact timestamp ties, boundary money values:
      the web-garbage robustness conventions of r12, standing)

Refuses to start on a dirty tree — a stale/dirty-stamped artifact is
the exact judge-complaint class this gate exists to close.  Each
step's summary line is echoed; exit is non-zero if any step fails or
reports reds.  Determinism at sf1/sf3 is hash-stable round to round
and much slower; re-run those via tools/determinism_check.py when the
numeric discipline itself changes.

Usage:
    python tools/close_gate.py --round 10            # full gate
    python tools/close_gate.py --round 10 --skip sf3 # e.g. disk-tight box
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# zipf exponent for the per-round skew corpus (step 6).  1.2 puts the
# hottest orderkey at ~19% of lineitem — deep inside the AQE-skew-join
# regime — while DuckDB's oracle side still completes everything except
# the two adjudicated resource exclusions (q127 disk, q156 spill).
SKEW_EXP = 1.2

# NULL-injection rate for the per-round nulls corpus (step 7): measure/
# attribute columns at rate (or rate/2), keys/text/embeddings non-null.
NULLS_RATE = 0.1

# edge-value injection rate for the per-round edge corpus (step 8):
# pathological documents/vectors/timestamps/money at this rate, keys
# and row counts untouched.
EDGE_RATE = 0.1

# the fresh-draw step runs the FULL registry: the corpus's different
# distribution (organic uniqueness, fresh multiplicities, different
# date/value quantization) is a third evidence axis — its first full
# run (r10) caught the flagship's sum(double) ulp drift that three
# scales of key-shifted copies never exposed.  The cardinality family
# (q50,q107,q153,q194,q196,q239,q273) is the part that NEEDS this
# corpus; the rest rides along for the distribution shift.


def _run(name: str, cmd: list[str], out_path: str | None, env: dict | None = None) -> bool:
    """Run one gate step.  stderr goes to a per-step log file (NOT
    devnull — the differential tool prints its mandated
    '# EXCLUDED (review):' lines there, r10 ADVICE #3); exclusion
    lines are echoed through, and a failing step's stderr tail is
    printed so the gate log alone diagnoses a red."""
    print(f"== close-gate step: {name}", flush=True)
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    # stderr logs live OUTSIDE the repo: an untracked log would flip
    # git_dirty in every later step's self-stamp
    errlog = os.path.join(
        tempfile.gettempdir(), f"close_gate_{name.split()[0]}.stderr.log"
    )
    with open(errlog, "w") as ef:
        if out_path:
            # write to a temp file and move into place only on success:
            # opening the tracked artifact directly would truncate it at
            # launch, and a crashed step would leave partial JSON where
            # a valid committed artifact used to be (r11 ADVICE #4)
            tmp_out = os.path.join(
                tempfile.gettempdir(), f"close_gate_{name.split()[0]}.stdout"
            )
            with open(tmp_out, "w") as f:
                rc = subprocess.run(
                    cmd, cwd=_REPO, stdout=f, stderr=ef, env=full_env
                ).returncode
            if rc == 0:
                import shutil

                shutil.move(tmp_out, os.path.join(_REPO, out_path))
            else:
                print(
                    f"   rc={rc}: leaving {out_path} intact; partial "
                    f"output kept at {tmp_out}",
                    flush=True,
                )
        else:
            rc = subprocess.run(
                cmd, cwd=_REPO, stderr=ef, env=full_env
            ).returncode
    try:
        err_lines = open(errlog).read().splitlines()
    except OSError:
        err_lines = []
    for ln in err_lines:
        if ln.startswith("# EXCLUDED (review):"):
            print(f"   {ln}", flush=True)
    if rc != 0:
        for ln in err_lines[-15:]:
            print(f"   stderr| {ln}", flush=True)
    print(f"   {name}: rc={rc}" + (f" -> {out_path}" if out_path else ""), flush=True)
    return rc == 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--skip",
        default="",
        help="comma list from {lint,raudit,det,sf1,sf3,freshdraw,skew,nulls,edge}",
    )
    ap.add_argument(
        "--commit",
        action="store_true",
        help="git-commit each artifact right after its step (sequential "
        "mode), so every later step self-stamps a CLEAN tree",
    )
    ap.add_argument(
        "--parallel",
        action="store_true",
        help="launch every step CONCURRENTLY from the current clean "
        "commit — safe since r10: every tool takes its git stamp at "
        "RUN START, so a sibling's end-of-run artifact write cannot "
        "flip a stamp.  Wall clock = the slowest step (sf3) instead "
        "of the sum.  Implies no per-step commits; commit all "
        "artifacts together afterwards.",
    )
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    dirty = subprocess.run(
        ["git", "status", "--porcelain"], capture_output=True, text=True, cwd=_REPO
    ).stdout.strip()
    # the artifacts this gate WRITES may exist from a partial prior run;
    # anything else dirty means the stamps would lie
    own = {
        f"plan_lint_r{args.round}.json",
        f"determinism_r{args.round}.json",
        "differential_sf1.json",
        "differential_sf3.json",
        f"differential_freshdraw_r{args.round}.json",
        f"differential_skew_r{args.round}.json",
        f"differential_nulls_r{args.round}.json",
        f"differential_edge_r{args.round}.json",
        f"rounding_audit_r{args.round}.json",
    }
    foreign = [
        ln for ln in dirty.splitlines() if ln.split(None, 1)[-1] not in own
    ]
    if foreign:
        print("close_gate: tree is dirty — commit first (pristine stamps):")
        for ln in foreign[:10]:
            print("  " + ln)
        sys.exit(2)

    def _commit(path: str) -> None:
        if not args.commit:
            return
        subprocess.run(["git", "add", path], cwd=_REPO)
        subprocess.run(
            ["git", "commit", "-q", "-m", f"close gate r{args.round}: {path}"],
            cwd=_REPO,
        )

    py = sys.executable

    # SEED ROTATION (r10 verdict task #3): each round's fresh-draw
    # differential runs on a per-round corpus drawn from seed
    # 4242+round; a fixed-seed corpus is a fixture after its first
    # green pass.  Materialize it here if absent (the dir is gitignored
    # so generation never dirties the stamps).
    fresh_dir = skew_dir = nulls_dir = edge_dir = None
    if {"freshdraw", "skew", "nulls", "edge"} - skip:
        sys.path.insert(0, os.path.join(_REPO, "tools"))
        import freshdraw_sf1

        seed = freshdraw_sf1.SEED_BASE + args.round
    if "freshdraw" not in skip:
        fresh_dir = freshdraw_sf1.out_dir(seed, 10)
        if not os.path.isfile(os.path.join(fresh_dir, "MANIFEST.json")):
            print(
                f"== close-gate: materializing fresh-draw corpus "
                f"(seed {seed}) at {fresh_dir}",
                flush=True,
            )
            freshdraw_sf1.materialize(seed, 10)
    if "skew" not in skip:
        # same per-round seed, zipf-1.2 FK multiplicities: the hot-key
        # axis (r11).  Distinct from the uniform fresh draw — this one
        # exists to drive the skew-join/salting plans and the
        # degenerate-group caps, not the cardinality estimators.
        skew_dir = freshdraw_sf1.out_dir(seed, 10, skew=SKEW_EXP)
        if not os.path.isfile(os.path.join(skew_dir, "MANIFEST.json")):
            print(
                f"== close-gate: materializing zipf-skew corpus "
                f"(seed {seed}, skew {SKEW_EXP}) at {skew_dir}",
                flush=True,
            )
            freshdraw_sf1.materialize(seed, 10, skew=SKEW_EXP)
    if "nulls" not in skip:
        # same per-round seed, NULL-injected measure/attribute columns:
        # the 3VL / null-ordering / observed-sample axis (r12).
        nulls_dir = freshdraw_sf1.out_dir(seed, 10, nulls=NULLS_RATE)
        if not os.path.isfile(os.path.join(nulls_dir, "MANIFEST.json")):
            print(
                f"== close-gate: materializing null-injection corpus "
                f"(seed {seed}, nulls {NULLS_RATE}) at {nulls_dir}",
                flush=True,
            )
            freshdraw_sf1.materialize(seed, 10, nulls=NULLS_RATE)

    if "edge" not in skip:
        # same per-round seed, edge-value injection: the web-garbage
        # robustness axis (r12) — empty/emoji/long documents, zero and
        # extreme vectors, exact ts ties, boundary money.
        edge_dir = freshdraw_sf1.out_dir(seed, 10, edge=EDGE_RATE)
        if not os.path.isfile(os.path.join(edge_dir, "MANIFEST.json")):
            print(
                f"== close-gate: materializing edge-value corpus "
                f"(seed {seed}, edge {EDGE_RATE}) at {edge_dir}",
                flush=True,
            )
            freshdraw_sf1.materialize(seed, 10, edge=EDGE_RATE)

    if args.parallel:
        big_env = dict(os.environ)
        big_env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
        big_env.setdefault("DIFF_SF1_DUCK_TIMEOUT", "600")
        big_env.setdefault("DIFF_SF1_SPARK_TIMEOUT", "600")
        steps = {
            "lint": ([py, "tools/plan_lint.py"], f"plan_lint_r{args.round}.json", None),
            "raudit": (
                [py, "tools/rounding_audit.py",
                 "--out", f"rounding_audit_r{args.round}.json"],
                None, None,
            ),
            "det": (
                [py, "tools/determinism_check.py", "/root/testdata/sf0.1"],
                f"determinism_r{args.round}.json", None,
            ),
            "sf1": (
                [py, "tools/differential_sf1.py", "--out", "differential_sf1.json"],
                None, big_env,
            ),
            "sf3": (
                [py, "tools/differential_sf1.py",
                 "--sf-dir", os.path.join(_REPO, "benchdata", "sf3"),
                 "--out", "differential_sf3.json"],
                None, big_env,
            ),
            "freshdraw": (
                [py, "tools/differential_sf1.py",
                 "--sf-dir", fresh_dir,
                 "--out", f"differential_freshdraw_r{args.round}.json"],
                None, big_env,
            ),
            "skew": (
                [py, "tools/differential_sf1.py",
                 "--sf-dir", skew_dir,
                 "--out", f"differential_skew_r{args.round}.json"],
                None, big_env,
            ),
            "nulls": (
                [py, "tools/differential_sf1.py",
                 "--sf-dir", nulls_dir,
                 "--out", f"differential_nulls_r{args.round}.json"],
                None, big_env,
            ),
            "edge": (
                [py, "tools/differential_sf1.py",
                 "--sf-dir", edge_dir,
                 "--out", f"differential_edge_r{args.round}.json"],
                None, big_env,
            ),
        }
        procs = {}
        for label, (cmd, out_path, env) in steps.items():
            if label in skip:
                continue
            errlog = os.path.join(
                tempfile.gettempdir(), f"close_gate_{label}.stderr.log"
            )
            # stdout goes to a TEMP file moved into place at step end:
            # opening the in-repo artifact at launch would truncate a
            # tracked file and flip every sibling's start-stamp dirty
            tmp_out = (
                os.path.join(tempfile.gettempdir(), f"close_gate_{label}.stdout")
                if out_path
                else None
            )
            procs[label] = (
                subprocess.Popen(
                    cmd, cwd=_REPO,
                    stdout=open(tmp_out, "w") if tmp_out else subprocess.DEVNULL,
                    stderr=open(errlog, "w"), env=env or None,
                ),
                errlog,
                tmp_out,
                out_path,
            )
            print(f"== close-gate launched (parallel): {label}", flush=True)
        ok = True
        for label, (proc, errlog, tmp_out, out_path) in procs.items():
            rc = proc.wait()
            if tmp_out and out_path:
                if rc == 0:
                    import shutil

                    shutil.move(tmp_out, os.path.join(_REPO, out_path))
                else:
                    # a crashed step must not replace a previously valid
                    # committed artifact with partial JSON; keep the temp
                    # file for diagnosis (r11 ADVICE #4)
                    print(
                        f"   [{label}] rc={rc}: leaving {out_path} intact; "
                        f"partial output kept at {tmp_out}",
                        flush=True,
                    )
            try:
                err_lines = open(errlog).read().splitlines()
            except OSError:
                err_lines = []
            for ln in err_lines:
                if ln.startswith("# EXCLUDED (review):"):
                    print(f"   [{label}] {ln}", flush=True)
            if rc != 0:
                for ln in err_lines[-15:]:
                    print(f"   [{label}] stderr| {ln}", flush=True)
            print(f"   {label}: rc={rc}", flush=True)
            ok &= rc == 0
        _summarize(args, ok)
        return

    ok = True
    if "lint" not in skip:
        ok &= _run(
            "plan-lint",
            [py, "tools/plan_lint.py"],
            f"plan_lint_r{args.round}.json",
        )
        _commit(f"plan_lint_r{args.round}.json")
    if "raudit" not in skip:
        ok &= _run(
            "rounding-audit",
            [py, "tools/rounding_audit.py",
             "--out", f"rounding_audit_r{args.round}.json"],
            None,
        )
        _commit(f"rounding_audit_r{args.round}.json")
    if "det" not in skip:
        ok &= _run(
            "determinism sf0.1",
            [py, "tools/determinism_check.py", "/root/testdata/sf0.1"],
            f"determinism_r{args.round}.json",
        )
        _commit(f"determinism_r{args.round}.json")
    big = {
        "SPARK_GRAFT_DRIVER_MEM": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        "DIFF_SF1_DUCK_TIMEOUT": os.environ.get("DIFF_SF1_DUCK_TIMEOUT", "600"),
        "DIFF_SF1_SPARK_TIMEOUT": os.environ.get("DIFF_SF1_SPARK_TIMEOUT", "600"),
    }
    if "sf1" not in skip:
        ok &= _run(
            "sf1 value differential",
            [py, "tools/differential_sf1.py", "--out", "differential_sf1.json"],
            None,
            env=big,
        )
        _commit("differential_sf1.json")
    if "sf3" not in skip:
        ok &= _run(
            "sf3 value differential",
            [
                py, "tools/differential_sf1.py",
                "--sf-dir", os.path.join(_REPO, "benchdata", "sf3"),
                "--out", "differential_sf3.json",
            ],
            None,
            env=big,
        )
        _commit("differential_sf3.json")
    if "freshdraw" not in skip:
        ok &= _run(
            "fresh-draw cardinality differential",
            [
                py, "tools/differential_sf1.py",
                "--sf-dir", fresh_dir,
                "--out", f"differential_freshdraw_r{args.round}.json",
            ],
            None,
            env=big,
        )
        _commit(f"differential_freshdraw_r{args.round}.json")
    if "skew" not in skip:
        ok &= _run(
            "zipf-skew hot-key differential",
            [
                py, "tools/differential_sf1.py",
                "--sf-dir", skew_dir,
                "--out", f"differential_skew_r{args.round}.json",
            ],
            None,
            env=big,
        )
        _commit(f"differential_skew_r{args.round}.json")
    if "nulls" not in skip:
        ok &= _run(
            "null-injection differential",
            [
                py, "tools/differential_sf1.py",
                "--sf-dir", nulls_dir,
                "--out", f"differential_nulls_r{args.round}.json",
            ],
            None,
            env=big,
        )
        _commit(f"differential_nulls_r{args.round}.json")
    if "edge" not in skip:
        ok &= _run(
            "edge-value differential",
            [
                py, "tools/differential_sf1.py",
                "--sf-dir", edge_dir,
                "--out", f"differential_edge_r{args.round}.json",
            ],
            None,
            env=big,
        )
        _commit(f"differential_edge_r{args.round}.json")

    _summarize(args, ok)


def _summarize(args, ok: bool) -> None:
    summary = {}
    for label, path in [
        ("plan_lint", f"plan_lint_r{args.round}.json"),
        ("rounding_audit", f"rounding_audit_r{args.round}.json"),
        ("determinism", f"determinism_r{args.round}.json"),
        ("sf1", "differential_sf1.json"),
        ("sf3", "differential_sf3.json"),
        ("freshdraw", f"differential_freshdraw_r{args.round}.json"),
        ("skew", f"differential_skew_r{args.round}.json"),
        ("nulls", f"differential_nulls_r{args.round}.json"),
        ("edge", f"differential_edge_r{args.round}.json"),
    ]:
        try:
            d = json.load(open(os.path.join(_REPO, path)))
            summary[label] = {
                k: d[k]
                for k in ("n_queries", "n_green", "n_excluded", "n_red", "git_head", "git_dirty")
                if k in d
            }
        except (OSError, ValueError):
            summary[label] = "missing"
    print(json.dumps(summary, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
