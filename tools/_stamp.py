"""Freshness stamp for census artifacts (r7 verdict, 'What's wrong' #1:
plan_lint_r7.json was committed carrying PRE-fix numbers because the
census predated a later code change).  Every census JSON records the
exact tree it measured — git HEAD plus a dirty flag — so a stale
artifact is detectable by anyone with ``git log``."""

from __future__ import annotations

import os
import re
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# UNTRACKED outputs of the measurement run itself (r10): when several
# gate censuses run concurrently, each one's not-yet-committed output
# file would flip every sibling's dirty flag — but an untracked
# artifact JSON cannot change what the measured CODE was, so it is not
# "dirty" in the sense this stamp exists to catch.  Only these exact
# shapes are ignored, and only as '??' untracked; a MODIFIED tracked
# file (including a tracked artifact being overwritten) still counts.
_MEASUREMENT_OUTPUTS = re.compile(
    r"^\?\? ("
    r"plan_lint_r\d+\.json|"
    r"determinism(_sf\d+)?_r\d+\.json|"
    r"differential_[a-z0-9_]+\.json|"
    r"rounding_audit_r\d+\.json|"
    r"bench_sweep_[a-z0-9_]+\.json|"
    r"bench_queries\.json"
    r")$"
)


def git_stamp() -> dict:
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, cwd=_REPO,
        ).stdout.strip() or None
        porcelain = subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True, cwd=_REPO,
        ).stdout.strip()
        lines = [
            ln
            for ln in porcelain.splitlines()
            if not _MEASUREMENT_OUTPUTS.match(ln)
        ]
        out = {"git_head": head, "git_dirty": bool(lines)}
        if lines:
            # name what was dirty so a reader can judge materiality
            # (an untracked test file vs an edited operator)
            out["git_dirty_files"] = lines[:10]
        return out
    except Exception:  # noqa: BLE001 — censuses must finish without git
        return {"git_head": None, "git_dirty": None}
