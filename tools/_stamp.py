"""Freshness stamp for census artifacts (r7 verdict, 'What's wrong' #1:
plan_lint_r7.json was committed carrying PRE-fix numbers because the
census predated a later code change).  Every census JSON records the
exact tree it measured — git HEAD plus a dirty flag — so a stale
artifact is detectable by anyone with ``git log``."""

from __future__ import annotations

import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
        out = {"git_head": head, "git_dirty": bool(porcelain)}
        if porcelain:
            # name what was dirty so a reader can judge materiality
            # (an untracked test file vs an edited operator)
            out["git_dirty_files"] = porcelain.splitlines()[:10]
        return out
    except Exception:  # noqa: BLE001 — censuses must finish without git
        return {"git_head": None, "git_dirty": None}
