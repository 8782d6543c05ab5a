"""The driver checks the FIRST 50 registry entries each round; pin them.

With CORRECTNESS_r07 landed the whole registry became driver-green, so
from round 8 on the window is a RE-CHECK quota: the 50 stalest queries
by (last green driver round, registry number), per the r7 verdict task
#1.  ``oracle.__init__._ROTATION_FRONT`` enforces the ordering
explicitly after imports; these tests fail loudly if an import
reshuffle, rename, or helper-import side effect perturbs the window —
or if a window survives PAST one round boundary.

NEVER-GREEN FIX (r10 verdict task #1): a query with NO green driver
row in any CORRECTNESS file ranks stalest-of-all (last-green round 0),
so a freshly registered query cannot stay invisible to the staleness
ordering forever.  ``test_window_spends_slots_on_never_green_queries``
now FAILS when a never-green query exists but is left OUT of the
window — the r10 suite passed in that state, which inverted the
guard's purpose (q295 was registered r10 with no driver row and the
old ordering, computed over greens only, could never select it).

Boundary semantics (r8 verdict task #7): when CORRECTNESS_rN lands
green rows for the pinned window, those slots stop being the stalest.
That exactly-one-boundary state is ACCEPTED (the window equals the
just-greened latest-file names and was not also the previous file's
window), so the suite is green at every commit; a window that is
re-checked twice in a row — i.e. left pinned past a boundary — still
fails loudly.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as e
from lawfirm_data_pipeline_spark.oracle import (
    _ROTATION_FRONT,
    _ROTATION_NEXT_R14,
    _VERDICT_PRIORITY_R13,
)

# Cumulative driver-green has been 300/300 since r11, so all 50 r13
# slots are deliberate re-checks (re-check era, r7 verdict task #1).
_RECHECK_SLOTS: set[str] = set(_ROTATION_FRONT)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_rows_by_round() -> dict[int, set[str]]:
    """round -> set of names with a fully-green row in that round's file."""
    rounds: dict[int, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
        greens = set()
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                greens.add(name)
        rounds[rnd] = greens
    return rounds


def _green_last_round() -> dict[str, int]:
    """name -> latest driver round with a fully-green row, from disk."""
    last: dict[str, int] = {}
    for rnd, greens in _green_rows_by_round().items():
        for name in greens:
            last[name] = max(last.get(name, 0), rnd)
    return last


def _staleness_order(last: dict[str, int]) -> list[str]:
    """ALL registry names sorted stalest-first.

    Never-green queries (no row in `last`) rank round 0 — stalest of
    all — so a new registration is guaranteed a window slot at the
    next swap (r10 verdict task #1's blind-spot fix)."""

    def qnum(n: str) -> int:
        return int(re.match(r"q(\d+)", n).group(1))

    names = list(e.queries())
    return sorted(names, key=lambda n: (last.get(n, 0), qnum(n), n))


def test_round13_window_is_first_50():
    names = list(e.queries())
    assert names[:50] == _ROTATION_FRONT
    assert names[0] == "q38_lsh_ann_topk"
    assert names[12] == "q239_kmv_union"
    assert names[13] == "q188_jackknife_ci"
    assert names[49] == "q281_stratified_split"


def test_registry_size_frozen_at_300():
    # Registration freeze (r5 verdict #3): the driver backlog completed
    # at r7 with exactly 299 driver-green queries; round 10 added q295
    # (baseline JPEG decode, m95 — the codec family's last honest gap,
    # r9 verdict task #8).  Bump this ONLY together with the README
    # rotation map.
    assert len(e.queries()) == 300


def test_recheck_delegates_resolved_to_canonical_modules():
    qs = e.queries()
    assert qs["q38_lsh_ann_topk"].__module__.endswith("m6_similarity")
    assert qs["q69b_ivf_ann_nprobe"].__module__.endswith("m11_sql_kit")


def test_every_window_query_has_oracle_sql():
    sqls = e.oracle_sql()
    missing = [n for n in _ROTATION_FRONT if n not in sqls]
    assert not missing, f"window queries without SQL oracle: {missing}"


def test_window_spends_slots_on_never_green_queries():
    """Rotation-freshness guard, TIGHTENED per the r10 verdict: every
    registry query with NO green driver row in any on-disk
    CORRECTNESS_r0*.json MUST hold a window slot — the window's first
    job is first-rows, re-checks only fill what's left.  (The pre-r11
    version only checked the converse — that green slots were declared
    re-checks — and so PASSED while never-green q295 sat outside the
    window, inverting its stated purpose.)"""
    green = set(_green_last_round())
    assert green, "no CORRECTNESS files found — guard cannot run"
    never_green = [n for n in e.queries() if n not in green]
    left_out = [n for n in never_green if n not in _ROTATION_FRONT]
    assert not left_out, (
        f"{len(left_out)} never-driver-checked queries have no window "
        f"slot — they can never earn a CORRECTNESS row: {left_out[:10]}"
    )
    # And the original direction: any green slot must be a declared
    # re-check, so the window can't silently waste first-row capacity.
    stale = [n for n in _ROTATION_FRONT if n in green and n not in _RECHECK_SLOTS]
    assert not stale, (
        f"{len(stale)} window slots target already-driver-green queries "
        f"not declared as re-checks: {stale[:10]}"
    )


def test_recheck_window_is_the_stalest_greens():
    """The window must be exactly VERDICT-PRIORITY slots first, then
    the stalest fill by (last green round, registry number) —
    never-green ranking stalest-of-all — recomputed from the on-disk
    CORRECTNESS files so the list cannot silently rot.

    PRIORITY OVERRIDE (r12 verdict task #4): a round's verdict may name
    specific queries the driver must re-hash (rewritten paths with no
    independent driver row since the rewrite); those take the leading
    slots and the staleness rule fills the remainder.  With an empty
    priority list this reduces to the pure stalest-50 rule of r8-r12.

    BOUNDARY TOLERANCE (r8 verdict task #7): the exactly-one-boundary
    state — the pinned window just greened by the LATEST correctness
    file, pending its swap — also passes, provided the SAME window was
    not also the previous round's re-check (which would mean it
    survived past a boundary).  So the suite is green at every commit,
    while a stale window still trips after one full round."""
    rounds = _green_rows_by_round()
    assert rounds, "no CORRECTNESS files found — guard cannot run"
    last = _green_last_round()
    priority = list(_VERDICT_PRIORITY_R13)
    fill = [n for n in _staleness_order(last) if n not in set(priority)]
    stale = set(priority + fill[: 50 - len(priority)])
    front = set(_ROTATION_FRONT)
    if front == stale:
        return  # normal mid-round state: window IS priority + stalest fill

    # Boundary state: window was just greened by the latest file …
    ordered = sorted(rounds)
    latest = rounds[ordered[-1]]
    assert front <= latest, (
        "window is neither the stalest-50 nor fully green in the latest "
        "CORRECTNESS file",
        sorted(front - stale)[:10],
        sorted(stale - front)[:10],
    )
    # … and was NOT also the previous round's window (re-checked twice
    # in a row == survived past a boundary == forgot to advance).
    prev = rounds[ordered[-2]] if len(ordered) > 1 else set()
    assert not front <= prev, (
        "window was re-greened by BOTH of the last two driver rounds — "
        "it survived past a round boundary; swap in the pre-staged next "
        "window (oracle/__init__.py)"
    )


def test_prestaged_next_window_is_the_next_stalest():
    """The pre-staged r14 window must be the next-50 stalest AFTER the
    current window's slots are excluded (no r14 verdict priority exists
    yet; if one lands, this list gets the same priority-first treatment
    at swap time).  Recomputed from disk so the list cannot rot."""
    last = _green_last_round()
    front = set(_ROTATION_FRONT)
    order = [n for n in _staleness_order(last) if n not in front]
    expect = order[:50]
    assert sorted(_ROTATION_NEXT_R14) == sorted(expect), (
        sorted(set(_ROTATION_NEXT_R14) - set(expect)),
        sorted(set(expect) - set(_ROTATION_NEXT_R14)),
    )
