"""The driver checks the FIRST 50 registry entries each round; pin them.

With CORRECTNESS_r07 landed the whole 299-query registry is
driver-green, so from round 8 on the window is a RE-CHECK quota: the
50 stalest greens by (last green driver round, registry number), per
the r7 verdict task #1.  ``oracle.__init__._ROTATION_FRONT`` enforces
the ordering explicitly after imports; these tests fail loudly if an
import reshuffle, rename, or helper-import side effect perturbs the
window — or if a round boundary passes without advancing it.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as e
from lawfirm_data_pipeline_spark.oracle import _ROTATION_FRONT, _ROTATION_NEXT_R9

# Every r8 slot is a deliberate re-check of an already-green query
# (r7 verdict task #1): the window IS the re-check quota.
_RECHECK_SLOTS: set[str] = set(_ROTATION_FRONT)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_last_round() -> dict[str, int]:
    """name -> latest driver round with a fully-green row, from disk."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _staleness_order(last: dict[str, int]) -> list[str]:
    def qnum(n: str) -> int:
        return int(re.match(r"q(\d+)", n).group(1))

    return sorted(last, key=lambda n: (last[n], qnum(n), n))


def test_round8_window_is_first_50():
    names = list(e.queries())
    assert names[:50] == _ROTATION_FRONT
    assert names[0] == "q01_pricing_summary"
    assert names[49] == "q75_transaction_commit"


def test_registry_size_frozen_at_299():
    # Registration freeze (r5 verdict #3): the driver backlog completed
    # at r7 with exactly 299 driver-green queries.  Bump this ONLY
    # together with the README rotation map.
    assert len(e.queries()) == 299


def test_recheck_delegates_resolved_to_canonical_modules():
    qs = e.queries()
    assert qs["q38_lsh_ann_topk"].__module__.endswith("m6_similarity")
    assert qs["q69b_ivf_ann_nprobe"].__module__.endswith("m11_sql_kit")


def test_every_window_query_has_oracle_sql():
    sqls = e.oracle_sql()
    missing = [n for n in _ROTATION_FRONT if n not in sqls]
    assert not missing, f"window queries without SQL oracle: {missing}"


def test_window_spends_slots_on_never_green_queries():
    """Rotation-freshness guard: every window slot must target a query
    with NO green driver row in any on-disk CORRECTNESS_r0*.json —
    except slots listed in _RECHECK_SLOTS (deliberate re-checks, per
    the README map).  At the start of a new round this test fails
    loudly if the previous round's window was left pinned, which is
    exactly the 'forgot to advance the rotation' failure mode that
    would silently stall the driver-green backlog.  From r8 on the
    registry is fully green, so the whole window is a re-check quota;
    test_recheck_window_is_the_stalest_greens below carries the
    freshness burden instead."""
    green = set(_green_last_round())
    assert green, "no CORRECTNESS files found — guard cannot run"
    stale = [n for n in _ROTATION_FRONT if n in green and n not in _RECHECK_SLOTS]
    assert not stale, (
        f"{len(stale)} window slots target already-driver-green queries "
        f"(advance _ROTATION_FRONT per the README map): {stale[:10]}"
    )


def test_recheck_window_is_the_stalest_greens():
    """The re-check window must be exactly the 50 stalest driver-green
    queries by (last green round, registry number) — recomputed from
    the on-disk CORRECTNESS files so the list cannot silently rot.
    This is the round-boundary tripwire for the re-check era: once
    CORRECTNESS_r08 lands green rows for this window, these queries
    stop being the stalest and the r9 opener must swap in
    _ROTATION_NEXT_R9."""
    last = _green_last_round()
    assert last, "no CORRECTNESS files found — guard cannot run"
    stale = _staleness_order(last)[:50]
    assert sorted(_ROTATION_FRONT) == sorted(stale), (
        sorted(set(_ROTATION_FRONT) - set(stale)),
        sorted(set(stale) - set(_ROTATION_FRONT)),
    )


def test_prestaged_r9_window_is_the_next_stalest_greens():
    """The pre-staged r9 window must be the next-50 stalest greens
    AFTER the current window's slots are excluded (equivalently:
    staleness ranks 51-100 today; exactly the stalest 50 once
    CORRECTNESS_r08 re-greens the current window).  Recomputed from
    disk so the list cannot rot."""
    last = _green_last_round()
    order = [n for n in _staleness_order(last) if n not in _RECHECK_SLOTS]
    expect = order[:50]
    assert sorted(_ROTATION_NEXT_R9) == sorted(expect), (
        sorted(set(_ROTATION_NEXT_R9) - set(expect)),
        sorted(set(expect) - set(_ROTATION_NEXT_R9)),
    )
