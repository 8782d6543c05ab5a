"""The driver checks the FIRST 50 registry entries each round; pin them.

The round-7 window is the driver-green backlog's final tranche:
q188-q196 + q199-q201 + q209-q211 + q213-q220 + q222 + q269-q294
(README map, r6 verdict #1).  ``oracle.__init__._ROTATION_FRONT``
enforces this explicitly after imports; these tests fail loudly if an
import reshuffle, rename, or helper-import side effect perturbs the
window.
"""

from __future__ import annotations

import __spark_entry__ as e
from lawfirm_data_pipeline_spark.oracle import _ROTATION_FRONT


def test_round7_window_is_first_50():
    names = list(e.queries())
    assert names[:50] == _ROTATION_FRONT
    assert names[0] == "q188_jackknife_ci"
    assert names[49] == "q294_exact_auc"


def test_registry_size_frozen_at_299():
    # Registration freeze (r5 verdict #3): the 100-query driver backlog
    # fits exactly in rounds 6+7; new waves would push full coverage
    # past r7.  Bump this ONLY together with the README rotation map.
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
    would silently stall the driver-green backlog."""
    import glob
    import json
    import os

    # q270 sat in the r5 window *plan* but no driver row was ever
    # recorded (r6 verdict, §2.A note), so it is a first-check slot,
    # not a re-check; the set stays empty this round.  r8+: spend
    # freed slots re-verifying the oldest green rows (r6 verdict #7).
    _RECHECK_SLOTS: set[str] = set()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json"))):
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                green.add(name)
    assert green, "no CORRECTNESS files found — guard cannot run"
    stale = [n for n in _ROTATION_FRONT if n in green and n not in _RECHECK_SLOTS]
    assert not stale, (
        f"{len(stale)} window slots target already-driver-green queries "
        f"(advance _ROTATION_FRONT per the README map): {stale[:10]}"
    )


def test_prestaged_r8_window_is_the_stalest_greens():
    """The pre-staged r8 re-check window (oracle._ROTATION_NEXT_R8)
    must be exactly the 50 stalest driver-green queries by (last green
    round, registry number) — recomputed here from the on-disk
    CORRECTNESS files so the list cannot silently rot.  Queries whose
    only rows arrive with r7+ can never displace the r1/r2-era heads,
    so the list is stable across the r7 landing."""
    import glob
    import json
    import os
    import re

    from lawfirm_data_pipeline_spark.oracle import _ROTATION_NEXT_R8

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
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

    def qnum(n: str) -> int:
        return int(re.match(r"q(\d+)", n).group(1))

    stale = sorted(last, key=lambda n: (last[n], qnum(n), n))[:50]
    assert sorted(_ROTATION_NEXT_R8) == sorted(stale), (
        sorted(set(_ROTATION_NEXT_R8) - set(stale)),
        sorted(set(stale) - set(_ROTATION_NEXT_R8)),
    )
