"""Spec-level fuzz for q210 (consistent-hash vs mod reshard audit, m52).

An independent mirror re-derives the ring from the spec: md5-prefix
positions for keys ("key:<k>") and vnodes ("vn:<shard>:<v>"), a key
belongs to the first vnode clockwise — smallest (pos, shard) with
pos >= key pos, wrapping to the ring's global minimum — and the audit
compares 8- vs 9-shard assignments against plain mod.  The Spark plan
packs ring entries into pos*16+shard longs and folds each key over a
broadcast sorted-array literal; the packing, the wrap literal, and the
self-derived ring subset (ring8 = shard<9 entries with shard<8) are
exactly the kind of shared derivation both engines would get wrong
identically — the mirror walks the ring with hashlib and plain
comparisons instead.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_VNODES = 64


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _assign(kpos: int, ring: list[tuple[int, int]]) -> int:
    for pos, shard in ring:  # ring sorted by (pos, shard)
        if pos >= kpos:
            return shard
    return ring[0][1]


def _mirror(keys):
    keys = sorted(set(keys))
    ring9 = sorted(
        (_h(f"vn:{shard}:{v}"), shard)
        for shard in range(9)
        for v in range(_VNODES)
    )
    ring8 = [t for t in ring9 if t[1] < 8]
    moved_ch = sum(
        1
        for k in keys
        if _assign(_h(f"key:{k}"), ring8) != _assign(_h(f"key:{k}"), ring9)
    )
    moved_md = sum(1 for k in keys if k % 8 != k % 9)
    n = len(keys)
    return sorted(
        [
            ("consistent", n, moved_ch, round(moved_ch / n, 6)),
            ("mod", n, moved_md, round(moved_md / n, 6)),
        ]
    )


_keys = st.lists(
    st.integers(0, 2**40),
    min_size=1,
    max_size=60,
)


@SLOW
@given(_keys)
def test_q210_matches_spec_mirror(spark, monkeypatch, keys):
    import lawfirm_data_pipeline_spark.oracle.m52_sharding as m

    # duplicate keys in orders exercise the DISTINCT leg
    rows = [(i, k) for i, k in enumerate(keys + keys[:3])]
    df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["strategy"], r["n"], r["moved"], r["moved_share"])
        for r in m.q210_reshard_audit(spark, "unused").collect()
    )
    want = _mirror(keys)
    # moved_share is a round(double,6); compare at tolerance, rest exact
    assert [(a, b, c) for a, b, c, _ in got] == [(a, b, c) for a, b, c, _ in want]
    for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9
