"""Spec-level fuzz for q292 (3-round GBDT stumps, m93).

An independent Python mirror re-derives the greedy boosting trace —
bucket sums, prefix-split candidates (t < bmax), the IEEE score argmax
with (score desc, f, t) tie-break, floor-toward-minus-inf leaf means on
(possibly negative) residuals, and the post-round L1 — from the spec.
Both the Spark plan and the DuckDB oracle share the derivation, so the
differential cannot catch a shared mistake in the tie-break or the
negative-leaf floor; this mirror can."""

from __future__ import annotations

import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_US_2024 = 1_704_067_200_000_000
_ROUNDS = 3


def _mirror(rows):
    """rows: (uid, hour, cents) already user_id%3==1-filtered.
    Returns [(round, feature, threshold, leaf_l, leaf_r, l1)]."""
    cur = [(u % 32, h, c * 1000) for u, h, c in rows]
    out = []
    for r in range(1, _ROUNDS + 1):
        stot = sum(res for _, _, res in cur)
        ntot = len(cur)
        buckets = defaultdict(lambda: [0, 0])
        for x1, x2, res in cur:
            for f, b in (("x1", x1), ("x2", x2)):
                buckets[(f, b)][0] += res
                buckets[(f, b)][1] += 1
        cands = []
        for f in ("x1", "x2"):
            bs = sorted(b for (ff, b) in buckets if ff == f)
            sl = nl = 0
            for b in bs:
                s, n = buckets[(f, b)]
                sl += s
                nl += n
                if b < bs[-1]:
                    cands.append((f, b, sl, nl, stot - sl, ntot - nl))
        if not cands:
            return out  # degenerate: no legal split, trace ends
        def score(c):
            _f, _t, sl, nl, sr, nr = c
            return float(sl) * float(sl) / float(nl) + float(sr) * float(sr) / float(nr)
        best = min(cands, key=lambda c: (-score(c), c[0], c[1]))
        f, t, sl, nl, sr, nr = best
        leaf_l = math.floor(float(sl) / float(nl))
        leaf_r = math.floor(float(sr) / float(nr))
        cur = [
            (
                x1,
                x2,
                res
                - (
                    leaf_l
                    if (f == "x1" and x1 <= t) or (f == "x2" and x2 <= t)
                    else leaf_r
                ),
            )
            for x1, x2, res in cur
        ]
        l1 = sum(abs(res) for _, _, res in cur)
        out.append((r, f, t, leaf_l, leaf_r, l1))
    return out


# uid % 3 == 1 (query filter); tiny bucket domains force ties; cents
# may be negative (negative-residual floor is the hard case)
_rows = st.lists(
    st.tuples(
        st.sampled_from([1, 4, 7, 34]),   # uid -> x1 in {1, 4, 7, 2}
        st.integers(0, 3),                # hour -> x2
        st.integers(-50, 50),             # cents
    ),
    min_size=2,
    max_size=30,
).filter(
    lambda rs: len({u % 32 for u, _, _ in rs}) > 1 or len({h for _, h, _ in rs}) > 1
)


@SLOW
@given(_rows)
def test_q292_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m93_gbdt_stumps as m

    df = spark.createDataFrame(
        [
            (i, u, _US_2024 + h * 3_600_000_000 + i, "click", c / 100.0)
            for i, (u, h, c) in enumerate(rows)
        ],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (
            r["round"],
            r["feature"],
            r["threshold"],
            r["leaf_l_milli"],
            r["leaf_r_milli"],
            r["l1_residual_after"],
        )
        for r in m.q292_gbdt_stumps(spark, "unused").collect()
    )
    assert got == _mirror(rows)
