"""Headroom regression for cuped_adjusted_means (r9, sf3 finding).

The sf3 value differential caught the former all-BIGINT CUPED
derivation raising ARITHMETIC_OVERFLOW: theta's numerator/denominator
n·Σpre·post − Σpre·Σpost were formed in long arithmetic, and at sf3's
30× user count n·Σpre² crossed 2^63.  The fix forms the product sums
in DECIMAL(38,0) and the theta terms in decimal (double only at the
final ratio), with the DuckDB twin mirrored in HUGEINT.

This test rebuilds the overflow regime synthetically — per-user cents
sized so n·Σpre² ≈ 6e20 ≫ 2^63 (the old code deterministically
raises; ANSI mode is on by default in Spark 4) — and asserts the
fixed operator returns values matching an EXACT plain-Python mirror
(integer arithmetic via Python bigints, double only at the final
ratio, the same derivation both engines use).  A second case pins a
small-magnitude corpus so the decimal path provably did not move the
already-green regime.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from lawfirm_data_pipeline_spark.operators.stats import cuped_adjusted_means


def _mirror(rows):
    """rows: (arm, pre_cents, post_cents) → {arm: (n, raw, adjusted)}
    via exact Python ints, double only at the final ratio — the same
    shape as the Spark/DuckDB derivations."""
    n = len(rows)
    sp = sum(r[1] for r in rows)
    so = sum(r[2] for r in rows)
    spp = sum(r[1] * r[1] for r in rows)
    spo = sum(r[1] * r[2] for r in rows)
    theta = float(n * spo - sp * so) / float(n * spp - sp * sp)
    pre_mean_global = sp / n
    out = {}
    for arm in sorted({r[0] for r in rows}):
        arm_rows = [r for r in rows if r[0] == arm]
        n_a = len(arm_rows)
        raw = sum(r[2] for r in arm_rows) / n_a
        pre_a = sum(r[1] for r in arm_rows) / n_a
        adj = raw - theta * (pre_a - pre_mean_global)
        out[arm] = (n_a, round(raw / 100.0, 6), round(adj / 100.0, 6))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "arm int, pre_cents long, post_cents long")
    got = {
        r["arm"]: (r["n_users"], r["raw_mean"], r["adjusted_mean"])
        for r in cuped_adjusted_means(df).collect()
    }
    want = _mirror(rows)
    assert set(got) == set(want)
    for arm in want:
        assert got[arm][0] == want[arm][0]
        assert got[arm][1] == pytest.approx(want[arm][1], abs=5e-7)
        assert got[arm][2] == pytest.approx(want[arm][2], abs=5e-7)


def test_cuped_survives_past_int64_theta_terms(spark):
    """n·Σpre² ≈ 6e20 > 2^63: the pre-fix long derivation raises
    ARITHMETIC_OVERFLOW here; the decimal path is exact."""
    # 600 users, pre ~1e9 cents each: spp ≈ 600·1e18 = 6e20;
    # n·spp ≈ 3.6e23 — both far beyond int64, well inside decimal(38).
    rows = [
        (
            i % 2,
            1_000_000_000 + 137 * i,
            900_000_000 + 211 * i + (17 if i % 2 else -23) * (i % 7),
        )
        for i in range(600)
    ]
    _run(spark, rows)
    # Sanity: the regime really is past int64 (the thing the old code
    # computed in long arithmetic).
    n = len(rows)
    spp = sum(r[1] * r[1] for r in rows)
    assert n * spp > 2**63


def test_cuped_small_magnitude_values_unchanged_by_decimal_path(spark):
    """The already-green regime: every intermediate fits a long, so
    exact-decimal → double must equal the former exact-long → double
    derivation (same exact integers, same nearest-double)."""
    rows = [(i % 2, 100 + 3 * i, 90 + 2 * i + (i % 5)) for i in range(50)]
    _run(spark, rows)
    # Cross-check the mirror itself against full-precision fractions:
    # theta from exact rationals, asserting the float derivation is
    # within an ulp-scale band of the true value.
    n = len(rows)
    sp = sum(r[1] for r in rows)
    so = sum(r[2] for r in rows)
    spp = sum(r[1] * r[1] for r in rows)
    spo = sum(r[1] * r[2] for r in rows)
    exact = Fraction(n * spo - sp * so, n * spp - sp * sp)
    assert float(n * spo - sp * so) / float(n * spp - sp * sp) == pytest.approx(
        float(exact), rel=1e-12
    )


def test_cuped_per_row_cents_past_1e18_no_cast_overflow(spark):
    """r10 ADVICE #2: the former DECIMAL(18,0) per-row casts raised
    ANSI ARITHMETIC_OVERFLOW once a single |cents| reached 1e18 —
    an undocumented ceiling TIGHTER than the documented product-sum
    1e27 bound.  DECIMAL(19,0) holds every BIGINT, so this regime
    (post ~2e18 per user, pre small, product sums ~8e23 << 1e27)
    must now complete and match the exact-integer mirror."""
    rows = [
        (i % 2, 100_000 + 7 * i, 2_000_000_000_000_000_000 + 311 * i)
        for i in range(4)
    ]
    assert all(abs(r[2]) >= 10**18 for r in rows)  # past the old ceiling
    spo = sum(r[1] * r[2] for r in rows)
    assert spo < 10**27  # inside the documented product-sum ceiling
    _run(spark, rows)
