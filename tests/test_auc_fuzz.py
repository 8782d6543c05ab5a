"""Hypothesis fuzz for the distributed exact-AUC kernel (m94).

The Mann-Whitney form with tie-averaged ranks must equal the
DEFINITIONAL pairwise statistic

    AUC = ( #(score⁺ > score⁻) + ½·#(score⁺ = score⁻) ) / (n⁺ n⁻)

for every labeled multiset.  The sf0.01 oracle differential shares the
rank formulation with the Spark plan, so a tie-handling mistake could
pass it on both sides; the O(n²) mirror here is derivation-independent
(the fuzz-finds-what-oracles-miss pattern, SURVEY §5.15)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.oracle.m94_nb_auc import exact_auc

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# tiny score domain => heavy ties, the hard case; labels free
_pairs = st.lists(
    st.tuples(st.integers(0, 1), st.integers(-3, 3)),
    min_size=2,
    max_size=60,
).filter(lambda xs: any(y == 1 for y, _ in xs) and any(y == 0 for y, _ in xs))


def _brute(pairs):
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return len(pos), len(neg), Fraction(2 * wins + ties, 2 * len(pos) * len(neg))


@SLOW
@given(_pairs)
def test_exact_auc_matches_pairwise_definition(spark, pairs):
    df = spark.createDataFrame(pairs, "y int, score long")
    row = exact_auc(df).collect()[0]
    npos, nneg, want = _brute(pairs)
    assert (row["npos"], row["nneg"]) == (npos, nneg)
    # the kernel's one IEEE division of exact integers == float(Fraction)
    assert row["auc"] == float(want)


def test_exact_auc_all_tied_is_half(spark):
    df = spark.createDataFrame([(1, 5), (0, 5), (1, 5), (0, 5)], "y int, score long")
    row = exact_auc(df).collect()[0]
    assert row["auc"] == 0.5
