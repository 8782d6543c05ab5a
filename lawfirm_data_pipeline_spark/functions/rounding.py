"""Engine-stable rounding for hash-gated cross-engine comparisons.

Spark's ``round(double, d)`` rounds the double's shortest DECIMAL REPR
(``BigDecimal.valueOf`` semantics: 1.005 → 1.01) while DuckDB's rounds
the BINARY value (1.005 is 1.00499999999999989… → 1.00) — the two
engines split exactly on values whose shortest repr terminates with a
'5' at digit d+1, which real pipelines hit constantly (µs timestamps
÷ 1e6, cents ÷ 2 medians, leave-one-out means — the r10 q144/q266
incidents).  The repo convention is therefore: **no engine round() on
a double may reach a hashed output**; paired sites use the SAME IEEE
expression on both engines — binary-floor — which cannot split because
both sides execute identical operations on identical doubles.

``bfround`` / ``bfround_sql`` are that convention with its edge cases
closed (plain ``floor(x*1e6+0.5)/1e6`` is NOT safe standalone):

* Spark's ``floor(double)`` returns LONG and silently SATURATES
  (NaN → 0, ±Inf/overflow → ±long.max) while DuckDB's stays double
  (NaN → NaN, Inf → Inf) — guarded by the isnan/abs() identity branch.
* Past ``2^53 / 10^d`` the product ``x*10^d`` exceeds exact-integer
  double range; mathematically round(x, d) == x there (the value grid
  is coarser than 10^-d), so the guard returns x identically on both
  engines instead of tripping Spark's long saturation.
* The guard constant is the SAME Python-computed double on both sides
  (emitted by repr into the SQL), so the branch choice can't split.

Ties at d+1 resolve toward +infinity (floor(x+0.5) semantics) — NOT
half-away-from-zero — identically on both engines; the differential
convention cares about cross-engine equality, not tie direction.

Pinned cross-engine by ``tests/test_rounding_convention.py``; audited
over every registered query's analyzed plan by
``tools/rounding_audit.py`` (zero Round/BRound-on-double nodes may
remain in paired positions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TWO53 = float(2.0**53)


def bfround(col: Column | str, d: int = 0) -> Column:
    """Binary-floor round of a DOUBLE column to ``d`` decimal places,
    engine-stable against the DuckDB twin built by ``bfround_sql``.

    Accepts a column name like ``F.round`` does — a bare str must be
    resolved here or ``str * Column`` silently builds ``lit(name)``
    (the string becomes data, not a reference)."""
    if isinstance(col, str):
        col = F.col(col)
    p = float(10.0**d)
    lim = _TWO53 / p
    return F.when(F.isnan(col) | (F.abs(col) >= F.lit(lim)), col).otherwise(
        F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)
    )


def bfround_sql(expr: str, d: int = 0) -> str:
    """The DuckDB-side twin of :func:`bfround`: identical IEEE ops,
    identical guard constant, for splicing into oracle SQL strings."""
    p = f"1e{d}"
    lim = repr(_TWO53 / float(10.0**d))
    b = f"CAST(({expr}) AS DOUBLE)"
    return (
        f"CASE WHEN isnan({b}) OR abs({b}) >= {lim} THEN {b} "
        f"ELSE floor({b} * {p} + 0.5) / {p} END"
    )
