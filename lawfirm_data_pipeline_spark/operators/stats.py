"""Column-level statistical profiling: exact correlation matrices.

Charter §2.C addition — the numeric-column screening step (feature
redundancy, leakage checks, drift comparison between snapshots) a data
pipeline runs before training consumers see the table.

``column_correlations`` computes every pairwise Pearson correlation in
ONE scan with ZERO shuffle: all co-moment sums (Σx, Σx², Σxy per pair)
are exact fixed-point integers accumulated in a single global
aggregate (decimal(38) sums — products of two 1e2-scaled doubles can
overflow int64 at corpus row counts), and the correlation formula is
evaluated once per pair from those exact sums in the final one-row
projection.  Output is long-form (col_x, col_y, n, corr) — the shape a
drift-diff join consumes.

``avg(x*y)``-style float accumulation would drift with partition
order; the fixed-point discipline makes the result bit-stable at any
parallelism and reproducible in ANSI SQL (the q99/q108 pattern, at
column rather than vector granularity).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 100  # inputs carry <= 2 decimals; exact at integer cents


def _fp(col: str):
    return F.round(F.col(col) * _SCALE).cast("long")


def column_correlations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation for every unordered column pair.

    One ``agg`` computes n, Σx and Σx² per column, and Σxy per pair —
    decimal(38,0) sums of int64 fixed-point products (exact).  The
    final projection assembles corr = (nΣxy − ΣxΣy) /
    √((nΣx²−Σx²)(nΣy²−Σy²)) per pair and explodes to long form.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(_fp(c).cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(
            F.sum((_fp(c) * _fp(c)).cast("decimal(38,0)")).alias(f"ss_{c}")
        )
    for a, b in combinations(cols, 2):
        aggs.append(
            F.sum((_fp(a) * _fp(b)).cast("decimal(38,0)")).alias(f"sp_{a}_{b}")
        )
    one = df.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("n").cast("double")
        sx, sy = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sxx, syy = F.col(f"ss_{a}").cast("double"), F.col(f"ss_{b}").cast("double")
        sxy = F.col(f"sp_{a}_{b}").cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return F.round(num / den, 6) + F.lit(0.0)

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").alias("n"),
                corr_expr(a, b).alias("corr"),
            )
            for a, b in combinations(cols, 2)
        ]
    )
    return one.select(F.explode(pairs).alias("p")).select(
        "p.col_x", "p.col_y", "p.n", "p.corr"
    )


def pca_explained_variance(
    embeddings: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """PCA spectrum audit from the exact covariance matrix: collect the
    d(d+1)/2 covariance entries (O(d²) scalars — driver-side
    eigendecomposition of a d×d matrix is the one place driver math is
    the RIGHT call: cost is independent of corpus size), eigendecompose,
    and emit a one-row verdict summary the oracle can value-check.

    Output: ``(n_components, trace, trace_matches_eigsum,
    ratios_in_bounds, ratios_sum_ok)`` — ``trace`` is exactly
    SQL-reproducible (sum of the fixed-point per-dimension variances,
    the q108 diagonal), and the eigen-side facts that SQL cannot
    compute are gated as verdict booleans (trace == Σλ is the
    eigendecomposition's own consistency check).
    """
    import numpy as np

    from .similarity import embedding_covariance

    rows = embedding_covariance(embeddings, dim=dim, vec_col=vec_col).collect()
    cov = np.zeros((dim, dim))
    for r in rows:
        cov[r.i, r.j] = cov[r.j, r.i] = r.cov
    eig = np.linalg.eigvalsh(cov)[::-1]
    # trace via exact fixed point (entries carry 6 decimals): a float
    # sum's order differs between numpy and the SQL twin's aggregate
    trace = round(sum(int(round(cov[i, i] * 1e6)) for i in range(dim)) / 1e6, 4)
    ratios = eig / eig.sum()
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [
            (
                dim,
                trace,
                bool(abs(eig.sum() - trace) <= 1e-4 * max(trace, 1e-12) + 1e-4),
                bool((ratios > -1e-12).all() and ratios.max() <= 1.0),
                bool(abs(ratios.sum() - 1.0) <= 1e-9),
            )
        ],
        "n_components int, trace double, trace_matches_eigsum boolean, "
        "ratios_in_bounds boolean, ratios_sum_ok boolean",
    )
