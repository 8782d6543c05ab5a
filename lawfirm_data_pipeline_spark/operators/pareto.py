"""Skyline (Pareto frontier) queries without the quadratic dominance
join.

A 2-D skyline ("cheapest part at every size, keeping only
non-dominated price/size combinations") is textbook-defined as rows p
where no q has (cost <= p.cost AND gain >= p.gain) with one strict —
an O(n^2) NOT EXISTS self-join as written.  The distributed shape used
here is O(n) + a tiny window:

1. pre-aggregate min(cost) per gain value — map-side combinable, and
   the output cardinality is |distinct gain| (p_size has 50 values at
   any scale factor);
2. one window over that aggregate, ordered by gain DESC, computes the
   best cost among strictly-higher gains; a gain level survives iff its
   best cost strictly beats that (ties lose to the bigger gain, per the
   dominance definition);
3. join the surviving (gain, best_cost) levels back to the table to
   emit full skyline rows — equal-cost ties at a surviving level are
   mutually non-dominated and all kept.

The "No Partition Defined" window warning is expected and harmless:
it runs over the per-gain aggregate (bounded by the domain of the gain
column), never the raw table.  Costs are exact cents (BIGINT) per the
repo-wide discipline, so the frontier is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    cost_col: Column,
    gain_col: str,
    carry: list[str],
) -> DataFrame:
    """Rows minimizing ``cost_col`` while maximizing ``gain_col``:
    output = ``carry`` columns + (gain, cost_cents), one row per
    non-dominated input row."""
    tagged = df.select(*carry, F.col(gain_col).alias("gain"), cost_col.alias("cost"))
    per_gain = tagged.groupBy("gain").agg(F.min("cost").alias("best"))
    w = Window.orderBy(F.desc("gain")).rowsBetween(Window.unboundedPreceding, -1)
    # fresh column names break the tagged->survivors lineage so the
    # join-back is unambiguous (survivors descends from tagged)
    survivors = (
        per_gain.withColumn("best_above", F.min("best").over(w))
        .filter(F.col("best_above").isNull() | (F.col("best") < F.col("best_above")))
        .select(F.col("gain").alias("s_gain"), F.col("best").alias("s_best"))
    )
    return tagged.join(
        F.broadcast(survivors),
        (F.col("gain") == F.col("s_gain")) & (F.col("cost") == F.col("s_best")),
    ).select(*carry, "gain", F.col("cost").alias("cost_cents"))
