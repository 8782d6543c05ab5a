"""Null-semantics conventions (r12 NULL-injection axis).

The first null-injected differential (benchdata/freshdraw_sf1_s4254_
nulls0.1 — measure/attribute columns at 5-10% NULL, keys non-null)
found 8 reds in 300 queries, in four classes, each closed by an
explicit engine-mirrored convention:

1. WINDOW NULL ORDERING — Spark sorts NULLS FIRST on ASC while
   DuckDB's default_null_order is nulls_last for BOTH directions, so
   any window/rank ASC-ordered by a nullable column diverges (DESC
   agrees: both nulls-last).  Convention: the SQL twin carries an
   explicit NULLS FIRST wherever its ASC ordering column is nullable
   (q48/q60/q64/q290).
2. AGREEMENT COUNTS — ``sum(CASE WHEN a=b THEN 1 ELSE 0 END)`` yields
   0 for NULL comparisons while ``F.sum((a==b).cast("int"))`` yields
   NULL.  Convention: engine uses when().otherwise(0) (q186).
3. SAMPLE = OBSERVED — statistical kernels (OLS slope, trimmed mean,
   AUC) define their sample as non-null observations; both sides
   filter IS NOT NULL so count(*) cannot mix denominators with
   null-skipping sums (q278/q286/q294).
4. ELECTIONS over nullable candidates — majority-vote tie-breaks order
   the candidate value ASC; convention #1 applies (q290: a null-seg
   vote tying a real segment's count must elect alike on both
   engines).

These pins exercise each convention on crafted null-bearing frames so
a refactor cannot silently drop them.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_spark_vs_duckdb_null_order_defaults_differ():
    """The premise of convention #1, pinned against both engines: if
    either default changes, the mirror rule must be revisited."""
    con = duckdb.connect()
    duck_asc = [
        r[0] for r in con.execute(
            "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x"
        ).fetchall()
    ]
    assert duck_asc == [1, 2, None]  # DuckDB ASC: nulls LAST
    duck_desc = [
        r[0] for r in con.execute(
            "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x DESC"
        ).fetchall()
    ]
    assert duck_desc == [2, 1, None]  # DuckDB DESC: nulls LAST too


def test_spark_asc_defaults_nulls_first(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "x int")
    got = [r["x"] for r in df.orderBy("x").collect()]
    assert got == [None, 1, 2]  # Spark ASC: nulls FIRST
    got_desc = [r["x"] for r in df.orderBy(F.desc("x")).collect()]
    assert got_desc == [2, 1, None]  # Spark DESC: nulls LAST (agrees)


def test_rank_over_nullable_asc_matches_with_nulls_first(spark):
    """A row_number over an ASC nullable key: engine default == twin
    with explicit NULLS FIRST (the q48/q60/q64 fix shape)."""
    rows = [(1, 10.0), (1, None), (1, 5.0), (2, None), (2, 1.0)]
    df = spark.createDataFrame(rows, "g int, v double")
    w = Window.partitionBy("g").orderBy("v", "g")
    got = {
        (r["g"], r["v"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g int, v double)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        (g, v): rn
        for g, v, rn in con.execute(
            "SELECT g, v, row_number() OVER (PARTITION BY g "
            "ORDER BY v NULLS FIRST, g) FROM t"
        ).fetchall()
    }
    assert got == want
    # and WITHOUT the qualifier they genuinely disagree (premise check)
    bare = {
        (g, v): rn
        for g, v, rn in con.execute(
            "SELECT g, v, row_number() OVER (PARTITION BY g "
            "ORDER BY v, g) FROM t"
        ).fetchall()
    }
    assert bare != want


def test_agree_count_null_comparison_is_zero(spark):
    """Convention #2 (q186): a NULL label comparison counts as NOT
    agreeing — sum is 0, never NULL."""
    df = spark.createDataFrame(
        [(1, None, 1), (1, None, 2), (2, 3, 3), (2, None, 3)],
        "q int, label int, qlabel int",
    )
    agree = F.sum(
        F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
    ).cast("long")
    got = {r["q"]: r["n"] for r in df.groupBy("q").agg(agree.alias("n")).collect()}
    # all-null group is 0 (not None); null comparisons add 0
    assert got == {1: 0, 2: 1}
    # and the OLD form (bare cast) really did return NULL for group 1
    old = F.sum((F.col("label") == F.col("qlabel")).cast("int")).cast("long")
    bad = {r["q"]: r["n"] for r in df.groupBy("q").agg(old.alias("n")).collect()}
    assert bad[1] is None


def test_observed_sample_kernels_drop_null_measures(spark, tmp_path):
    """Convention #3: q278/q286/q294 results over a corpus WITH null
    measures equal the same query over the corpus with those rows
    removed (sample = observed)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n = 400
    user = rng.integers(0, 3, n) * 29  # users divisible by 29
    val = np.round(rng.uniform(0, 500, n), 2)
    null_mask = rng.uniform(0, 1, n) < 0.2
    ts = pa.array(
        np.datetime64("2024-01-01", "us")
        + (rng.uniform(0, 30, n) * 86_400e6).astype("int64").astype("timedelta64[us]")
    )

    def write(dirname, drop):
        d = tmp_path / dirname
        d.mkdir()
        keep = ~null_mask if drop else np.ones(n, bool)
        value = pa.array(val[keep])
        if not drop:
            value = pa.array(
                [None if m else float(v) for v, m in zip(val, null_mask)],
                type=pa.float64(),
            )
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n)[keep], type=pa.int64()),
                "ts": ts.take(pa.array(np.flatnonzero(keep))),
                "user_id": pa.array(user[keep], type=pa.int64()),
                "event_type": pa.array(["view"] * int(keep.sum())),
                "value": value,
                "props": pa.array(["{}"] * int(keep.sum())),
            }
        )
        pq.write_table(t, str(d / "events.parquet"))
        return str(d)

    import __spark_entry__ as e

    with_nulls = write("with_nulls", drop=False)
    observed = write("observed", drop=True)
    fn = e.queries()["q278_grouped_ols_slopes"]
    a = sorted(map(tuple, fn(spark, with_nulls).collect()))
    b = sorted(map(tuple, fn(spark, observed).collect()))
    assert a == b and a  # same answer, and the group survives
