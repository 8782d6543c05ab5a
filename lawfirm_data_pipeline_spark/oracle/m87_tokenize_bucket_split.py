"""M87 — round-5 wave 8: greedy subword tokenization, bucketed joins,
exact stratified splits.

q279 — WordPiece-style GREEDY LONGEST-MATCH tokenization: the apply
half of the tokenizer loop q147/q248 opened (BPE learns merges; a
serving tokenizer segments by longest vocab prefix at each position).
Sequential-looking, but the position walk is bounded by max word
length, so the engine unrolls it into 12 static joins over a
precomputed (word, pos) → longest-match table — every step a plain
equi-join over the distinct-word dictionary, no recursion, no UDF.
The oracle runs DuckDB's WITH RECURSIVE over the same match table:
two independent executions of the same derivation.

q280 — bucketed co-located join (operators/bucketing): the 100 TB
answer to "every FK join reshuffles the fact table".  Both sides are
written bucketed by the join key; the revenue join then runs WITHOUT
an Exchange on either side (plan-pinned in tests/test_bucketing.py)
and its cents total must equal the plain-SQL join.

q281 — deterministic stratified split with EXACT per-stratum
proportions: md5-rank within stratum, 80/10/10 by rank thresholds
computed from the stratum size (floor arithmetic) — reproducible
across runs/engines, never a Bernoulli approximation.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..queries import query
from ._shared import LTOKS_SQL as _LTOKS
from lawfirm_data_pipeline_spark.functions.rounding import bfround

# 26 single letters guarantee termination; multi-char entries make the
# greedy choice nontrivial.
_VOCAB = (
    "the th he she her an and nd ing in ng ion on er re ed es st ti te "
    "at en to or ar al is it ou ll "
    "a b c d e f g h i j k l m n o p q r s t u v w x y z"
).split()
_MAXLEN = 12


def _vocab_sql() -> str:
    return " UNION ALL ".join(f"SELECT '{v}' AS v" for v in _VOCAB)


@query(
    "q279_greedy_wordpiece",
    f"""
    WITH RECURSIVE vocab AS ({_vocab_sql()}),
    words AS (
        SELECT DISTINCT w FROM (SELECT unnest({_LTOKS}) AS w FROM documents)
        WHERE regexp_full_match(w, '[a-z]{{1,{_MAXLEN}}}')
    ),
    pos AS (SELECT w, t.i FROM words,
            unnest(generate_series(1, length(w))) AS t(i)),
    matches AS (
        SELECT pos.w, pos.i, max(length(vocab.v)) AS ml
        FROM pos JOIN vocab
          ON substring(pos.w, pos.i, length(vocab.v)) = vocab.v
        GROUP BY pos.w, pos.i
    ),
    walk(w, p, n) AS (
        SELECT w, 1, 0 FROM words
        UNION ALL
        SELECT m.w, walk.p + m.ml, walk.n + 1
        FROM walk JOIN matches m ON m.w = walk.w AND m.i = walk.p
    )
    SELECT w AS word, CAST(n AS BIGINT) AS n_tokens
    FROM walk WHERE p = length(w) + 1
    """,
)
def q279_greedy_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match segmentation as ONE fold: precompute the
    longest vocab match per (word, position) in one explode + join +
    max, collect each word's per-position match lengths into a sorted
    array, then walk positions with a single JVM ``aggregate`` over a
    MAXLEN step sequence — p += ml[p] while p <= len, counting steps.
    Single-letter vocab entries guarantee the walk always advances, so
    MAXLEN steps always reach the end of a MAXLEN-bounded word.

    Replaces the previous MAXLEN-static-join unroll, whose ``done``
    union re-evaluated the match subtree in every branch (~78 join
    executions; 3.2 s in-sweep) with zero iterative joins: explode →
    broadcast vocab join → two combinable groupBys → codegen'd fold.
    """
    from ..operators.text import tokenized

    docs = load_table(spark, sf_dir, "documents")
    words = (
        tokenized(docs)
        .select(F.explode("toks").alias("w"))
        .filter(F.col("w").rlike(f"^[a-z]{{1,{_MAXLEN}}}$"))
        .distinct()
    )
    # JVM literal relation (not createDataFrame): avoids Python-backed
    # local-relation roundtrips on materialization.
    vocab = spark.sql(
        "SELECT explode(array("
        + ", ".join(f"'{v}'" for v in _VOCAB)
        + ")) AS v"
    )
    pos = words.select(
        "w", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i")
    )
    # ms[k] = longest vocab match length at position k (1-based via
    # array_sort on the (i, ml) struct; every position matches at least
    # its own single-letter entry, so the array is dense).
    ms = (
        pos.join(
            F.broadcast(vocab),
            F.expr("substring(w, i, length(v)) = v"),
        )
        .groupBy("w", "i")
        .agg(F.max(F.length("v")).alias("ml"))
        .groupBy("w")
        .agg(F.array_sort(F.collect_list(F.struct("i", "ml"))).alias("ms"))
    )
    walk = ms.select(
        "w",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(_MAXLEN)),
            F.struct(F.lit(1).alias("p"), F.lit(0).alias("n")),
            lambda acc, _: F.when(
                acc["p"] <= F.length("w"),
                F.struct(
                    (acc["p"] + F.try_element_at("ms", acc["p"])["ml"]).alias("p"),
                    (acc["n"] + 1).alias("n"),
                ),
            ).otherwise(acc),
        ).alias("st"),
    )
    return walk.filter(F.col("st.p") == F.length("w") + 1).select(
        F.col("w").alias("word"), F.col("st.n").cast("long").alias("n_tokens")
    )


_BUCKETED_TABLE_CACHE: dict[tuple[str, str], tuple[str, str]] = {}

# Leftover bucketed-table dirs older than this are garbage from a dead
# session (tags fold the applicationId in, so no live session can own
# them after a restart) and get reclaimed before writing new ones.
_STALE_BUCKET_DIR_SECONDS = 24 * 3600


def _own_bucket_table_dirs(spark: SparkSession) -> set[str]:
    """Lower-cased dir names of every bucketed table THIS session has
    registered in _BUCKETED_TABLE_CACHE (any sf_dir)."""
    app = spark.sparkContext.applicationId
    return {
        t.lower()
        for (cache_app, _), tables in _BUCKETED_TABLE_CACHE.items()
        if cache_app == app
        for t in tables
    }


def _sweep_stale_bucket_dirs(spark: SparkSession) -> None:
    """Age-based reclaim of b_orders_*/b_lineitem_* warehouse dirs
    (r7 ADVICE): per-session table tags fixed the concurrent DROP
    hazard but made the same-tag reclaim path unreachable (application
    IDs are unique per JVM launch), so crashed sessions' dirs
    accumulated unboundedly.  Anything older than a day cannot belong
    to a live session on this box; anything younger is left alone so
    concurrent sessions stay safe.

    r8 ADVICE hardening: dir mtimes stay at write time, so a session
    alive >24h could have its own still-referenced dirs (an earlier
    sf_dir entry of its cache) reclaimed — never sweep a dir this
    session's cache still points at (the cache-hit path also refreshes
    mtimes via os.utime, protecting long-lived sessions from OTHER
    sweepers too)."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    root = wh.removeprefix("file:")
    try:
        entries = os.listdir(root)
    except OSError:
        return
    now = time.time()
    own = _own_bucket_table_dirs(spark)
    for name in entries:
        if not name.startswith(("b_orders_", "b_lineitem_")):
            continue
        if name.lower() in own:
            continue
        path = os.path.join(root, name)
        try:
            if now - os.path.getmtime(path) > _STALE_BUCKET_DIR_SECONDS:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def _touch_bucket_table_dirs(spark: SparkSession, tables: tuple[str, str]) -> None:
    """Refresh dir mtimes on every cache hit (r8 ADVICE): keeps a
    >24h-lived session's still-referenced bucketed tables out of any
    concurrent session's age-based sweep window."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    root = wh.removeprefix("file:")
    for t in tables:
        try:
            os.utime(os.path.join(root, t.lower()))
        except OSError:
            pass


@query(
    "q280_bucketed_join_revenue",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(CASE WHEN isnan(CAST((l.l_extendedprice * (1 - l.l_discount) * 100) AS DOUBLE)) OR abs(CAST((l.l_extendedprice * (1 - l.l_discount) * 100) AS DOUBLE)) >= 9007199254740992.0 THEN CAST((l.l_extendedprice * (1 - l.l_discount) * 100) AS DOUBLE) ELSE floor(CAST((l.l_extendedprice * (1 - l.l_discount) * 100) AS DOUBLE) * 1e0 + 0.5) / 1e0 END
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY 1
    """,
)
def q280_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders + lineitem bucketed by the join key, join them
    shuffle-free (no Exchange on either side — the bucketed layout IS
    the shuffle, paid once at write), aggregate open-order revenue.
    The result must equal the plain join, proving bucket routing loses
    no rows (operators/bucketing.write_bucketed/bucketed_join)."""
    from ..operators.bucketing import bucketed_join, write_bucketed

    # The bucketed layout is a WRITE-ONCE artifact by design ("the
    # bucketed layout IS the shuffle, paid once at write") — cache the
    # two tables per (session, sf_dir) like the jaccard-pair and graph
    # artifact caches, so repeated runs measure the exchange-free join
    # they gate, not a fresh re-bucketing of lineitem each time.
    key = (spark.sparkContext.applicationId, sf_dir)
    tables = _BUCKETED_TABLE_CACHE.get(key)
    if tables is not None:
        _touch_bucket_table_dirs(spark, tables)
    if tables is None:
        # Tag folds the applicationId in (r6 ADVICE): a pure md5(sf_dir)
        # tag made two concurrent sessions sharing the warehouse dir
        # DROP/rmtree each other's live tables mid-query.  Per-session
        # names keep concurrency safe; the stale-dir rmtree below still
        # reclaims leftovers from crashed sessions that shared OUR tag
        # (same app id restart), and distinct-session leftovers are
        # plain warehouse garbage, not correctness hazards.
        tag = hashlib.md5(f"{key[0]}:{sf_dir}".encode()).hexdigest()[:8]
        lt, rt = f"b_orders_{tag}", f"b_lineitem_{tag}"
        _sweep_stale_bucket_dirs(spark)
        for t in (lt, rt):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            # a PREVIOUS session's warehouse dir survives its metastore:
            # DROP is then a no-op but saveAsTable refuses the nonempty
            # location — clear the stale managed-table dir explicitly
            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            shutil.rmtree(
                os.path.join(wh.removeprefix("file:"), t.lower()),
                ignore_errors=True,
            )
        write_bucketed(
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "O")
            .select("o_orderkey", "o_orderpriority")
            .withColumnRenamed("o_orderkey", "k"),
            lt,
            "k",
        )
        write_bucketed(
            load_table(spark, sf_dir, "lineitem").select(
                F.col("l_orderkey").alias("k"),
                bfround(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
                .alias("cents"),
            ),
            rt,
            "k",
        )
        tables = _BUCKETED_TABLE_CACHE[key] = (lt, rt)
    lt, rt = tables
    out = (
        bucketed_join(spark, lt, rt, on="k")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@query(
    "q281_stratified_split",
    """
    WITH ranked AS (
        SELECT c_mktsegment AS stratum,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY md5('split:' || CAST(c_custkey AS VARCHAR)),
                            c_custkey) AS rn,
               count(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM customer
    ),
    tagged AS (
        SELECT stratum,
               CASE WHEN rn <= CAST(floor(n * 0.8) AS BIGINT) THEN 'train'
                    WHEN rn <= CAST(floor(n * 0.8) AS BIGINT)
                             + CAST(floor(n * 0.1) AS BIGINT) THEN 'val'
                    ELSE 'test' END AS split
        FROM ranked
    )
    SELECT stratum, split, CAST(count(*) AS BIGINT) AS n
    FROM tagged GROUP BY 1, 2
    """,
)
def q281_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 per market segment with EXACT floor counts: membership
    is a pure function of (salt, key) via md5 rank within the stratum,
    so the split reproduces across engines, runs, and repartitionings —
    the property Bernoulli sampling can't give.  At 100 TB the only
    cost is one rank window per stratum (or a two-pass count+threshold
    variant if stratum skew makes single windows hot)."""
    cust = load_table(spark, sf_dir, "customer")
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.concat(F.lit("split:"), F.col("c_custkey").cast("string"))),
        "c_custkey",
    )
    ranked = cust.select(
        F.col("c_mktsegment").alias("stratum"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("c_mktsegment"))
        .alias("n"),
    )
    train_cut = F.floor(F.col("n") * 0.8)
    val_cut = train_cut + F.floor(F.col("n") * 0.1)
    tagged = ranked.select(
        "stratum",
        F.when(F.col("rn") <= train_cut, "train")
        .when(F.col("rn") <= val_cut, "val")
        .otherwise("test")
        .alias("split"),
    )
    return tagged.groupBy("stratum", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
