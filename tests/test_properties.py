"""Property-based invariants (SURVEY.md §5.4, hypothesis):

* upsert is idempotent: applying the same incoming batch twice equals
  applying it once;
* dedup_insert with a tiebreak is permutation-stable: input row order
  never changes the outcome (parallel batches have no arrival order);
* relation ``some``/``none`` partition the parent set exactly;
* connect_or_create is idempotent on dim + bridge.

Spark jobs are slow per example, so examples are few and small — the
value is in the adversarial shapes hypothesis finds (dup keys inside one
batch, empty sides, all-dup batches), not in volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.mutations import (
    connect_or_create,
    dedup_insert,
    upsert,
)
from lawfirm_data_pipeline_spark.operators.relations import relation_none, relation_some

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.text(alphabet="abc", min_size=0, max_size=3)

ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def df_of(spark, rows, schema="k int, v string"):
    return spark.createDataFrame([tuple(r) for r in rows], schema)


def canon(df):
    return sorted(repr(tuple(r)) for r in df.collect())


@SLOW
@given(base=ROWS, inc=ROWS)
def test_upsert_idempotent(spark, base, inc):
    b = df_of(spark, [(k, v) for k, v in {r[0]: r for r in base}.values()])
    i = df_of(spark, [(k, v) for k, v in {r[0]: r for r in inc}.values()])
    once = upsert(b, i, keys="k")
    twice = upsert(once, i, keys="k")
    assert canon(once) == canon(twice)


@SLOW
@given(existing=ROWS, new=ROWS, seed=st.randoms())
def test_dedup_insert_permutation_stable(spark, existing, new, seed):
    ex = df_of(spark, [(k, v) for k, v in {r[0]: r for r in existing}.values()])
    shuffled = list(new)
    seed.shuffle(shuffled)
    a = dedup_insert(ex, df_of(spark, new), unique_key="k", tiebreak=["v"])
    b = dedup_insert(ex, df_of(spark, shuffled), unique_key="k", tiebreak=["v"])
    assert canon(a) == canon(b)


@SLOW
@given(parents=st.lists(KEYS, min_size=0, max_size=8, unique=True), children=ROWS)
def test_some_none_partition_parent(spark, parents, children):
    p = spark.createDataFrame([(k,) for k in parents], "pk int")
    c = df_of(spark, children, "fk int, v string")
    some = relation_some(p, c, "pk", "fk")
    none = relation_none(p, c, "pk", "fk")
    got = sorted([r.pk for r in some.collect()] + [r.pk for r in none.collect()])
    assert got == sorted(parents)  # disjoint, exhaustive


@SLOW
@given(tags=st.lists(st.tuples(KEYS, st.sampled_from(["x", "y", "z"])), max_size=10))
def test_connect_or_create_idempotent(spark, tags):
    by_fact: dict[int, list[str]] = {}
    for fid, name in tags:
        by_fact.setdefault(fid, []).append(name)
    facts = spark.createDataFrame(
        [(str(fid), names) for fid, names in by_fact.items()] or [],
        "id string, tags array<string>",
    )
    dim = spark.createDataFrame([("d0", "x")], "id string, name string")
    bridge = spark.createDataFrame([], "A string, B string")
    d1, b1 = connect_or_create(facts, dim, bridge)
    d2, b2 = connect_or_create(facts, d1, b1)
    assert canon(d1.select("name")) == canon(d2.select("name"))
    assert b1.count() == b2.count()
    # dim keys stay unique
    assert d1.count() == d1.select("name").distinct().count()
