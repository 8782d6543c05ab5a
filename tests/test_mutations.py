"""Unit tests for mutation transforms: idempotency, uniqueness maintenance,
null-write semantics — the invariants the reference gets from Postgres
constraints (SURVEY.md §5.2, §5.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.mutations import (
    connect_or_create,
    dedup_insert,
    delete_where,
    merge_update,
    nested_create_1to1,
    update_many,
    upsert,
)


@pytest.fixture(scope="module")
def queue(spark):
    return spark.createDataFrame(
        [("a", "u1", None), ("b", "u2", None), ("c", "u3", True)],
        "id string, url string, status boolean",
    )


def test_merge_update_status_writeback(queue, spark):
    updates = spark.createDataFrame([("a", True), ("b", False)], "id string, status boolean")
    out = {r.id: r.status for r in merge_update(queue, updates, ["id"]).collect()}
    assert out == {"a": True, "b": False, "c": True}


def test_merge_update_composite_key(spark):
    # the (name,url) re-queue, syncCrm.ts:113-119
    base = spark.createDataFrame(
        [("Acme", "u1", True), ("Acme", "u2", True)], "name string, url string, status boolean"
    )
    upd = spark.createDataFrame([("Acme", "u2", None)], "name string, url string, status boolean")
    out = merge_update(base, upd, ["name", "url"])
    # NULL update payload cannot null a column through coalesce — documented;
    # status stays true. Re-queue therefore uses update_many instead:
    assert {(r.url, r.status) for r in out.collect()} == {("u1", True), ("u2", True)}
    requeued = update_many(base, {"name": "Acme", "url": "u2"}, {"status": None})
    assert {(r.url, r.status) for r in requeued.collect()} == {("u1", True), ("u2", None)}


def test_dedup_insert_swallows_duplicates(queue, spark):
    new = spark.createDataFrame(
        [("x", "u2", None), ("y", "u9", None), ("z", "u9", None)],
        "id string, url string, status boolean",
    )
    out = dedup_insert(queue, new, "url", tiebreak=["id"])
    urls = sorted(r.url for r in out.collect())
    assert urls == ["u1", "u2", "u3", "u9"]  # u2 dup swallowed, u9 first-wins
    assert out.filter(F.col("url") == "u9").first().id == "y"
    # idempotent under re-run
    again = dedup_insert(out, new, "url", tiebreak=["id"])
    assert again.count() == out.count()


def test_upsert_updates_and_inserts(queue, spark):
    inc = spark.createDataFrame(
        [("a", "u1", True), ("n", "u7", False)], "id string, url string, status boolean"
    )
    out = upsert(queue, inc, "id", ["status"])
    rows = {r.id: r.status for r in out.collect()}
    assert rows == {"a": True, "b": None, "c": True, "n": False}
    # idempotent
    assert upsert(out, inc, "id", ["status"]).count() == 4


def test_delete_where_null_pred_keeps_row(queue):
    out = delete_where(queue, {"status": False})
    assert sorted(r.id for r in out.collect()) == ["a", "b", "c"]  # no false rows
    out2 = delete_where(queue, {"status": True})
    assert sorted(r.id for r in out2.collect()) == ["a", "b"]  # NULLs survive


def test_connect_or_create_idempotent(spark):
    dim = spark.createDataFrame([("s1", "Employment")], "id string, name string")
    bridge = spark.createDataFrame([], "A string, B string")
    facts = spark.createDataFrame(
        [("c1", ["Employment", "Family Law", "Family Law"]), ("c2", ["Wills", None])],
        "id string, tags array<string>",
    )
    new_dim, new_bridge = connect_or_create(facts, dim, bridge)
    assert sorted(r.name for r in new_dim.collect()) == ["Employment", "Family Law", "Wills"]
    assert new_bridge.count() == 3  # c1×2 (in-row dup removed), c2×1 (null dropped)
    # connect reuses the existing dim id
    emp_id = new_dim.filter(F.col("name") == "Employment").first().id
    assert emp_id == "s1"
    # re-run: nothing new
    dim2, bridge2 = connect_or_create(facts, new_dim, new_bridge)
    assert dim2.count() == 3 and bridge2.count() == 3


def test_nested_create_1to1_unique_fk(spark):
    events = spark.createDataFrame([("e1", "c1", True)], "id string, companyId string, status boolean")
    new = spark.createDataFrame(
        [("e2", "c1", False), ("e3", "c2", None)], "id string, companyId string, status boolean"
    )
    out = nested_create_1to1(events, new)
    rows = {r.companyId: (r.id, r.status) for r in out.collect()}
    assert rows["c1"] == ("e1", True)  # existing 1:1 kept, duplicate dropped
    assert rows["c2"] == ("e3", None)
