"""Unit tests for the Prisma-filter compiler: null semantics, insensitive
mode, not-composition — on hand-built DataFrames (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from lawfirm_data_pipeline_spark.predicates import compile_where
from lawfirm_data_pipeline_spark.query import Model


@pytest.fixture(scope="module")
def queue(spark):
    # tri-state status like GooglePlaceUrlToScrape (schema.prisma:16-28)
    rows = [
        ("a", "https://x.test/1", "London", None, None),
        ("b", "https://x.test/2", "Paris", True, "ok"),
        ("c", "https://x.test/3", None, False, "boom"),
        ("d", "https://X.test/4", "london", None, None),
    ]
    return spark.createDataFrame(
        rows, "id string, url string, location string, status boolean, notes string"
    )


def ids(df):
    return sorted(r.id for r in df.collect())


def test_equals_null_is_null_aware(queue):
    assert ids(queue.filter(compile_where({"status": None}))) == ["a", "d"]
    assert ids(queue.filter(compile_where({"status": {"equals": None}}))) == ["a", "d"]


def test_not_null_is_not_null(queue):
    assert ids(queue.filter(compile_where({"status": {"not": None}}))) == ["b", "c"]


def test_not_scalar_uses_three_valued_logic(queue):
    # NULL status rows drop out of `not: true`, like Prisma's NOT(x = v) in SQL
    assert ids(queue.filter(compile_where({"status": {"not": True}}))) == ["c"]


def test_insensitive_mode(queue):
    got = queue.filter(
        compile_where({"location": {"equals": "LONDON", "mode": "insensitive"}})
    )
    assert ids(got) == ["a", "d"]
    got2 = queue.filter(
        compile_where({"url": {"startsWith": "https://x", "mode": "insensitive"}})
    )
    assert ids(got2) == ["a", "b", "c", "d"]


def test_boolean_composition(queue):
    w = {"OR": [{"status": True}, {"AND": [{"status": None}, {"location": "London"}]}]}
    assert ids(queue.filter(compile_where(w))) == ["a", "b"]


def test_in_notin_contains(queue):
    assert ids(queue.filter(compile_where({"location": {"in": ["London", "Paris"]}}))) == ["a", "b"]
    # notIn is three-valued: NULL location drops out (SQL NOT IN semantics on non-null list)
    assert ids(queue.filter(compile_where({"location": {"notIn": ["Paris"]}}))) == ["a", "d"]
    assert ids(queue.filter(compile_where({"notes": {"contains": "oo"}}))) == ["c"]


def test_field_ref_compares_columns(spark):
    df = spark.createDataFrame([(1, 1), (1, 2)], "id int, other int")
    got = df.filter(compile_where({"id": {"equals": {"ref": "other"}}})).collect()
    assert len(got) == 1 and got[0].other == 1


def test_find_first_and_order_nulls(queue):
    m = Model(queue)
    first = m.find_first(
        where={"status": None},
        order_by=[{"location": {"sort": "asc", "nulls": "first"}}, {"id": "asc"}],
    ).collect()
    # rows with status NULL: a("London"), d("london"); binary collation sorts
    # "London" (L=0x4C) before "london" (l=0x6C)
    assert [r.id for r in first] == ["a"]


def test_order_nulls_last(queue):
    m = Model(queue)
    got = m.find_many(order_by=[{"location": {"sort": "desc", "nulls": "last"}}, {"id": "asc"}])
    assert [r.id for r in got.collect()][-1] == "c"
