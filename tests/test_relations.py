"""Unit tests for relation operators: Prisma edge semantics on tiny DFs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.relations import (
    hydrate_many_to_many,
    hydrate_one_to_one,
    relation_every,
    relation_none,
    relation_some,
)


@pytest.fixture(scope="module")
def data(spark):
    company = spark.createDataFrame(
        [("c1", "Acme Law"), ("c2", "Blair LLP"), ("c3", "NoServices & Co")],
        "id string, name string",
    )
    bridge = spark.createDataFrame(
        [("c1", "s1"), ("c1", "s2"), ("c2", "s2")], "A string, B string"
    )
    services = spark.createDataFrame(
        [("s1", "Employment"), ("s2", "Family Law")], "id string, name string"
    )
    sync = spark.createDataFrame([("e1", "c2", True)], "id string, companyId string, status boolean")
    return company, bridge, services, sync


def test_mn_hydration_empty_array_for_zero_children(data):
    company, bridge, services, _ = data
    out = hydrate_many_to_many(
        company, bridge, services,
        fact_key="id", bridge_fact_fk="A", bridge_dim_fk="B",
        dim_key="id", dim_value="name", array_col="services",
    )
    rows = {r.name: r.services for r in out.collect()}
    assert rows["Acme Law"] == ["Employment", "Family Law"]  # sorted
    assert rows["Blair LLP"] == ["Family Law"]
    assert rows["NoServices & Co"] == []  # zero-services skip branch (syncCrm.ts:107)


def test_1to1_hydration_null_struct_encodes_absence(data):
    company, _, _, sync = data
    out = hydrate_one_to_one(company, sync, "id", "companyId", struct_col="crmSyncEvent")
    rows = {r.name: r.crmSyncEvent for r in out.collect()}
    assert rows["Blair LLP"] is not None and rows["Blair LLP"].status is True
    assert rows["Acme Law"] is None  # relation-is-null filterable


def test_relation_filters(data):
    company, bridge, _, sync = data
    some = relation_some(company, bridge, "id", "A")
    assert sorted(r.id for r in some.collect()) == ["c1", "c2"]
    none = relation_none(company, sync, "id", "companyId")
    assert sorted(r.id for r in none.collect()) == ["c1", "c3"]


def test_every_passes_zero_children(data):
    company, bridge, services, _ = data
    pairs = bridge.join(services, bridge.B == services.id).select("A", "name")
    out = relation_every(company, pairs, "id", "A", F.col("name") == "Family Law")
    # c1 violates (has Employment); c2 all Family Law; c3 zero children → passes
    assert sorted(r.id for r in out.collect()) == ["c2", "c3"]


def test_find_or_throw(spark):
    import pytest as _pytest

    from lawfirm_data_pipeline_spark.query import Model, RecordNotFoundError
    from lawfirm_data_pipeline_spark.io import load_table

    cust = Model(load_table(spark, "/root/testdata/sf0.001", "customer"), "customer")
    hit = cust.find_unique_or_throw({"c_custkey": 1})
    assert hit.count() == 1
    with _pytest.raises(RecordNotFoundError):
        cust.find_unique_or_throw({"c_custkey": -999})
    with _pytest.raises(RecordNotFoundError):
        cust.find_first_or_throw({"c_name": {"contains": "no-such-customer"}})


def test_hydrate_nested_include_args(spark):
    from lawfirm_data_pipeline_spark.operators.relations import hydrate_many_to_many

    fact = spark.createDataFrame([(1,), (2,), (3,)], ["fid"])
    bridge = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (1, 13), (2, 10)], ["bf", "bd"]
    )
    dim = spark.createDataFrame(
        [(10, "delta", 5), (11, "alpha", 50), (12, "charlie", 50), (13, "bravo", 50)],
        ["dk", "dv", "size"],
    )
    out = hydrate_many_to_many(
        fact, bridge, dim,
        fact_key="fid", bridge_fact_fk="bf", bridge_dim_fk="bd",
        dim_key="dk", dim_value="dv", array_col="vals",
        where={"size": {"gte": 10}},          # excludes 'delta'
        order_by={"dv": "desc"}, take=2,      # keeps top-2 by name desc
    )
    rows = {r["fid"]: r["vals"] for r in out.collect()}
    assert rows[1] == ["charlie", "bravo"]    # desc order preserved, take=2
    assert rows[2] == []                      # only child filtered out
    assert rows[3] == []                      # childless fact keeps empty array


def test_order_by_relation_count_semantics(spark):
    from lawfirm_data_pipeline_spark.operators.relations import order_by_relation_count

    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pid"])
    child = spark.createDataFrame([(1,), (1,), (3,)], ["fk"])
    out = order_by_relation_count(
        parent, child, parent_key="pid", child_fk="fk",
        direction="desc", tie_break="pid", count_col="n",
    ).collect()
    assert [(r["pid"], r["n"]) for r in out] == [(1, 2), (3, 1), (2, 0)]
