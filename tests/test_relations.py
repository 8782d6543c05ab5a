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
