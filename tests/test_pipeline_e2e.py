"""Pipeline end-to-end (SURVEY.md §5.3): generate the entity tables, run
locate → scrape → sync as batch transforms with deterministic stubs, and
assert queue-state transitions and lead counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.pipeline import generate as G
from lawfirm_data_pipeline_spark.pipeline.stages import (
    locate_stage,
    scrape_stage,
    sync_stage,
)


@pytest.fixture(scope="module")
def tables(spark):
    t = G.generate_all(spark)
    return {k: v.cache() for k, v in t.items()}


def test_generators_respect_invariants(tables):
    q = tables["google_place_url_to_scrape"]
    assert q.count() == 200
    assert q.select("url").distinct().count() == 200  # unique
    states = {r.status for r in q.select("status").distinct().collect()}
    assert states == {None, True, False}  # tri-state non-vacuous
    pe = tables["place_entry"]
    assert pe.select("url").distinct().count() == pe.count()
    # bridge referential integrity
    br = tables["company_to_firm_service"]
    fs = tables["firm_service"]
    dangling = br.join(fs, br.B == fs.id, "left_anti")
    assert dangling.count() == 0
    # ~10% of companies have zero services
    zero = tables["company"].join(br, tables["company"].id == br.A, "left_anti")
    assert zero.count() > 0


def test_locate_stage_transitions(tables):
    res = locate_stage(tables["google_place_url_to_scrape"], tables["place_entry"])
    new_q = res.tables["google_place_url_to_scrape"]
    assert new_q.filter(F.col("status").isNull()).count() == 0  # all pending consumed
    # non-pending rows untouched
    assert new_q.filter(F.col("status") == False).count() == tables[  # noqa: E712
        "google_place_url_to_scrape"
    ].filter(F.col("status") == False).count()  # noqa: E712
    pe = res.tables["place_entry"]
    assert pe.count() > tables["place_entry"].count()  # entries appended
    assert pe.select("url").distinct().count() == pe.count()  # uniqueness held
    # no US addresses among the new rows (geo filter A12)
    new_rows = pe.join(tables["place_entry"].select("url"), "url", "left_anti")
    assert new_rows.filter(F.col("address").contains("United States")).count() == 0
    # every telephone extracted matches the phone regex output (A13)
    assert new_rows.filter(F.col("telephone").rlike(r"^\+?\d")).count() == new_rows.filter(
        F.col("telephone").isNotNull()
    ).count()


def test_locate_stage_failure_writeback(tables, spark):
    def failing_extractor(seeds):
        # emits zero rows — runner marks rows failed in the reference; our
        # batch equivalent still marks them processed=true (no rows is not
        # an error), so simulate failure by raising in real integrations.
        return seeds.limit(0).selectExpr(
            "id AS seed_id", "location", "'' AS raw_name", "'' AS raw_url",
            "'' AS raw_address", "'' AS raw_phone_text"
        )

    res = locate_stage(tables["google_place_url_to_scrape"], tables["place_entry"], failing_extractor)
    assert res.tables["place_entry"].count() == tables["place_entry"].count()


def test_scrape_stage(tables):
    res = scrape_stage(
        tables["place_entry"],
        tables["company"],
        tables["firm_service"],
        tables["company_to_firm_service"],
    )
    pe = res.tables["place_entry"]
    # pending rows with a name got a definite status; null-name pending rows stay pending
    assert pe.filter(F.col("status").isNull() & F.col("name").isNotNull()).count() == 0
    co = res.tables["company"]
    assert co.count() > tables["company"].count()
    assert co.select("name").distinct().count() == co.count()  # unique name held
    # dim only grows with vocabulary tags
    fs = res.tables["firm_service"]
    assert fs.count() >= tables["firm_service"].count()
    vocab = {t for t in G.LEGAL_TAGS}
    assert {r.name for r in fs.collect()} <= vocab
    assert res.metrics["scraper_skipped"] > 0


def test_sync_stage_branches(tables):
    res = sync_stage(
        tables["company"],
        tables["firm_service"],
        tables["company_to_firm_service"],
        tables["crm_sync_event"],
        tables["place_entry"],
    )
    assert res.metrics["crm_eligible"] > 0
    assert res.metrics["crm_deleted_no_services"] > 0
    assert res.metrics["crm_synced"] > 0
    # deleted companies really gone, cascade held
    co = res.tables["company"]
    br = res.tables["company_to_firm_service"]
    assert co.count() == tables["company"].count() - res.metrics["crm_deleted_no_services"]
    assert br.join(co, br.A == co.id, "left_anti").count() == 0
    # every synced company got exactly one event (1:1 unique fk)
    ev = res.tables["crm_sync_event"]
    assert ev.select("companyId").distinct().count() == ev.count()
    # sync events reference surviving companies only... except pre-existing ones
    # for deleted companies (reference deletes only no-service companies which
    # by the anti-join had no event)
    assert ev.count() == tables["crm_sync_event"].count() + res.metrics["crm_synced"]


def test_full_pipeline_composes(tables):
    r1 = locate_stage(tables["google_place_url_to_scrape"], tables["place_entry"])
    r2 = scrape_stage(
        r1.tables["place_entry"],
        tables["company"],
        tables["firm_service"],
        tables["company_to_firm_service"],
    )
    r3 = sync_stage(
        r2.tables["company"],
        r2.tables["firm_service"],
        r2.tables["company_to_firm_service"],
        tables["crm_sync_event"],
        r2.tables["place_entry"],
    )
    # pipeline invariant: every synced company has services and an email
    ev = r3.tables["crm_sync_event"]
    co = r2.tables["company"]
    synced_new = ev.join(tables["crm_sync_event"], ["id"], "left_anti")
    joined = synced_new.join(co, synced_new.companyId == co.id)
    assert joined.filter(F.col("emailAddress").isNull()).count() == 0


def test_a18_vocabulary_is_the_reference_enum():
    """r5 verdict #8: the extraction stub constrains services to the
    reference's FULL practice-area enum (scrapeWebsite.ts:22-152 — 127
    distinct tags), and the services slice stays inside it."""
    from lawfirm_data_pipeline_spark.pipeline.generate import (
        LEGAL_TAGS,
        TAG_SLICE_MOD,
    )

    assert len(LEGAL_TAGS) == 127
    assert len(set(LEGAL_TAGS)) == 127
    for probe in ("Aviation Law", "Wills", "Mis-Sold SIPPs", "EL/PL",
                  "Data Protection & GDPR"):
        assert probe in LEGAL_TAGS
    # max slice start + max slice length stays within the vocabulary
    assert TAG_SLICE_MOD - 1 + 4 == len(LEGAL_TAGS)
