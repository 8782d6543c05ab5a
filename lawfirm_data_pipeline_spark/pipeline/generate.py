"""Deterministic entity-table generator (FIXTURES.md §2, seed-free).

Synthesizes the six reference entity tables (schema.prisma:16-99) for the
pipeline end-to-end tests.  Generation is pure Spark (``spark.range`` +
column expressions) — fully deterministic with no RNG state, so tests and
oracle-style assertions are stable, and generation scales to stress sizes
without driver-side row building.

Modulo patterns implement the FIXTURES invariants: tri-state status
columns carry all three values, unique columns are exactly unique,
referential integrity holds, timestamps span > 30 days, case-variant
duplicates exist for insensitive-mode tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference's FULL practice-area enum (scrapeWebsite.ts:22-152,
# 127 distinct tags) - the LLM extraction stub constrains services to
# exactly this vocabulary, same as the zod enum does (r5 verdict #8).
LEGAL_TAGS = [
    'Aviation Law', 'Banking & Finance', 'Civil Law', 'Commercial',
    'Contract Law', 'Corporate Crime', 'Criminal', 'Data Protection & GDPR',
    'Employment', 'Employment Law – For Employees',
    'Employment Law – For Employers', 'Energy & Natural Resources',
    'Environmental & Climate Change Law', 'Extradition', 'Franchising',
    'Infrastructure & Projects', 'Intellectual Property', 'International Law',
    'Jurisdiction & Recognition of Judgments', 'Media & Entertainment Law',
    'Miscarriage of Justice', 'Oil/Gas & Renewables', 'Pensions Law',
    'Property Law', 'Regulatory Law', 'Restrucuring & Insolvency',
    'Road Traffic Offences', 'Shipping/Maritime Law', 'Sports Law',
    'White Collar Crime',
    'Arbitration & Alternative Dispute Resolution (ADR)',
    'Bad Commercial Loans', 'Civil Litigation', 'Commercial Contracts',
    'Commercial Litigation', 'Community Infrastructure Levy',
    'Compulsory Purchase', 'Construction Disputes', 'Consumer Law',
    'Corporate', 'Corporate Governance', 'Debt Recovery', 'Defamation',
    'Exit Strategy Legal Planning', 'Financial Claims Management',
    'Fraud & Scam Recovery', 'Highways & Transport Law', 'Human Rights',
    'Injunctions', 'Insurance Litigation', 'International Legal Services',
    'IP Litigation', 'Mergers & Acquisitions', 'Mis-Sold Car Finance',
    'Mis-Sold Investments', 'Mis-Sold Overseas Property Investments',
    'Mis-Sold Pensions', 'Mis-Sold SIPPs', 'Notarial Law', 'Planning Appeals',
    'Planning Applications & Objections', 'Planning Enforcement',
    'Planning Law', 'Professional Negligence', 'Property Litigation',
    'Section 106 Agreements', 'Small Claims', 'Sworn Translation',
    'Virtual Legal Counsel', 'Accident at Work', 'Asbestos Disease',
    'Asylum Appeals', 'Childcare and Custody',
    'Citizenship and Naturalization', 'Commercial Property',
    'Construction Non Contentious', 'Conveyancing',
    'Corporate Dispute Resolution', 'Corporate Immigration',
    'Court of Protection', 'Deportation Defense', 'Dispute Resolution',
    'Dissolution Advisory', 'Employment Disputes', 'Employment Rights',
    'Housing Disrepair', 'Industrial Disease', 'Landlord and Tenant',
    'NDA Drafting', 'Partnership Disputes', 'Property Development',
    'Real Estate Finance', 'Serious Injury', 'Settlement Agreements',
    'SMEs Legal Support', 'Startups Advisory', 'Welfare Benefits',
    'Care Proceedings', 'Charity Law', 'Children Law', 'Clinical Negligence',
    'Cohabitation Agreements', 'Contentious Child Issues',
    'Contentious Probate', 'Contested Probate & Trusts',
    'Divorce & Separation', 'Divorce and Dissolution', 'EL/PL',
    'Estate Planning', 'Family Law', 'Immigration',
    'Lasting Powers of Attorney (LPA)', 'Legal Aid Family', 'Litigation',
    'Mediation', 'Medical Negligence', 'Non-molestation Order',
    'Notary Public', 'Parental Abduction', 'Personal Injury',
    'Prenuptial Agreements', 'Private Client', 'Public Law',
    'RTA Road Traffic Accidents', 'Serious/Catastrophic Injury', 'Trusts',
    'Wills',
]

# services-slice start modulus: slice(tags, h % MOD + 1, h % 4 + 1)
# must stay within the vocabulary (max start + max len - 1 == 127).
TAG_SLICE_MOD = len(LEGAL_TAGS) - 3

CITIES = ["London", "Manchester", "Leeds", "Bristol", "Glasgow", "Cardiff", "Dublin", "Belfast"]

_BASE_TS = "TIMESTAMP '2026-01-05 00:00:00'"


def _ts(i_expr: str, step_minutes: int = 97) -> str:
    # > 30-day span for any n ≥ ~450 rows at 97-minute stride
    return f"{_BASE_TS} + make_interval(0, 0, 0, 0, 0, ({i_expr}) * {step_minutes}, 0)"


def gen_google_place_urls(spark: SparkSession, n: int = 200) -> DataFrame:
    city = f"element_at(array({', '.join(repr(c) for c in CITIES)}), CAST(id % 8 AS INT) + 1)"
    return spark.range(n).selectExpr(
        "printf('gpu_%08d', id) AS id",
        f"concat('https://places.example.com/search?q=law+firms+', {city}, '&page=', id) AS url",
        f"CASE WHEN id % 20 = 19 THEN NULL ELSE {city} END AS location",
        "CASE WHEN id % 10 < 5 THEN NULL WHEN id % 10 < 9 THEN true ELSE false END AS status",
        "CASE WHEN id % 25 = 0 THEN 'seeded manually' ELSE NULL END AS notes",
        f"{_ts('id')} AS createdAt",
        f"{_ts('id', 103)} AS updatedAt",
    )


def gen_place_entries(spark: SparkSession, n: int = 1000) -> DataFrame:
    city = f"element_at(array({', '.join(repr(c) for c in CITIES)}), CAST(id % 8 AS INT) + 1)"
    return spark.range(n).selectExpr(
        "printf('pe_%08d', id) AS id",
        # ~5% null names; case-variant duplicates for insensitive tests
        "CASE WHEN id % 20 = 7 THEN NULL "
        "     WHEN id % 37 = 0 THEN printf('acme law %d', id) "
        "     ELSE printf('Acme Law %d', id) END AS name",
        # unique urls; a few differ only by trailing slash (must NOT merge)
        "CASE WHEN id % 50 = 49 THEN printf('https://firm%d.example.co.uk/', id - 1) "
        "     ELSE printf('https://firm%d.example.co.uk', id) END AS url",
        # ~10% null address, ~5% US (geo-filter branch)
        "CASE WHEN id % 10 = 3 THEN NULL "
        "     WHEN id % 20 = 11 THEN printf('%d Main St, Springfield, United States', id) "
        f"    ELSE printf('%d High St, %s', id, {city}) END AS address",
        # mix of +44, +1 (US-phone skip branch), and messy strings
        "CASE WHEN id % 15 = 2 THEN printf('+1 (555) 01%02d', CAST(id % 100 AS INT)) "
        "     WHEN id % 15 = 5 THEN printf('call us: +44 20 7%03d now!', CAST(id % 1000 AS INT)) "
        "     WHEN id % 15 = 9 THEN NULL "
        "     ELSE printf('+44 161 %04d', CAST(id % 10000 AS INT)) END AS telephone",
        f"{city} AS location",
        "CASE WHEN id % 10 < 5 THEN NULL WHEN id % 10 < 9 THEN true ELSE false END AS status",
        "CAST(NULL AS STRING) AS notes",
        f"{_ts('id')} AS createdAt",
        f"{_ts('id', 103)} AS updatedAt",
    )


def gen_firm_services(spark: SparkSession) -> DataFrame:
    tags = ", ".join(repr(t) for t in LEGAL_TAGS)
    return spark.range(len(LEGAL_TAGS)).selectExpr(
        "printf('fs_%08d', id) AS id",
        f"element_at(array({tags}), CAST(id AS INT) + 1) AS name",
        f"{_ts('id')} AS createdAt",
        f"{_ts('id')} AS updatedAt",
    )


def gen_companies(spark: SparkSession, n: int = 300) -> DataFrame:
    city = f"element_at(array({', '.join(repr(c) for c in CITIES)}), CAST(id % 8 AS INT) + 1)"
    return spark.range(n).selectExpr(
        "printf('co_%08d', id) AS id",
        "printf('Firm %d LLP', id) AS name",
        "printf('https://firm%d.example.co.uk', id) AS websiteUrl",
        # ~30% null email (the `not: null` filter must exclude these)
        "CASE WHEN id % 10 < 3 THEN NULL ELSE printf('info@firm%d.example.co.uk', id) END AS emailAddress",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE printf('+44 20 7%04d', CAST(id % 10000 AS INT)) END AS phoneNumber",
        f"printf('%d High St, %s', id, {city}) AS address",
        "'Legal' AS industry",
        f"{city} AS location",
        f"{_ts('id')} AS createdAt",
        f"{_ts('id', 103)} AS updatedAt",
    )


def gen_bridge(spark: SparkSession, n_companies: int = 300) -> DataFrame:
    """0-8 services per company; companies with id % 10 == 4 get none
    (the zero-services delete branch)."""
    return (
        spark.range(n_companies)
        .selectExpr(
            "printf('co_%08d', id) AS A",
            "CASE WHEN id % 10 = 4 OR id % 9 = 0 THEN array() "
            "     ELSE transform(sequence(1, CAST(id % 9 AS INT)), "
            f"          j -> printf('fs_%08d', (id * 7 + j * 13) % {len(LEGAL_TAGS)})) END AS bs",
        )
        .select("A", F.explode("bs").alias("B"))
        .dropDuplicates(["A", "B"])
    )


def gen_crm_sync_events(spark: SparkSession, n_companies: int = 300) -> DataFrame:
    """~20% of companies have a sync event (id % 5 == 1)."""
    return (
        spark.range(n_companies)
        .filter(F.col("id") % 5 == 1)
        .selectExpr(
            "printf('cse_%08d', id) AS id",
            "printf('co_%08d', id) AS companyId",
            "CASE WHEN id % 3 = 0 THEN NULL WHEN id % 3 = 1 THEN true ELSE false END AS status",
            "CAST(NULL AS STRING) AS notes",
            f"{_ts('id')} AS createdAt",
            f"{_ts('id')} AS updatedAt",
        )
    )


def gen_notifications(spark: SparkSession, n: int = 100) -> DataFrame:
    return spark.range(n).selectExpr(
        "printf('nt_%08d', id) AS id",
        "printf('run %d finished', id) AS message",
        """CASE WHEN id % 7 = 0 THEN NULL
                ELSE to_json(named_struct(
                    'run', named_struct('count', CAST(id % 10 AS INT)),
                    'tags', array(printf('t%d', CAST(id % 3 AS INT)), 'ops')))
           END AS metadata""",
        "element_at(array('Places_Locator', 'Website_Content_Scrapper', 'CRM_Sync'), CAST(id % 3 AS INT) + 1) AS serviceName",
        f"{_ts('id')} AS createdAt",
        f"{_ts('id')} AS updatedAt",
    )


def generate_all(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "google_place_url_to_scrape": gen_google_place_urls(spark),
        "place_entry": gen_place_entries(spark),
        "company": gen_companies(spark),
        "firm_service": gen_firm_services(spark),
        "company_to_firm_service": gen_bridge(spark),
        "crm_sync_event": gen_crm_sync_events(spark),
        "notification": gen_notifications(spark),
    }
