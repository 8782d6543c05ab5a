"""Explicit StructTypes for every table the engine touches.

Two groups:

1. Driver-provided analytics tables (``/root/testdata/sf*/*.parquet``,
   TESTDATA.md / FIXTURES.md §1) — TPC-H-ish star schema plus ``events``
   (stream), ``documents`` (text dedup / analysis) and ``embeddings``
   (similarity search).

2. Reference entity tables (``/root/reference/src/db/schema.prisma:16-99``;
   SURVEY.md §1.2) — the six Prisma models re-expressed as Spark schemas.
   The Prisma ``Boolean?`` tri-state (NULL = pending / true = done /
   false = failed — load-bearing queue semantics, see schema.prisma:23,40,83)
   maps to a nullable BooleanType; ``Json?`` maps to a JSON string column.

Schema discipline mirrors the reference: the Prisma schema is its single
source of truth, so this module is ours — never rely on inference for the
entity tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Group 1 — driver analytics tables
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),  # JSON
    ]
)

def events_scan_schema(ts_type: T.DataType) -> T.StructType:
    """Physical scan schema for the driver's events parquet, parameterized
    on the footer's actual ``ts`` type.

    The driver has shipped this column as TIMESTAMP(NANOS) (round 1) and
    TIMESTAMP(MICROS, NTZ) (round 2+); io._events_ts_strategy sniffs the
    parquet footer and picks the matching scan type, so a future unit flip
    fails loudly (schema mismatch / canary test) instead of silently
    rescaling the timeline.
    """
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", ts_type, False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
            T.StructField("props", T.StringType(), True),
        ]
    )


# Scan schema when ts is TIMESTAMP(NANOS): Spark reads nanos only as a raw
# long (spark.sql.legacy.parquet.nanosAsLong); io converts via integer
# ns→µs division (matching DuckDB's truncation).
EVENTS_RAW = events_scan_schema(T.LongType())

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

DRIVER_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Group 2 — reference entity tables (schema.prisma:16-99)
# ---------------------------------------------------------------------------


def _entity(*fields: T.StructField) -> T.StructType:
    """Entity tables share id + createdAt/updatedAt (schema.prisma:26-27)."""
    return T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            *fields,
            T.StructField("createdAt", T.TimestampType(), False),
            T.StructField("updatedAt", T.TimestampType(), False),
        ]
    )


# schema.prisma:16-28 — stage-1 input queue; url is unique, status tri-state.
GOOGLE_PLACE_URL_TO_SCRAPE = _entity(
    T.StructField("url", T.StringType(), False),
    T.StructField("location", T.StringType(), True),
    T.StructField("status", T.BooleanType(), True),
    T.StructField("notes", T.StringType(), True),
)

# schema.prisma:30-45 — stage-1 output / stage-2 input; url unique,
# name/address/telephone nullable (migration 20260102133035).
PLACE_ENTRY = _entity(
    T.StructField("name", T.StringType(), True),
    T.StructField("url", T.StringType(), False),
    T.StructField("address", T.StringType(), True),
    T.StructField("telephone", T.StringType(), True),
    T.StructField("location", T.StringType(), True),
    T.StructField("status", T.BooleanType(), True),
    T.StructField("notes", T.StringType(), True),
)

# schema.prisma:47-64 — name unique; m:n services via bridge; 1:1 sync event.
COMPANY = _entity(
    T.StructField("name", T.StringType(), False),
    T.StructField("websiteUrl", T.StringType(), False),
    T.StructField("emailAddress", T.StringType(), True),
    T.StructField("phoneNumber", T.StringType(), True),
    T.StructField("address", T.StringType(), True),
    T.StructField("industry", T.StringType(), True),
    T.StructField("location", T.StringType(), True),
)

# schema.prisma:66-75 — practice-area dimension; name unique.
FIRM_SERVICE = _entity(T.StructField("name", T.StringType(), False))

# Implicit m:n bridge _CompanyToFirmService(A,B)
# (migrations/20260102130331_init/migration.sql:70-76); composite PK (A,B).
COMPANY_TO_FIRM_SERVICE = T.StructType(
    [
        T.StructField("A", T.StringType(), False),  # -> company.id
        T.StructField("B", T.StringType(), False),  # -> firm_service.id
    ]
)

# schema.prisma:77-88 — 1:1 with Company via unique companyId.
CRM_SYNC_EVENT = _entity(
    T.StructField("companyId", T.StringType(), False),
    T.StructField("status", T.BooleanType(), True),
    T.StructField("notes", T.StringType(), True),
)

# schema.prisma:90-99 — ops log; metadata is JSONB -> JSON string here.
NOTIFICATION = _entity(
    T.StructField("message", T.StringType(), False),
    T.StructField("metadata", T.StringType(), True),  # JSON
    T.StructField("serviceName", T.StringType(), False),  # enum below
)

# schema.prisma:101-105
ENUM_SERVICE_NAME = ("Places_Locator", "Website_Content_Scrapper", "CRM_Sync")

ENTITY_TABLES: dict[str, T.StructType] = {
    "google_place_url_to_scrape": GOOGLE_PLACE_URL_TO_SCRAPE,
    "place_entry": PLACE_ENTRY,
    "company": COMPANY,
    "firm_service": FIRM_SERVICE,
    "company_to_firm_service": COMPANY_TO_FIRM_SERVICE,
    "crm_sync_event": CRM_SYNC_EVENT,
    "notification": NOTIFICATION,
}

# Unique keys the reference enforces with indexes
# (migrations/20260102130331_init/migration.sql:79-91).  Spark has no
# indexes: the mutation transforms (operators/mutations.py) maintain these.
UNIQUE_KEYS: dict[str, tuple[str, ...]] = {
    "google_place_url_to_scrape": ("url",),
    "place_entry": ("url",),
    "company": ("name",),
    "firm_service": ("name",),
    "crm_sync_event": ("companyId",),
}
