"""M4 — scalar kit + JSON-filter oracle queries (SURVEY.md §2.A12-A17,
§2.B JSON filters).

The cleansing kit runs on deterministic dirty strings derived from
``customer`` (the driver tables have no dirty text of their own), so the
regex/trim/url paths are exercised non-vacuously and the oracle can
re-derive the same inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import extract_phone, is_us_address, trim_or_null, try_parse_url
from ..io import load_table
from ..queries import query

# dirty-string derivation shared by Spark and the oracle
_DIRTY = """
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN printf('call us: +44 20 7%03d now', CAST(c_custkey % 1000 AS INT))
                WHEN c_custkey % 7 = 1 THEN printf('+1 (555) 01%02d', CAST(c_custkey % 100 AS INT))
                WHEN c_custkey % 7 = 2 THEN 'no digits here'
                ELSE printf('  office %d  ', c_custkey) END AS phone_text,
           CASE WHEN c_custkey % 5 = 0 THEN printf('  %d High St, Leeds ', c_custkey)
                WHEN c_custkey % 5 = 1 THEN printf('%d Main St, United States', c_custkey)
                WHEN c_custkey % 5 = 2 THEN '   '
                ELSE NULL END AS address_raw,
           CASE WHEN c_custkey % 4 = 0 THEN printf('https://firm%d.example.co.uk/about', c_custkey)
                WHEN c_custkey % 4 = 1 THEN 'not a url'
                WHEN c_custkey % 4 = 2 THEN 'ftp://files.example.org/x'
                ELSE printf('http://localhost%d', c_custkey) END AS url_raw
    FROM customer
"""


@query(
    "q20_scalar_kit",
    f"""
    WITH dirty AS ({_DIRTY})
    SELECT c_custkey,
           nullif(regexp_extract(phone_text, '(\\+?\\d[\\d\\s()-]+)', 1), '') AS phone,
           nullif(trim(address_raw), '')                                     AS address,
           coalesce(contains(address_raw, 'United States'), false)           AS is_us,
           CASE WHEN regexp_matches(url_raw, '^https?://')
                 AND contains(split_part(split_part(url_raw, '//', 2), '/', 1), '.')
                THEN url_raw END                                             AS valid_url
    FROM dirty
    """,
)
def q20_scalar_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    dirty = customer.select("c_custkey").selectExpr(
        "c_custkey",
        "CASE WHEN c_custkey % 7 = 0 THEN printf('call us: +44 20 7%03d now', CAST(c_custkey % 1000 AS INT)) "
        "     WHEN c_custkey % 7 = 1 THEN printf('+1 (555) 01%02d', CAST(c_custkey % 100 AS INT)) "
        "     WHEN c_custkey % 7 = 2 THEN 'no digits here' "
        "     ELSE printf('  office %d  ', c_custkey) END AS phone_text",
        "CASE WHEN c_custkey % 5 = 0 THEN printf('  %d High St, Leeds ', c_custkey) "
        "     WHEN c_custkey % 5 = 1 THEN printf('%d Main St, United States', c_custkey) "
        "     WHEN c_custkey % 5 = 2 THEN '   ' "
        "     ELSE NULL END AS address_raw",
        "CASE WHEN c_custkey % 4 = 0 THEN printf('https://firm%d.example.co.uk/about', c_custkey) "
        "     WHEN c_custkey % 4 = 1 THEN 'not a url' "
        "     WHEN c_custkey % 4 = 2 THEN 'ftp://files.example.org/x' "
        "     ELSE printf('http://localhost%d', c_custkey) END AS url_raw",
    )
    return dirty.select(
        "c_custkey",
        extract_phone("phone_text").alias("phone"),
        trim_or_null("address_raw").alias("address"),
        is_us_address("address_raw").alias("is_us"),
        try_parse_url("url_raw").alias("valid_url"),
    )


@query(
    "q21_json_filters",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    WHERE CAST(props->>'$.k' AS INTEGER) > 50
    GROUP BY event_type
    """,
)
def q21_json_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path filter + extraction (Prisma JSON filters,
    commonInputTypes.ts:133-148) over the events.props JSON column."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("bigint").alias("sum_k"))
    )
