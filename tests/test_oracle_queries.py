"""Differential oracle tests: every registered query vs its DuckDB SQL.

This is the same comparison the driver runs (row count + columns +
order-insensitive values) at sf0.01, so a green run here predicts a green
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from lawfirm_data_pipeline_spark.queries import ORACLE_SQL, QUERIES

from .conftest import SF_ORACLE
from .oracle_compare import canon_multiset, compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_ORACLE)
    sql = ORACLE_SQL.get(name)
    if sql is None:
        # Rows-only check, mirroring the driver's weaker gate — which
        # still canonicalizes the Spark output (round-1 q40 crashed
        # there on an array column), so canonicalize here too.
        rows = canon_multiset(df.toPandas())
        assert len(rows) >= 0
    else:
        compare(df, duck, sql)
