"""Oracle-gate replica: every registered query with an oracle must
match DuckDB exactly at sf0.01 (the driver's t2 scale)."""

from __future__ import annotations

import pytest

from sql_data_warehouse_spark.analytics import all_queries

from .conftest import SF_ORACLE
from .oracle_harness import compare, run_oracle

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    df = q.builder(spark, SF_ORACLE)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    compare(df, run_oracle(q.oracle, SF_ORACLE), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert set(oracles) <= names
