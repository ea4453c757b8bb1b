"""The correctness gate, locally: every declared query must match its
DuckDB oracle on the sf0.001 testdata (same comparison the driver runs at
sf0.01: rowcount + schema + order-insensitive values)."""

import pytest

from datatools_spark.queries import ORACLE, QUERIES

from .oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, con, name):
    issues = compare(spark, con, QUERIES[name], ORACLE[name], SF_DIR)
    assert not issues, issues


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    assert QUERIES[name](spark, SF_DIR).count() >= 0
