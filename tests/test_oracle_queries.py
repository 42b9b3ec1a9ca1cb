"""Mirror of the driver's t2 gate: every query with an oracle must match
DuckDB exactly at sf0.001 (fast) — run with SPARK_GRAFT_SF_TEST_DIR=
/root/testdata/sf0.01 for the full-size check."""

from __future__ import annotations

import pytest

from feldera_spark.queries import all_oracles, all_queries
from feldera_spark.testing.oracle import compare_to_oracle
from tests.conftest import SF_DIR

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    compare_to_oracle(df, _ORACLES[name], SF_DIR)


def test_every_query_has_oracle_or_is_documented():
    missing = set(_QUERIES) - set(_ORACLES)
    # Queries without oracles get the driver's weaker rows-only check;
    # keep this list explicit so nothing silently loses coverage.
    assert missing == set(), f"queries without oracle SQL: {sorted(missing)}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0
