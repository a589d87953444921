"""Every oracle-backed harness query must match DuckDB at sf0.001 and
sf0.01 — the same comparison the driver's correctness gate performs."""

from __future__ import annotations

import pytest

from vector_database_in_rust_spark import harness
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare, duckdb_con

ORACLE_QUERIES = sorted(harness.ORACLES)


@pytest.fixture(scope="module")
def cons():
    return {sf: duckdb_con(sf) for sf in (SF_SMOKE, SF_ORACLE)}


@pytest.mark.parametrize("name", ORACLE_QUERIES)
@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_oracle_parity(spark, cons, name, sf):
    compare(harness.QUERIES[name](spark, sf), cons[sf], harness.ORACLES[name])


def test_all_oracles_have_queries():
    missing = set(harness.ORACLES) - set(harness.QUERIES)
    assert not missing


def test_range_search_nonempty(spark):
    """Guard against a vacuous radius: the range query must return >0
    rows (the self-match at dist 0 guarantees at least one)."""
    import vector_database_in_rust_spark.harness as h

    assert h.QUERIES["range_search"](spark, SF_SMOKE).count() >= 1
