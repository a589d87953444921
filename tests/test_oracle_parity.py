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


def test_round4_window_composition():
    """The driver hashes only queries()[:50] in dict order. Pin the
    round-4 rotation: the repaired streaming queries and the round-4
    additions that claimed window slots must sit INSIDE the window
    (later additions are deferred to round 5 by design — NOTES_r3.md
    §2), and the window must contain no duplicates. An accidental
    registration reorder (e.g. a new @register placed before the
    rotation call) silently un-verifies queries — this test makes
    that loud."""
    window = list(harness.QUERIES)[:50]
    assert len(set(window)) == 50
    must_have = {
        "stream_hourly_rollup",
        "stream_sessionize",
        "sessionize_events",
        "events_range_join",
        "embedding_bq",
        "knn_hamming",
        "knn_funnel",
        "media_decode_image",
        "media_decode_audio",
        "media_resize_real",
        "dedup_substring",
        "search_bm25",
        "tpch_q3_shipping",
        "decontaminate_corpus",
        "store_versions",
    }
    missing = must_have - set(window)
    assert not missing, f"rotated out of the driver window: {missing}"
