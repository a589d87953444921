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


def test_round5_window_composition():
    """The driver hashes only queries()[:50] in dict order. Pin the
    round-5 rotation: the window IS _ROUND5_WINDOW verbatim — the 14
    queries that had never held a driver slot claim the front, then
    this round's additions (media_decode_png, the oracle-backed
    approx_event_stats verdict), then the materially-changed and
    high-churn re-verification set. An accidental registration reorder
    (e.g. a new @register placed before the rotation call) silently
    un-verifies queries — this test makes that loud."""
    window = list(harness.QUERIES)[:50]
    assert len(set(window)) == 50
    assert window == harness._ROUND5_WINDOW
    never_verified = {
        "csv_roundtrip",
        "json_roundtrip",
        "orc_roundtrip",
        "csv_vector_roundtrip",
        "media_resize",
        "media_frames",
        "knn_refine_bq",
        "embed_hashed",
        "embed_hashed_search",
        "profile_events",
        "corpus_shuffle",
        "length_buckets",
        "tpch_q4_order_priority",
        "tpch_q12_shipmode",
    }
    missing = never_verified - set(window[:14])
    assert not missing, f"never-verified query lost its front slot: {missing}"
    # every window member must verify something: all 50 are oracle-backed
    # (approx_event_stats included, via its round-5 verdict table)
    no_oracle = [q for q in window if q not in harness.ORACLES]
    assert not no_oracle, f"window slots without an oracle: {no_oracle}"


def test_rotation_is_a_pure_permutation():
    """Rotation must only PERMUTE the registry: every registered query
    appears exactly once, and every oracle key still names a registered
    query — no adds, drops, or re-pairings."""
    names = list(harness.QUERIES)
    assert len(names) == len(set(names))
    assert set(harness.ORACLES) <= set(names)
