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


# DECIMAL is tolerable ONLY where the paired Spark column is float:
# DuckDB's .df() renders DECIMAL as float64, so the dtype classes agree
# and compare()'s exact-value pass still guards the driver hash. Each
# entry here is additionally covered by test_oracle_parity's dtype
# assertion, which fails if the Spark side ever stops being float.
_DECIMAL_FLOAT_PAIRED = {"events_histogram"}


def test_oracle_result_types_portable(cons):
    """No oracle may declare a DuckDB result type that pandas coerces
    across dtype class: HUGEINT/UHUGEINT sums silently become float64,
    so the driver value-hashes `2006.0` against Spark's long `2006`
    and flags a mismatch with identical values (the round-6
    `events_ks_test` red row — sum() over integers is HUGEINT unless
    cast). `.types` binds without executing, so this sweeps all
    oracles in under a second."""
    banned = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT")
    con = cons[SF_SMOKE]
    offenders = {}
    for name, sql in harness.ORACLES.items():
        types = [str(t) for t in con.sql(sql).types]
        hits = [t for t in types if any(b in t for b in banned)]
        if name not in _DECIMAL_FLOAT_PAIRED:
            hits += [t for t in types if "DECIMAL" in t]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        f"oracles declaring pandas-coercing DuckDB types (cast to "
        f"BIGINT/DOUBLE in the SQL): {offenders}"
    )


def test_range_search_nonempty(spark):
    """Guard against a vacuous radius: the range query must return >0
    rows (the self-match at dist 0 guarantees at least one)."""
    import vector_database_in_rust_spark.harness as h

    assert h.QUERIES["range_search"](spark, SF_SMOKE).count() >= 1


def test_window_composition():
    """Round 14: the driver window is GENERATED from the recorded
    CORRECTNESS ledger at harness import (``compose_front`` — the
    hand-maintained ``_ROUND{N}_WINDOW`` lists are retired), so this
    test pins the composition INVARIANTS rather than a verbatim list:

    * the active rotation IS the generated one (queries()[:50] ==
      compose_front over the ledger — a hand edit that bypasses the
      composer fails here);
    * every never-driver-verified query holds a front slot (r5
      verdict's recurrence fix: registry growth can never outrun
      verification);
    * refill slots go oldest-evidence-first (r6 verdict item 5);
    * nothing staler is left out while something fresher refills.

    The ledger walk (``last_green_rounds``) threads each rows-only
    lane's prior row count into the predicate's drift check (r13
    ADVICE), so a wrong-but-nonempty rows-only lane cannot read green
    indefinitely: a count change re-fronts the lane and re-anchors the
    baseline. Stability across the driver's own write: the composition
    happens at harness IMPORT, so the window the driver ran is the one
    composed from the ledger as of that import; this test recomputes
    from the same ledger and stays green until the next import sees
    the new round's file — at which point the window legitimately
    advances."""
    window = list(harness.QUERIES)[:50]
    assert len(set(window)) == 50
    verified = harness.last_green_rounds()
    assert window == harness.compose_front(verified)
    # Rows-only lanes (no DuckDB oracle) must stay the bounded
    # exception, never the norm: hash-verified lanes fill the rest.
    no_oracle = [q for q in window if q not in harness.ORACLES]
    assert len(no_oracle) <= 15, (
        f"{len(no_oracle)} rows-only window slots — the rows-only tier "
        f"is bounded at 15 lanes; hash-verified lanes must fill the rest"
    )

    never = {q for q in harness.QUERIES if q not in verified}
    missing = never - set(window)
    assert not missing, (
        f"queries would enter the next round unverified while "
        f"window slots go to re-verification: {sorted(missing)}"
    )
    never_oracle = {q for q in never if q in harness.ORACLES}
    assert len(never_oracle) <= 10, (
        f"verification debt grew: {len(never_oracle)} > 10"
    )

    # refill tail ordered by verification age (oldest green first)
    refill_rounds = [verified[q] for q in window if q in verified]
    assert refill_rounds == sorted(refill_rounds), (
        "re-verification slots must go to the least-recently-verified "
        f"queries first; got last-green sequence {refill_rounds}"
    )
    # staleness bound: no query left out of the window may hold older
    # evidence than the newest refilled one
    not_in_window = [
        q for q in harness.QUERIES if q in verified and q not in window
    ]
    if not_in_window and refill_rounds:
        oldest_left_out = min(verified[q] for q in not_in_window)
        assert oldest_left_out >= max(refill_rounds), (
            "a staler query was left out of the window while a fresher "
            "one holds a refill slot"
        )


def test_rotation_cadence_bound():
    """r13 verdict item 5: simulate rounds of rotation over the CURRENT
    registry (starting from the real recorded ledger) and assert no
    lane's evidence ever goes staler than ceil(|registry|/50) + 1
    rounds once the rotation warms up — the class of composer bug that
    silently starved the r08 cohort for four rounds (r12) trips this
    immediately, because a starved lane's staleness grows without
    bound."""
    import math

    registered = harness._REGISTRY_ORDER
    bound = math.ceil(len(registered) / 50) + 1
    state = dict(harness.last_green_rounds())
    start = max(state.values(), default=0)
    for rnd in range(start + 1, start + 1 + 3 * bound):
        window = harness.compose_front(state, registered=registered)
        assert len(window) == 50
        for q in window:
            state[q] = rnd  # the driver runs the window green
        if rnd >= start + bound:  # past warm-up: the bound must hold
            worst = min(state.get(q, 0) for q in registered)
            assert rnd - worst <= bound, (
                f"rotation starved a lane: staleness {rnd - worst} > "
                f"{bound} at simulated round {rnd}"
            )


def test_rows_only_drift_refronts():
    """The drift-aware predicate's contract, end to end on a synthetic
    ledger: a rows-only lane whose count changes reads non-green for
    that round (so the composer re-fronts it), and the baseline moves
    to the new count so the NEXT run at the new count re-greens."""
    row = {"rows_match": None, "schema_match": True, "hash_match": None,
           "spark_rows": 59, "oracle_rows": None, "err": "no_oracle"}
    drifted = dict(row, spark_rows=58)
    assert harness.correctness_row_green(row, prior_rows=None)
    assert harness.correctness_row_green(row, prior_rows=59)
    assert not harness.correctness_row_green(drifted, prior_rows=59)
    assert harness.correctness_row_green(drifted, prior_rows=58)
    # the ledger walk applies exactly that sequence
    import json

    def fake(tmpdir, rnd, rows):
        p = tmpdir / f"CORRECTNESS_r{rnd:02d}.json"
        p.write_text(json.dumps(rows))
        return str(p)

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        paths = [
            fake(td, 1, {"lane": row}),
            fake(td, 2, {"lane": drifted}),   # drift: not green
            fake(td, 3, {"lane": drifted}),   # re-anchored: green
        ]
        lg = harness.last_green_rounds(paths)
        assert lg == {"lane": 3}
        lg12 = harness.last_green_rounds(paths[:2])
        assert lg12 == {"lane": 1}


def test_docs_cite_only_registered_queries():
    """r13 verdict item 3: PARITY.md is the authoritative operator
    inventory and QUERIES.md the generated catalog — neither may name
    a ★/◦ query the registry can't serve (the r13 audit found three
    retired stub lanes still cited). Every backticked query marker in
    both docs must resolve in harness.QUERIES, so doc drift on a lane
    retirement fails here instead of surviving four rounds."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pat = re.compile(r"[★◦]`([A-Za-z0-9_]+)`")
    for doc in ("PARITY.md", "QUERIES.md"):
        with open(os.path.join(root, doc)) as fh:
            cited = set(pat.findall(fh.read()))
        missing = sorted(cited - set(harness.QUERIES))
        assert not missing, f"{doc} cites unregistered queries: {missing}"
    # and the generated catalog covers the whole registry
    with open(os.path.join(root, "QUERIES.md")) as fh:
        text = fh.read()
    uncatalogued = [q for q in harness.QUERIES if f"`{q}`" not in text]
    assert not uncatalogued, (
        f"QUERIES.md is stale — run scripts/gen_queries_md.py; "
        f"missing: {uncatalogued[:5]}"
    )


def test_rotation_is_a_pure_permutation():
    """Rotation must only PERMUTE the registry: every registered query
    appears exactly once, and every oracle key still names a registered
    query — no adds, drops, or re-pairings."""
    names = list(harness.QUERIES)
    assert len(names) == len(set(names))
    assert set(harness.ORACLES) <= set(names)
