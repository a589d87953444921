"""ANN recall regression gate (r5 verdict item 4): the published
recall@10 table (NOTES / scripts/ann_recall_table.py) is enforced, not
just printed. Rules, as recorded in NOTES_r5.md:

* full-probe rows (IVF nprobe=16, hier all-cells, exact control) must
  sit at exactly 1.0 — approximation may come ONLY from pruning. The
  LSH rows are NOT in this set: their measured 1.0 is a property of the
  seeded corpus, not a structural guarantee (see FULL_PROBE below);
* pruned rows may not drop more than 0.05 absolute below the recorded
  value without a declared setting change (every build/search seed is
  fixed, so in practice the numbers reproduce exactly; the tolerance
  absorbs library-version drift, not regressions).

Both corpora are gated: the driver's uniform embeddings (structure-free
adversarial control) and the structured synthetic corpus (planted
clusters + MRL decay — the shape trained embedding models produce),
where the funnel operators must show their real behavior (>= 0.9).
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE
from vector_database_in_rust_spark.operators.ann_eval import (
    recall_grid,
    structured_embeddings,
)

# Recorded table, round 6 (uniform == the round-5 published table plus
# the tuned hier default row; structured measured this round).
UNIFORM_EXPECTED = {
    ("IVF flat (16 cells)", "nprobe=4"): 0.781,
    ("IVF flat (16 cells)", "nprobe=8"): 0.913,
    ("IVF flat (16 cells)", "nprobe=10"): 0.963,
    ("IVF flat (16 cells)", "nprobe=16"): 1.0,
    ("Hierarchical IVF (8x8)", "nprobe_l1=3, nprobe=8"): 0.550,
    ("Hierarchical IVF (8x8)", "default (k1, total/2)"): 0.931,
    ("Hierarchical IVF (8x8)", "nprobe_l1=8, nprobe=64"): 1.0,
    ("IVF-PQ (m=8, ksub=16)", "nprobe=16, refine=0"): 0.412,
    ("IVF-PQ (m=8, ksub=16)", "nprobe=16, refine=4"): 0.713,
    ("IVF-PQ (m=8, ksub=16)", "nprobe=16, refine=16"): 0.963,
    ("Multi-probe LSH (8 tables)", "radius=0"): 1.0,
    ("Multi-probe LSH (8 tables)", "radius=1"): 1.0,
    ("BQ funnel (Hamming->exact)", "refine_factor=4"): 0.644,
    ("BQ funnel (Hamming->exact)", "refine_factor=16"): 0.944,
    ("Matryoshka funnel", "prefix=16, refine_factor=4"): 0.469,
    ("Exact scan (control)", "-"): 1.0,
}

STRUCTURED_EXPECTED = {
    ("IVF flat (16 cells)", "nprobe=4"): 1.0,
    ("IVF flat (16 cells)", "nprobe=8"): 1.0,
    ("IVF flat (16 cells)", "nprobe=10"): 1.0,
    ("IVF flat (16 cells)", "nprobe=16"): 1.0,
    ("Hierarchical IVF (8x8)", "nprobe_l1=3, nprobe=8"): 1.0,
    ("Hierarchical IVF (8x8)", "default (k1, total/2)"): 1.0,
    ("Hierarchical IVF (8x8)", "nprobe_l1=8, nprobe=64"): 1.0,
    ("IVF-PQ (m=8, ksub=16)", "nprobe=16, refine=0"): 0.556,
    ("IVF-PQ (m=8, ksub=16)", "nprobe=16, refine=4"): 0.981,
    ("IVF-PQ (m=8, ksub=16)", "nprobe=16, refine=16"): 1.0,
    ("Multi-probe LSH (8 tables)", "radius=0"): 1.0,
    ("Multi-probe LSH (8 tables)", "radius=1"): 1.0,
    ("BQ funnel (Hamming->exact)", "refine_factor=4"): 0.850,
    ("BQ funnel (Hamming->exact)", "refine_factor=16"): 1.0,
    ("Matryoshka funnel", "prefix=16, refine_factor=4"): 1.0,
    ("Exact scan (control)", "-"): 1.0,
}

# Rows whose probe budget covers everything: approximation-free by
# construction, must be exactly 1.0. LSH rows are NOT here — their 1.0
# is a measured property of the seeded corpus (bucket-union candidate
# sets carry no structural guarantee), so they get the same 0.05
# tolerance as every other genuinely-approximate row.
FULL_PROBE = {
    ("IVF flat (16 cells)", "nprobe=16"),
    ("Hierarchical IVF (8x8)", "nprobe_l1=8, nprobe=64"),
    ("Exact scan (control)", "-"),
}

TOLERANCE = 0.05


def _check(grid: dict, expected: dict) -> list[str]:
    problems = []
    missing = set(expected) - set(grid)
    if missing:
        problems.append(f"grid rows disappeared: {sorted(missing)}")
    for key, want in expected.items():
        got = grid.get(key)
        if got is None:
            continue
        if key in FULL_PROBE:
            if got < 1.0:
                problems.append(f"{key}: full-probe row dropped to {got:.3f}")
        elif got < want - TOLERANCE:
            problems.append(f"{key}: {got:.3f} < recorded {want:.3f} - {TOLERANCE}")
    return problems


def test_recall_table_uniform(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    problems = _check(recall_grid(emb), UNIFORM_EXPECTED)
    assert not problems, "\n".join(problems)


def test_recall_table_structured(spark):
    grid = recall_grid(structured_embeddings(spark))
    problems = _check(grid, STRUCTURED_EXPECTED)
    # the structured corpus is the one where funnels must WORK, not
    # merely match a recorded number (r5 verdict item 6's bar)
    assert grid[("Matryoshka funnel", "prefix=16, refine_factor=4")] >= 0.9
    assert grid[("Hierarchical IVF (8x8)", "default (k1, total/2)")] >= 0.9
    assert not problems, "\n".join(problems)


# Verdict-twin margin record (r7 verdict item 5). The driver-hash
# verdicts ann_multiprobe_verdict / ann_rebalance_verdict assert
# measured-quality clears a bar; these are the measured values at
# SF_ORACLE and the drift bars that must hold so a tuning change
# erodes a pytest margin BEFORE it can flip a driver hash.
MPLSH_R0_RECALL_RECORDED = 1.0     # vs verdict bar harness._MPLSH_MIN_RECALL
MPLSH_R0_MIN_HEADROOM = 0.25       # recall must stay >= bar + this
REBAL_RATIO_RECORDED = 1.926       # realized max/mean vs bound _REBAL_FACTOR
REBAL_RATIO_DRIFT = 0.05           # seeded build: tiny library-drift allowance


def test_verdict_twin_margins(spark):
    """Measure the exact quantities the two r7 verdict twins binarize,
    and gate their margins:

    * multiprobe radius-0 recall — recorded 1.0 against the verdict
      bar ``harness._MPLSH_MIN_RECALL`` (0.5). The gate demands the
      bar itself stays sane AND the measured recall keeps
      ``MPLSH_R0_MIN_HEADROOM`` above it.
    * rebalance occupancy ratio — recorded 1.926 against the verdict
      bound ``harness._REBAL_FACTOR`` (2.0). Thin by construction
      (the split loop stops the moment the bound holds), so the gate
      pins the REALIZED ratio: it must stay below recorded + drift,
      and strictly below the bound — the same seeded build the driver
      hashes.
    """
    from vector_database_in_rust_spark import harness
    from vector_database_in_rust_spark.operators.knn import knn_exact

    emb = harness._emb(spark, SF_ORACLE)
    q = harness._query_vec(spark, SF_ORACLE, 0)
    idx = harness._mplsh_index(spark, SF_ORACLE)
    exact = {r["vec_id"] for r in knn_exact(emb, q, harness.KNN_K).collect()}
    r0 = {
        r["vec_id"]
        for r in idx.search(q, harness.KNN_K, emb, probe_radius=0).collect()
    }
    r0_recall = len(exact & r0) / len(exact)
    bar = harness._MPLSH_MIN_RECALL
    assert bar + MPLSH_R0_MIN_HEADROOM <= MPLSH_R0_RECALL_RECORDED, (
        "the verdict bar was tuned too close to the recorded recall — "
        "re-measure and re-record before raising _MPLSH_MIN_RECALL"
    )
    assert r0_recall >= bar + MPLSH_R0_MIN_HEADROOM, (
        f"multiprobe r0 recall {r0_recall:.3f} eroded to within "
        f"{MPLSH_R0_MIN_HEADROOM} of the driver-verdict bar {bar}"
    )

    reb, _, _ = harness._rebalanced_index(spark, SF_ORACLE)
    occ = [r["n_vectors"] for r in reb.cell_stats().collect()]
    ratio = max(occ) / (sum(occ) / len(occ))
    assert ratio < harness._REBAL_FACTOR, (
        f"occupancy ratio {ratio:.3f} violates the verdict bound — the "
        "driver hash for ann_rebalance_verdict would flip"
    )
    assert ratio <= REBAL_RATIO_RECORDED + REBAL_RATIO_DRIFT, (
        f"occupancy ratio drifted: {ratio:.3f} > recorded "
        f"{REBAL_RATIO_RECORDED} + {REBAL_RATIO_DRIFT}"
    )


# SemDeDup cross-cluster miss rate (round-9 verdict item 3): the paper
# ACCEPTS missing near-dup pairs whose members fall in different
# clusters; the engine now MEASURES that blindness the way the LSH
# lanes measure recall. Recorded at the planted straddle corpus
# (ann_eval.straddle_embeddings, 6 orthogonal clusters, pairs at
# cosine >= 0.9995 planted 0.75 deg either side of cluster-boundary
# midpoints; realized classes read from the fitted cells because
# KMeans|| is partition-dependent).
SEMDEDUP_STRADDLE_MISS_RECORDED = 1.0   # every realized-straddle pair missed
SEMDEDUP_MIN_STRADDLE_REALIZED = 4      # non-vacuity floor (12 planted)


def test_semantic_dedup_straddle_miss_measured(spark):
    """within_recall is invariant-backed (the greedy forbids two kept
    near-dups in one cell) and must be exactly 1.0; straddle_miss is
    the measured contract cost — if it DROPS, cluster-scoped dedup
    silently started resolving cross-cluster pairs (a semantics
    change, not an improvement to wave through); if the realized
    count collapses, the measurement went vacuous."""
    from vector_database_in_rust_spark.operators.ann_eval import (
        semantic_straddle_stats,
    )

    stats = semantic_straddle_stats(spark)
    assert stats["n_straddle_realized"] >= SEMDEDUP_MIN_STRADDLE_REALIZED, (
        f"only {stats['n_straddle_realized']} planted pairs straddled the "
        "fitted cells — the corpus no longer exercises the miss path"
    )
    assert stats["within_recall"] == 1.0, (
        f"within-cluster recall {stats['within_recall']} < 1.0 violates "
        "the greedy invariant — operator bug, not approximation"
    )
    assert stats["straddle_miss"] >= SEMDEDUP_STRADDLE_MISS_RECORDED - 0.2, (
        f"straddle miss {stats['straddle_miss']} fell below recorded "
        f"{SEMDEDUP_STRADDLE_MISS_RECORDED} - 0.2: cross-cluster behavior "
        "changed — re-measure and re-record deliberately"
    )
