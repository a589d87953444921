"""The composed dedup-centric pretraining pipeline (round 12, verdict
item 5): stage wiring, cross-stage invariants, and planted-near-dup
behavior. Each stage is verified on its own elsewhere; these tests pin
the INTERACTIONS — survivor sets nest, canonicals survive, the split
partitions, packing conserves — the failure modes only composition has."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.pipeline import (
    pretrain_dedup_stages,
    pretrain_dedup_verdict,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_stages_nest_and_verdict_all_true(spark):
    docs = _docs(spark)
    stages = pretrain_dedup_stages(docs, persist_boundaries=True)
    n_curated = stages["curated"].count()
    n_minhash = stages["minhash"].count()
    n_surv = stages["survivors"].count()
    assert n_curated >= n_minhash >= n_surv > 0
    # survivor sets nest: each stage's output is a subset of its input
    assert stages["minhash"].join(
        stages["curated"], "doc_id", "left_anti"
    ).count() == 0
    assert stages["survivors"].join(
        stages["minhash"], "doc_id", "left_anti"
    ).count() == 0
    # the split covers the survivors exactly once
    assert stages["split"].count() == n_surv
    row = pretrain_dedup_verdict(docs).collect()[0]
    assert row["n_input"] == docs.count()
    assert row["n_curated"] == n_curated
    for flag in (
        "minhash_nonincreasing",
        "minhash_keeps_canonicals",
        "semantic_subset",
        "split_partitions_survivors",
        "pack_tokens_conserved",
    ):
        assert row[flag] is True, flag
    for df in ("curated", "minhash", "survivors"):
        stages[df].unpersist()


def test_planted_near_dup_dropped_canonical_kept(spark):
    """Append a one-token-perturbed copy of a surviving document: the
    copy must cluster with its source in the minhash stage and be
    dropped (non-canonical), while the source survives."""
    docs = _docs(spark)
    base = pretrain_dedup_stages(docs, persist_boundaries=False)
    # a minhash survivor with enough tokens for a high-Jaccard twin
    src = (
        base["minhash"]
        .filter(F.size(F.split("text", " ")) >= 30)
        .orderBy("doc_id")
        .first()
    )
    assert src is not None
    new_id = docs.agg(F.max("doc_id")).first()[0] + 1
    twin = spark.createDataFrame(
        [(new_id, src["text"] + " zqx", src["lang"], src["source"])],
        "doc_id BIGINT, text STRING, lang STRING, source STRING",
    )
    planted = docs.select("doc_id", "text", "lang", "source").unionByName(
        twin
    )
    stages = pretrain_dedup_stages(planted, persist_boundaries=False)
    surv_ids = {
        r["doc_id"] for r in stages["minhash"].select("doc_id").collect()
    }
    assert src["doc_id"] in surv_ids, "canonical source must survive"
    assert new_id not in surv_ids, "planted near-dup must be dropped"
    cl = {
        r["doc_id"]: r["cluster_id"]
        for r in stages["clusters"].collect()
    }
    assert cl.get(new_id) == src["doc_id"], (
        "twin must cluster under its source as canonical"
    )


def test_semantic_survival_target_calibrates_stage(spark):
    """Round 13: semantic_survival_target replaces the fixed eps with a
    calibrated one — the semantic stage's measured keep fraction must
    land near the target (the r12 5M run showed a fixed eps drifting
    67% -> 11% across corpus sizes; the knob exists so 'keep ~X%'
    survives scale). Tolerance is loose at this tiny corpus (calibrator
    contract tests pin +-10% at larger sizes)."""
    docs = _docs(spark)
    target = 0.5
    stages = pretrain_dedup_stages(
        docs,
        persist_boundaries=True,
        semantic_survival_target=target,
        min_quality=0.35,
    )
    decisions = stages["semantic_keep"].collect()
    survival = sum(1 for r in decisions if r["keep"]) / len(decisions)
    assert abs(survival - target) <= 0.15, f"survival {survival:.3f}"
    # composition stays lossless: survivors == kept decisions
    assert stages["survivors"].count() == sum(
        1 for r in decisions if r["keep"]
    )
