"""Corpus-curation operator semantics: verdict precedence on a
constructed corpus (the synthetic corpus has no exact dups, so the
oracle-parity check alone never exercises dup reasons), and the
determinism/stability contract of hash sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.curation import (
    curate_corpus,
    sample_threshold_hex,
    stratified_sample,
    vocab_top_tokens,
)
from tests.conftest import SF_SMOKE

GOOD = (
    "the cat sat on the mat and it is a story of a cat in a hat "
    "with many words to clear the length bar " * 5
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")


def test_curate_precedence(spark):
    rows = [
        (1, GOOD, "en"),                       # kept
        (2, GOOD, "en"),                       # exact dup of 1
        # same token multiset, different order -> fingerprint dup of 1
        (3, " ".join(reversed(GOOD.split(" "))), "en"),
        (4, "tiny low quality doc", "en"),     # low_quality
        (5, GOOD + " zh-doc-marker", "zh"),    # lang (quality passes)
    ]
    got = {
        r["doc_id"]: (r["kept"], r["drop_reason"])
        for r in curate_corpus(_docs(spark, rows), min_quality=0.45).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (False, "exact_dup")
    assert got[3] == (False, "fingerprint_dup")
    assert got[4] == (False, "low_quality")
    assert got[5] == (False, "lang")


def test_curate_exact_dup_outranks_quality(spark):
    """A doc that is BOTH an exact dup and low quality reports the
    higher-precedence reason."""
    rows = [(1, "tiny doc", "en"), (2, "tiny doc", "en")]
    got = {
        r["doc_id"]: r["drop_reason"]
        for r in curate_corpus(_docs(spark, rows), min_quality=0.45).collect()
    }
    assert got[1] == "low_quality"
    assert got[2] == "exact_dup"


def test_sample_threshold_hex_bounds():
    assert sample_threshold_hex(0.0) == "000000"
    assert sample_threshold_hex(1.0) == "g"  # sorts above every hex key
    assert sample_threshold_hex(0.5) == "800000"


def test_stratified_sample_fraction_one_keeps_all(spark):
    """Regression: fraction 1.0 must keep EVERY doc of that language
    (the 7-char '1000000' threshold bug dropped most keys)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_en = docs.filter(F.col("lang") == "en").count()
    got = stratified_sample(docs, {"en": 1.0}).count()
    assert got == n_en


def test_stratified_sample_deterministic_and_stable(spark):
    """Same rows selected on every run AND when the corpus grows —
    the membership of an id is independent of the other rows."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    frac = {"en": 0.5, "de": 0.8}
    a = {r["doc_id"] for r in stratified_sample(docs, frac).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs.repartition(7), frac).collect()}
    assert a == b
    half = docs.filter(F.col("doc_id") < 250)
    c = {r["doc_id"] for r in stratified_sample(half, frac).collect()}
    assert c == {d for d in a if d < 250}


def test_stratified_sample_fraction_accuracy(spark):
    """Measured per-language rates within a few points of the target
    (md5 is uniform; 500-doc corpus -> loose bars)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    frac = {"en": 0.5, "de": 0.8, "zh": 0.25}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, frac)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) <= set(frac)
    for lang, f in frac.items():
        rate = got.get(lang, 0) / totals[lang]
        assert abs(rate - f) < 0.15, f"{lang}: {rate} vs {f}"


def test_vocab_top_tokens_rank_contract(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = vocab_top_tokens(docs, k=5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append((r["rank"], r["n"], r["token"]))
    for lang, rows in by_lang.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # counts non-increasing with rank; ties broken by token asc
        for (r1, n1, t1), (r2, n2, t2) in zip(rows, rows[1:]):
            assert n1 > n2 or (n1 == n2 and t1 < t2)


def test_pipeline_manifest_matches_stagewise_composition(spark):
    """The composed pipeline's manifest totals must equal running the
    stages independently: sum(n_chunks) == chunk count of the kept
    docs, sum over shards of n_tokens == total chunk tokens, and the
    doc coverage equals the kept set."""
    from tests.conftest import SF_SMOKE
    from vector_database_in_rust_spark.operators.curation import curate_corpus
    from vector_database_in_rust_spark.operators.packing import chunk_documents
    from vector_database_in_rust_spark.operators.pipeline import (
        curate_chunk_shard,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    manifest = curate_chunk_shard(docs).collect()
    assert {r["shard"] for r in manifest} <= set(range(8))

    kept = curate_corpus(docs, min_quality=0.45).filter(F.col("kept")).select(
        "doc_id"
    )
    chunks = chunk_documents(docs.join(kept, "doc_id"))
    agg = chunks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("tok"),
        F.countDistinct("doc_id").alias("docs"),
    ).first()
    assert sum(r["n_chunks"] for r in manifest) == agg["n"]
    assert sum(r["total_tokens"] for r in manifest) == agg["tok"]
    # every kept doc appears in some shard (chunking emits >=1 chunk/doc)
    assert sum(r["n_docs"] for r in manifest) >= agg["docs"]


def test_curate_repetition_gate_default_off(spark):
    """Without thresholds the verdicts must be byte-identical to the
    original contract — no 'repetition' reason can appear."""
    rows = [(1, GOOD, "en"), (2, "spam spam spam spam spam", "en")]
    reasons = {
        r["doc_id"]: r["drop_reason"]
        for r in curate_corpus(_docs(spark, rows), min_quality=0.0).collect()
    }
    assert "repetition" not in set(reasons.values())


def test_curate_repetition_gate_flags_boilerplate(spark):
    # NB: GOOD itself is a x5-repeated phrase — the gate would (rightly)
    # flag it, so the kept doc here is all-distinct tokens instead.
    rows = [
        (1, " ".join(f"w{i}" for i in range(150)), "en"),
        (2, "buy now " * 60, "en"),  # dup-trigram ~1, top-token 0.5
    ]
    got = {
        r["doc_id"]: (r["kept"], r["drop_reason"])
        for r in curate_corpus(
            _docs(spark, rows),
            min_quality=0.0,
            max_top_token_frac=0.3,
            max_dup_trigram_frac=0.5,
        ).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (False, "repetition")


def test_curate_repetition_below_low_quality_precedence(spark):
    """A doc that is both low quality and repetitive reports
    low_quality (precedence 3 beats 4)."""
    rows = [(1, "spam spam spam spam", "en")]
    row = curate_corpus(
        _docs(spark, rows),
        min_quality=0.9,
        max_top_token_frac=0.3,
        max_dup_trigram_frac=0.5,
    ).collect()[0]
    assert row["drop_reason"] == "low_quality"


def test_mix_corpus_integer_weight_exact_copies(spark):
    from vector_database_in_rust_spark.operators.curation import mix_corpus

    rows = [(i, f"doc {i}", "en") for i in range(10)]
    out = mix_corpus(_docs(spark, rows), {"en": 2.0}).collect()
    assert len(out) == 20
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy"])
    assert all(sorted(v) == [1, 2] for v in by_doc.values())


def test_mix_corpus_fractional_weight_deterministic(spark):
    from vector_database_in_rust_spark.operators.curation import mix_corpus

    rows = [(i, f"doc {i}", "fr") for i in range(200)]
    a = sorted(
        (r["doc_id"], r["copy"])
        for r in mix_corpus(_docs(spark, rows), {"fr": 1.5}).collect()
    )
    b = sorted(
        (r["doc_id"], r["copy"])
        for r in mix_corpus(
            _docs(spark, rows).repartition(7), {"fr": 1.5}
        ).collect()
    )
    assert a == b
    n = len(a)
    assert 200 * 1.3 < n < 200 * 1.7  # expectation 300 +/- sampling noise


def test_mix_corpus_unlisted_language_dropped(spark):
    from vector_database_in_rust_spark.operators.curation import mix_corpus

    rows = [(1, "x", "en"), (2, "y", "zz")]
    out = mix_corpus(_docs(spark, rows), {"en": 1.0}).collect()
    assert [(r["doc_id"], r["lang"]) for r in out] == [(1, "en")]


def test_mix_corpus_negative_weight_raises(spark):
    import pytest as _pytest

    from vector_database_in_rust_spark.operators.curation import mix_corpus

    with _pytest.raises(ValueError):
        mix_corpus(_docs(spark, [(1, "x", "en")]), {"en": -0.5})


class TestShuffleAndBuckets:
    def test_corpus_shuffle_is_a_permutation_and_seed_sensitive(self, spark):
        from pyspark.sql import functions as F

        from vector_database_in_rust_spark.operators.curation import corpus_shuffle
        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        n = docs.count()
        s1 = corpus_shuffle(docs, seed=42)
        rows = s1.collect()
        assert sorted(r["position"] for r in rows) == list(range(1, n + 1))
        assert len({r["doc_id"] for r in rows}) == n
        # deterministic: same seed -> same order; new seed -> new order
        again = {r["doc_id"]: r["position"] for r in corpus_shuffle(docs, seed=42).collect()}
        assert all(again[r["doc_id"]] == r["position"] for r in rows)
        other = {r["doc_id"]: r["position"] for r in corpus_shuffle(docs, seed=7).collect()}
        assert any(other[r["doc_id"]] != r["position"] for r in rows)

    def test_length_buckets_monotone_and_balanced(self, spark):
        from vector_database_in_rust_spark.operators.curation import length_buckets
        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        rows = length_buckets(docs, n_buckets=8).collect()
        n = len(rows)
        # bucket sizes differ by at most 1 (NTILE contract)
        from collections import Counter

        sizes = Counter(r["bucket"] for r in rows)
        assert set(sizes) == set(range(1, 9))
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # monotone: every doc in bucket b is no longer than any doc in b+1
        by_bucket = {}
        for r in rows:
            by_bucket.setdefault(r["bucket"], []).append(r["n_tokens"])
        for b in range(1, 8):
            # ties may straddle the boundary, hence <= not <
            assert max(by_bucket[b]) <= min(by_bucket[b + 1])


def test_holdout_split_covers_all_and_is_stable(spark):
    """Every doc lands in exactly one split; assignment is a pure
    function of (salt, id) — stable under re-computation and corpus
    growth; shares track the fractions."""
    from vector_database_in_rust_spark.operators.curation import holdout_split

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n = docs.count()
    out = holdout_split(docs).collect()
    assert len(out) == n
    by_split = {}
    assign = {}
    for r in out:
        by_split[r["split"]] = by_split.get(r["split"], 0) + 1
        assign[r["doc_id"]] = r["split"]
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] / n > 0.8  # 0.9 nominal, small-sample slack
    # growth stability: splitting HALF the corpus gives identical
    # assignments for the shared ids
    half = holdout_split(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    for r in half:
        assert assign[r["doc_id"]] == r["split"]
    # a different salt reshuffles at least something
    other = holdout_split(docs, salt="epoch2").collect()
    assert any(assign[r["doc_id"]] != r["split"] for r in other)


def test_holdout_split_validates_fractions(spark):
    import pytest as _pytest

    from vector_database_in_rust_spark.operators.curation import holdout_split

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    with _pytest.raises(ValueError, match="sum to 1"):
        holdout_split(docs, [("train", 0.5), ("val", 0.1)])
    with _pytest.raises(ValueError, match="two splits"):
        holdout_split(docs, [("train", 1.0)])


def test_cluster_size_histogram_counts(spark):
    """Histogram must invert to the labeling: sum(size * n_clusters)
    == labeled docs, and a hand-built labeling reproduces exactly."""
    from vector_database_in_rust_spark.operators.dedup import (
        cluster_size_histogram,
    )

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "doc_id LONG, cluster_id LONG",
    )
    got = {
        r["cluster_size"]: r["n_clusters"]
        for r in cluster_size_histogram(labels).collect()
    }
    assert got == {3: 1, 2: 1, 1: 1}


def test_dsir_tilts_toward_target_language(spark):
    """The defining DSIR property: documents whose token distribution
    matches the target slice must outscore off-target documents. Build
    a corpus where 'en' docs share a vocabulary and 'fr' docs use a
    disjoint one — every selected top doc must be 'en', and every 'en'
    doc must carry positive weight."""
    import pandas as pd

    from vector_database_in_rust_spark.operators.curation import dsir_select

    en = ["alpha beta gamma delta"] * 6
    fr = ["zut alors voila bien"] * 6
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(12),
                "text": en + fr,
                "lang": ["en"] * 6 + ["fr"] * 6,
            }
        )
    )
    out = dsir_select(docs, k=6).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3, 4, 5]
    assert all(r["weight"] > 0 for r in out)
    # off-target docs score strictly negative under the ratio
    all12 = dsir_select(docs, k=12).collect()
    assert all(r["weight"] < 0 for r in all12 if r["doc_id"] >= 6)


def test_dsir_weight_is_order_invariant(spark):
    """Same corpus, different row order: identical weights (the LM
    tables and totals are aggregates, so input order cannot leak)."""
    import pandas as pd

    from vector_database_in_rust_spark.operators.curation import dsir_select

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c", "a a b", "x y z", "c b a"],
            "lang": ["en", "en", "fr", "de"],
        }
    )
    w1 = {r["doc_id"]: r["weight"] for r in dsir_select(spark.createDataFrame(pdf), k=4).collect()}
    w2 = {
        r["doc_id"]: r["weight"]
        for r in dsir_select(
            spark.createDataFrame(pdf.iloc[::-1]), k=4
        ).collect()
    }
    assert w1 == w2


def test_source_cap_bounds_and_determinism(spark):
    from vector_database_in_rust_spark.operators.curation import source_cap

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = source_cap(docs, max_per_source=10)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per and all(n <= 10 for n in per.values())
    # every source with >= 10 docs is filled to exactly the cap
    full = {
        r["source"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).where("n >= 10").collect()
    }
    assert all(per[s] == 10 for s in full)
    # survivors are a pure function of (seed, id): invariant under repartition
    again = source_cap(docs.repartition(7), max_per_source=10)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # a different seed picks a different survivor set (not a constant gate)
    other = source_cap(docs, max_per_source=10, seed=7)
    assert {r["doc_id"] for r in out.collect()} != {r["doc_id"] for r in other.collect()}


def test_weighted_sample_tilts_toward_heavy_and_is_deterministic(spark):
    from vector_database_in_rust_spark.operators.curation import weighted_sample

    rows = [(i, 1000 if i % 2 == 0 else 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = weighted_sample(df, 60)
    got = out.collect()
    assert len(got) == 60
    heavy = sum(1 for r in got if r["weight"] == 1000)
    # 100:1 weight ratio -> heavy docs should dominate the sample
    assert heavy >= 50
    # descending es_key order, doc_id tiebreak
    keys = [(-r["es_key"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)
    # pure function of (seed, id, weight): invariant under repartition
    again = weighted_sample(df.repartition(13), 60).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_leakage_safe_split_clusters_never_straddle(spark):
    from vector_database_in_rust_spark.operators.curation import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        # two clusters: {3,17,55} canonical 3, {8,9} canonical 8
        [(3, 3), (17, 3), (55, 3), (8, 8), (9, 8)],
        "doc_id long, cluster_id long",
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, clusters).collect()}
    assert len(out) == 100
    assert {out[i]["split"] for i in (3, 17, 55)} == {out[3]["split"]}
    assert out[8]["split"] == out[9]["split"]
    assert out[17]["canonical_id"] == 3 and out[9]["canonical_id"] == 8
    # singletons are their own canonical and match plain holdout_split
    from vector_database_in_rust_spark.operators.curation import holdout_split

    plain = {r["doc_id"]: r["split"] for r in holdout_split(docs).collect()}
    for i in range(100):
        if i not in (3, 17, 55, 8, 9):
            assert out[i]["canonical_id"] == i
            assert out[i]["split"] == plain[i]


def test_curriculum_order_phases_and_determinism(spark):
    """Phase boundaries honor the quality tiers (floor(q*n) clamped),
    the within-phase key is the corpus_shuffle md5 key, and two runs
    (any partitioning) produce identical rows; a different seed
    reorders within phases but never moves a document across phases."""
    from vector_database_in_rust_spark.operators.curation import (
        curriculum_order,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = curriculum_order(docs, n_phases=4, seed=42).orderBy("doc_id")
    b = curriculum_order(docs.repartition(7), n_phases=4, seed=42).orderBy(
        "doc_id"
    )
    ra, rb = a.collect(), b.collect()
    assert ra == rb
    for r in ra:
        assert r["phase"] == min(int(r["quality"] * 4), 3)
    c = {
        r["doc_id"]: r
        for r in curriculum_order(docs, n_phases=4, seed=7).collect()
    }
    moved = [r for r in ra if c[r["doc_id"]]["phase"] != r["phase"]]
    rekeyed = [r for r in ra if c[r["doc_id"]]["order_key"] != r["order_key"]]
    assert not moved
    assert len(rekeyed) == len(ra)
