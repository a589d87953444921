"""Hand-computed cases for the text-analysis operators that the
synthetic-corpus oracle parity can't pin down tightly (the corpus has
low natural repetition, so repetition_stats needs constructed docs with
known duplicate-n-gram counts)."""

from __future__ import annotations

import pytest

from vector_database_in_rust_spark.operators.textstats import (
    redact_pii,
    repetition_stats,
)


def _stats(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")
    row = repetition_stats(df).collect()[0]
    return (
        row["top_token_frac"],
        row["dup_bigram_frac"],
        row["dup_trigram_frac"],
    )


@pytest.mark.parametrize(
    "text,expected",
    [
        # 4x "a": bigrams = [a a]x3 (2 dup), trigrams = [a a a]x2 (1 dup)
        ("a a a a", (1.0, round(1 - 1 / 3, 6), 0.5)),
        ("a b c d", (0.25, 0.0, 0.0)),
        # single token: no n-grams at all -> 0.0 by definition
        ("x", (1.0, 0.0, 0.0)),
        # "a b a b a": top = 3/5; bigrams ab,ba,ab,ba -> 1-2/4;
        # trigrams aba,bab,aba -> 1-2/3
        ("a b a b a", (0.6, 0.5, round(1 - 2 / 3, 6))),
    ],
)
def test_repetition_stats_hand_computed(spark, text, expected):
    assert _stats(spark, text) == pytest.approx(expected, abs=1e-9)


def test_repetition_stats_flags_boilerplate(spark):
    """The filter semantics: a boilerplate doc (one phrase repeated)
    scores far above a diverse doc on every signal."""
    rows = [
        (1, "click here to subscribe " * 30),
        (2, " ".join(f"w{i}" for i in range(120))),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["dup_trigram_frac"] > 0.9 > got[2]["dup_trigram_frac"]
    assert got[1]["top_token_frac"] > 0.2 > got[2]["top_token_frac"]

def _redact_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")
    return redact_pii(df).collect()[0]


def test_redact_pii_all_categories(spark):
    row = _redact_one(
        spark,
        "mail alice.smith+x@corp.example.org server 192.168.1.254 "
        "desk +44 123-4567 done",
    )
    assert row["text"] == "mail <EMAIL> server <IP> desk <PHONE> done"
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (1, 1, 1)


def test_redact_pii_counts_multiple(spark):
    row = _redact_one(spark, "a@b.co c@d.io and 10.0.0.1 10.0.0.2 10.0.0.3")
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (2, 3, 0)
    assert row["text"] == "<EMAIL> <EMAIL> and <IP> <IP> <IP>"


def test_redact_pii_clean_text_untouched(spark):
    clean = "no personal data here just words and numbers like 42"
    row = _redact_one(spark, clean)
    assert row["text"] == clean
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (0, 0, 0)


def test_redact_pii_ip_not_double_counted_as_phone(spark):
    """An IP must be consumed by the IP stage, never re-matched by the
    phone stage (stage order is part of the contract)."""
    row = _redact_one(spark, "ping 255.255.255.255 then dial 800-555-1234")
    assert (row["n_ips"], row["n_phones"]) == (1, 1)
    assert row["text"] == "ping <IP> then dial <PHONE>"


def test_redact_pii_idempotent(spark):
    """Redacting already-redacted text is a no-op: placeholders contain
    no redactable substrings, so the pass is safely re-runnable
    (pipeline retries must not double-mangle)."""
    texts = [
        "a@b.co then 10.0.0.1 then 555-123-4567",
        "mixed a@b.co 10.0.0.1 a@b.co end",
        "clean text with no pii at all",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    once = redact_pii(df).select("doc_id", "text")
    twice = redact_pii(once).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )
    again = redact_pii(twice)
    assert all(
        r["n_emails"] == r["n_ips"] == r["n_phones"] == 0
        for r in again.collect()
    )


def test_repetition_stats_bounds(spark):
    """All three signals live in [0, 1] for arbitrary token shapes."""
    texts = ["x", "a a", "a b c a b c " * 10, " ".join(f"t{i}" for i in range(500))]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    for r in repetition_stats(df).collect():
        for c in ("top_token_frac", "dup_bigram_frac", "dup_trigram_frac"):
            assert 0.0 <= r[c] <= 1.0, (r["doc_id"], c, r[c])


def test_bigram_lm_golden_and_contract(spark):
    """Golden: in a one-doc corpus 'a b a b', every transition is
    certain (P(b|a)=1, P(a|b)=1) -> avg_logprob exactly 0. Contract:
    n_bigrams == n_tokens - 1; sub-2-token docs are omitted."""
    from vector_database_in_rust_spark.operators.textstats import (
        bigram_lm_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "x")], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert set(rows) == {1}  # doc 2 has no bigrams
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["avg_logprob"] == 0.0


def test_bigram_lm_penalizes_rare_transitions(spark):
    """Two docs over the same unigram vocabulary: the doc whose word
    ORDER matches the corpus majority must outscore the scrambled one
    — the axis unigram LM cannot separate."""
    from vector_database_in_rust_spark.operators.textstats import (
        bigram_lm_scores,
        unigram_lm_scores,
    )

    common = [(i, "the cat sat on the mat") for i in range(1, 9)]
    docs = spark.createDataFrame(
        common + [(9, "mat the on sat cat the")],
        "doc_id LONG, text STRING",
    )
    bi = {r["doc_id"]: r["avg_logprob"] for r in bigram_lm_scores(docs).collect()}
    assert bi[1] > bi[9]
    uni = {r["doc_id"]: r["avg_logprob"] for r in unigram_lm_scores(docs).collect()}
    assert uni[1] == uni[9]  # unigram frequencies identical


def test_boilerplate_ngrams_counts_docs_not_repeats(spark):
    """A shared header counts each doc once (per-doc distinct), even
    when a doc repeats the header internally."""
    from vector_database_in_rust_spark.operators.textstats import (
        boilerplate_ngrams,
    )

    header = "terms of use apply here"
    docs = spark.createDataFrame(
        [
            (1, f"{header} unique body one"),
            (2, f"{header} {header} other body"),
            (3, "completely different text with no shared prefix at all"),
        ],
        "doc_id LONG, text STRING",
    )
    top = {r["ngram"]: r["df"] for r in boilerplate_ngrams(docs, top_k=5).collect()}
    assert top[header] == 2


def test_source_entropy_bounds_and_collapse(spark):
    """Entropy is bounded by ln(vocab); a templated (single-token)
    source collapses to 0; a uniform source hits the bound exactly."""
    import math

    from vector_database_in_rust_spark.operators.textstats import (
        source_token_entropy,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a a a a", "tmpl"),
            (2, "a b c d e f", "rich"),
            (3, "g h i j k l", "rich"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in source_token_entropy(docs).collect()}
    assert out["tmpl"]["entropy"] == 0.0 and out["tmpl"]["vocab"] == 1
    assert out["rich"]["vocab"] == 12
    assert out["rich"]["entropy"] == round(math.log(12), 6)
    for r in out.values():
        assert r["entropy"] <= math.log(r["vocab"]) + 1e-6  # 6-digit rounding slack


def test_zipf_fit_recovers_planted_exponent(spark):
    """Plant an exact power law freq(r) = round(1000 * r^-0.8) and
    recover the exponent; r² near 1 on exact data, and numpy's own
    polyfit agrees."""
    import numpy as np

    from vector_database_in_rust_spark.operators.textstats import zipf_fit

    freqs = [max(1, round(1000 * (r ** -0.8))) for r in range(1, 60)]
    text = " ".join(f"w{r}" for r, f in enumerate(freqs) for _ in range(f))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = zipf_fit(docs).collect()[0]
    assert got["vocab"] == len(freqs)
    assert abs(got["slope"] - (-0.8)) < 0.02
    assert got["r2"] > 0.999
    x = np.log(np.arange(1, len(freqs) + 1))
    y = np.log(np.array(sorted(freqs, reverse=True), dtype=float))
    slope_np = np.polyfit(x, y, 1)[0]
    assert abs(got["slope"] - slope_np) < 1e-4
