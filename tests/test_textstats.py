"""Hand-computed cases for the text-analysis operators that the
synthetic-corpus oracle parity can't pin down tightly (the corpus has
low natural repetition, so repetition_stats needs constructed docs with
known duplicate-n-gram counts)."""

from __future__ import annotations

import pytest

from vector_database_in_rust_spark.operators.textstats import repetition_stats


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
