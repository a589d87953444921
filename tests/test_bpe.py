"""Real BPE tokenizer: training determinism, textbook merge behavior,
encode/train consistency, invertibility, and the compression bar that
separates a working merge table from a no-op one."""

import pandas as pd
import pytest

from vector_database_in_rust_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_roundtrip_verdict,
    decode_bpe_tokens,
    encode_bpe,
    train_bpe_merges,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_textbook_merge_order(spark):
    """'aaab' x many: the first merge must be the most frequent pair
    ('a','a'), then the merged symbol participates in later merges —
    the defining property separating BPE from frequency-independent
    segmentation."""
    docs = _docs_df(spark, ["aaab aaab aaab", "aaab aaab"])
    merges = train_bpe_merges(docs, num_merges=3)
    assert merges[0] == ("a", "a")
    toks = _encode_word("aaab", {p: i for i, p in enumerate(merges)})
    assert decode_bpe_tokens(toks) == "aaab"
    assert len(toks) < len("aaab") + 1  # genuinely compressed


def test_training_is_deterministic(spark):
    docs = _docs_df(
        spark, ["the cat sat on the mat", "the dog ate the log", "cat dog"]
    )
    m1 = train_bpe_merges(docs, num_merges=16)
    m2 = train_bpe_merges(docs, num_merges=16)
    assert m1 == m2 and len(m1) > 0


def test_tie_break_is_lexicographic(spark):
    """'ab' and 'cd' both appear exactly twice as pairs; the trainer
    must pick ('a','b') first by the documented pair-asc tie-break."""
    docs = _docs_df(spark, ["ab cd", "ab cd"])
    merges = train_bpe_merges(docs, num_merges=1)
    assert merges == [("a", "b")]


def test_encode_matches_training_segmentation(spark):
    """Words from the training dictionary must encode to the exact
    symbol sequences the trainer left them with — greedy lowest-rank
    encoding replays training."""
    texts = ["banana bandana", "banana banana band", "an na ban"]
    docs = _docs_df(spark, texts)
    merges = train_bpe_merges(docs, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    # replay training manually on the word list
    for word in ["banana", "bandana", "band", "an", "na", "ban"]:
        syms = list(word) + [EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert _encode_word(word, ranks) == syms, word


def test_oov_words_still_roundtrip(spark):
    """Encoding is defined for words never seen in training (falls back
    toward characters) and stays invertible."""
    docs = _docs_df(spark, ["aaa bbb aaa"])
    merges = train_bpe_merges(docs, num_merges=4)
    ranks = {p: i for i, p in enumerate(merges)}
    assert decode_bpe_tokens(_encode_word("zqxjk", ranks)) == "zqxjk"


def test_encode_bpe_distributed_columns(spark):
    docs = _docs_df(spark, ["hello world", "hello hello", ""])
    merges = train_bpe_merges(docs, num_merges=8)
    out = encode_bpe(docs, merges).orderBy("doc_id").collect()
    assert [r["n_words"] for r in out] == [2, 2, 0]
    for r in out:
        assert r["n_tokens"] == len(r["tokens"])
        assert decode_bpe_tokens(list(r["tokens"])) == " ".join(
            w for w in ["hello world", "hello hello", ""][r["doc_id"]].split()
        )


def test_corpus_compression_bar(spark):
    """On the real documents table, 64 merges must cut total token
    count to at most 80% of the character-level baseline — a no-op or
    mis-applied merge table fails this bar."""
    from tests.conftest import SF_SMOKE
    from vector_database_in_rust_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    merges = train_bpe_merges(docs, num_merges=64)
    assert len(merges) == 64
    agg = (
        encode_bpe(docs, merges)
        .selectExpr(
            "sum(n_tokens) AS toks",
            "sum(aggregate(transform(tokens, t -> length(t)), 0L,"
            " (a, x) -> a + x)) AS sym_chars",
            "sum(n_words) AS words",
        )
        .first()
    )
    # initial symbol count = nonspace_chars + one EOW per word; token
    # chars include the 4-char EOW marker once per word, so
    # n_init = sym_chars - (len(EOW)-1) * words. Merging must beat it.
    n_init = agg["sym_chars"] - (len(EOW) - 1) * agg["words"]
    assert agg["toks"] <= 0.8 * n_init


def test_verdict_all_true(spark):
    from tests.conftest import SF_SMOKE
    from vector_database_in_rust_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    merges = train_bpe_merges(docs, num_merges=32)
    v = bpe_roundtrip_verdict(docs, merges)
    bad = v.where(
        "NOT roundtrip_ok OR NOT tokens_le_init OR NOT tokens_ge_words"
    ).count()
    assert bad == 0
