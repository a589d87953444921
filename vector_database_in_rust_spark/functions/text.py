"""Text expression library for the LLM-data-pipeline operators.

All pure Catalyst column expressions (split/transform/filter/aggregate
higher-order functions) — no Python UDFs anywhere in the text path, so
tokenization and shingling run inside whole-stage codegen and scale with
executors.

These back the dedup/text-analysis operators (SURVEY.md §2.3), which are
NOT in the reference (its only text handling is the demo's positional
doc lookup, semantic_search.py:43-46); they are the north-star extension
surface mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately tiny, deterministic stopword list shared verbatim with the
# DuckDB oracle SQL (harness.py). Not linguistic truth — a fixture.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    return F.split(text, " ")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles, the dedup unit (distinct set).

    ``transform(sequence(...))`` keeps this a narrow per-row expression:
    no explode, no shuffle, evaluated inside codegen.
    """
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    # Documents shorter than n words get their whole text as one shingle.
    return F.array_distinct(
        F.when(F.size(toks) >= n, gram).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def distinct_ratio(text: Column) -> Column:
    toks = tokens(text)
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def content_fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set. Identical fingerprints <=> identical bags-of-distinct-words,
    a cheap first-pass near-dup key (word-order permutations collapse)."""
    return F.md5(F.array_join(F.array_sort(distinct_tokens(text)), " "))


def minhash_permutation_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) parameters for the universal-hash MinHash
    permutation family h_i(x) = (a_i * x32 + b_i) mod p, p = 2^61 - 1
    (Carter-Wegman). x32 is the low 32 bits of one base xxhash64 per
    shingle, so each extra permutation costs one multiply-add-mod, not a
    re-hash; a_i < 2^30 keeps a_i * x32 + b_i < 2^62 — no int64 overflow.
    """
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30))
        for _ in range(num_perm)
    ]


MINHASH_PRIME = (1 << 61) - 1
