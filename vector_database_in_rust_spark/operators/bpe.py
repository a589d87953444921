"""REAL byte-pair-encoding tokenizer (north-star extension, round 5):
trained from the corpus, applied distributed — the token-accounting
operator a training-data pipeline budgets with, upgrading the declared
"BPE-ish" regex stand-in in :mod:`textstats` (textstats.py:22) to the
genuine merge-table algorithm (Sennrich et al. 2016, public).

Scale design (100 TB path):
  1. WORD-TYPE COUNTS are distributed: one ``groupBy(word).count()``
     over the exploded corpus — the only corpus-sized shuffle, with
     map-side partial aggregation.
  2. The TRAINER sees only the bounded top-``max_word_types`` dictionary
     (TakeOrdered collect, deterministic count-desc/word-asc order) —
     this is how production BPE trainers work: the merge loop operates
     on the word-frequency dictionary, never the corpus. The collect is
     bounded by ``max_word_types`` regardless of corpus size (at 100 TB
     the junk-type tail is cut by the same cap).
  3. The merge loop is incremental (pair->words inverted index, only
     words containing the merged pair are re-counted), so cost is
     O(merges * affected-words), not O(merges * vocab).
  4. ENCODING broadcasts the merge ranks and runs in Arrow-batched
     ``mapInPandas`` with a per-batch word->tokens memo — no shuffle,
     no driver involvement, embarrassingly parallel.

Verification: BPE is not expressible in portable SQL, so the driver
checks a VERDICT table (same pattern as the sketch lane): per-doc
``n_words`` (exact, SQL-computable), plus booleans the algorithm
guarantees — greedy-merge encoding is exactly invertible against
whitespace-normalized text, token count is bounded by initial symbol
count above and word count below. A broken merge table, a wrong
end-of-word convention, or a non-invertible encode flips the hash.
Compression-quality bars (merged tokens strictly beat character count
corpus-wide) live in tests/test_bpe.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word symbol (Sennrich convention)


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def train_bpe_merges(
    docs: DataFrame,
    *,
    num_merges: int = 64,
    max_word_types: int = 20_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Distributed
    word-type counting; driver-side merge loop over the BOUNDED
    top-``max_word_types`` dictionary (deterministic: ties broken by
    count desc, then word asc; merge ties by pair count desc, then
    pair lexicographic asc)."""
    counts = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .count()
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_word_types)
        .collect()
    )
    # word id -> (mutable symbol list, frequency)
    words: list[list[str]] = [list(_word_symbols(r["word"])) for r in counts]
    freqs: list[int] = [int(r["count"]) for r in counts]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] = pair_counts.get(pair, 0) + freqs[wi]
            pair_words.setdefault(pair, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms, f = words[wi], freqs[wi]
            # retract this word's pair contributions
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= f
                if pair_counts[pair] <= 0:
                    pair_counts.pop(pair, None)
                ws = pair_words.get(pair)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop(pair, None)
            # apply the merge left-to-right
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            # re-add the rewritten word's pairs
            for pair in zip(out, out[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + f
                pair_words.setdefault(pair, set()).add(wi)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merging — reproduces training exactly
    for any word, in or out of the training dictionary."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == best_pair[0]
                and syms[i + 1] == best_pair[1]
            ):
                out.append(best_pair[0] + best_pair[1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE encode: broadcast the merge ranks, tokenize each
    doc in Arrow batches with a word->tokens memo (word types repeat
    heavily, so the memo collapses per-batch work to per-TYPE work).
    Emits (doc_id, tokens, n_tokens, n_words). Map-only: no shuffle,
    nothing corpus-sized touches the driver."""
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = b_ranks.value
        memo: dict[str, list[str]] = {}
        for pdf in it:
            ids, toks, ntok, nw = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).split() if w]
                out: list[str] = []
                for w in words:
                    t = memo.get(w)
                    if t is None:
                        t = _encode_word(w, ranks)
                        memo[w] = t
                    out.extend(t)
                ids.append(did)
                toks.append(out)
                ntok.append(len(out))
                nw.append(len(words))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "tokens": toks,
                    "n_tokens": pd.Series(ntok, dtype="int64"),
                    "n_words": pd.Series(nw, dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        batches,
        schema=(
            "doc_id BIGINT, tokens ARRAY<STRING>, "
            "n_tokens BIGINT, n_words BIGINT"
        ),
    )


def decode_bpe_tokens(tokens: list[str]) -> str:
    """Inverse of :func:`encode_bpe` for one doc: concatenate and turn
    end-of-word markers back into single spaces."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")


def bpe_roundtrip_verdict(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hash-verifiable verdict over the non-SQL-expressible tokenizer:
    per doc, the exact whitespace word count plus three booleans the
    algorithm guarantees —

    - ``roundtrip_ok``: decode(encode(text)) equals the
      whitespace-normalized text (BPE merging is exactly invertible;
      the known caveat that a text containing the literal end-of-word
      marker would not round-trip applies to all Sennrich-style BPE);
    - ``tokens_le_init``: n_tokens <= n_nonspace_chars + n_words
      (merges only ever shrink the initial chars+EOW symbol sequence);
    - ``tokens_ge_words``: every word yields at least one token.

    A wrong merge application, a lost symbol, or a broken EOW
    convention flips at least one boolean and therefore the hash."""
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = b_ranks.value
        memo: dict[str, list[str]] = {}
        for pdf in it:
            ids, nws, rts, les, ges = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).split() if w]
                out: list[str] = []
                for w in words:
                    t = memo.get(w)
                    if t is None:
                        t = _encode_word(w, ranks)
                        memo[w] = t
                    out.extend(t)
                n_init = sum(len(w) + 1 for w in words)
                ids.append(did)
                nws.append(len(words))
                rts.append(decode_bpe_tokens(out) == " ".join(words))
                les.append(len(out) <= n_init)
                ges.append(len(out) >= len(words))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(nws, dtype="int64"),
                    "roundtrip_ok": pd.Series(rts, dtype="bool"),
                    "tokens_le_init": pd.Series(les, dtype="bool"),
                    "tokens_ge_words": pd.Series(ges, dtype="bool"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        batches,
        schema=(
            "doc_id BIGINT, n_words BIGINT, roundtrip_ok BOOLEAN, "
            "tokens_le_init BOOLEAN, tokens_ge_words BOOLEAN"
        ),
    )
