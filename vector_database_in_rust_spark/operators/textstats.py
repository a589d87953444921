"""Text-analysis operators (north-star extension, SURVEY.md §2.3):
language ID, quality scoring, token counting, fingerprinting, corpus
stats. All pure Catalyst expressions over the ``documents`` table — the
whole module is shuffle-free except the final group-bys, which aggregate
tiny keyed state (map-side partial aggregation applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_in_rust_spark.functions.text import (
    EN_STOPWORDS,
    content_fingerprint,
    distinct_ratio,
    stopword_ratio,
    tokens,
)

# "BPE-ish" segmentation: greedy <=4-char alpha pieces, digit runs, or
# single non-alphanumeric chars — a deterministic stand-in for a real BPE
# vocab (not installed here), with the same Spark-side shape (regex
# extraction, one pass, codegen).
BPE_ISH_PATTERN = "[a-z]{1,4}|[A-Z]{1,4}|[0-9]+|[^a-zA-Z0-9 ]"


def token_counts(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counts: whitespace words and BPE-ish pieces."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(t)).alias("n_words"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length(t).alias("n_chars_measured"),
    )


def language_id(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-token language ID heuristic.

    NOTE: the driver's synthetic corpus draws every language's text from
    one shared vocabulary (verified empirically — the ``lang`` column is
    independent of the text), so no text-based classifier can recover the
    label. The operator therefore demonstrates the *mechanism* — marker
    vocabularies + ratio threshold, the classic n-gram-lite approach —
    with a deterministic rule shared exactly with the DuckDB oracle:
    predict 'en' when English stopword density >= 0.03, else 'und'.
    """
    ratio = F.round(stopword_ratio(F.col(text_col)), 6)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ratio.alias("stopword_ratio"),
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
    )


def quality_expr(t):
    """Quality score as a plain column expression (per-row, codegen) so
    composite pipelines (operators/curation.py) can inline it without a
    self-join back onto the corpus."""
    length_score = F.least(F.size(tokens(t)) / F.lit(200.0), F.lit(1.0))
    diversity = distinct_ratio(t)
    natural = F.least(stopword_ratio(t), F.lit(0.1)) / F.lit(0.1)
    return F.round(0.4 * length_score + 0.3 * diversity + 0.3 * natural, 6)


def quality_score(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document quality score in [0, 1]:

    0.4 * length_score (saturating at 200 words)
    + 0.3 * lexical diversity (distinct/total tokens)
    + 0.3 * stopword naturalness (ratio clipped to [0, 0.1] / 0.1)

    The weights are a fixture, not science; the operator shape (cheap
    per-row heuristics -> filter threshold) is the standard pretraining
    quality gate.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        quality_expr(F.col(text_col)).alias("quality"),
    )


def fingerprints(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc order-insensitive content fingerprint + distinct-token
    count (rolling-hash-family document fingerprinting)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        content_fingerprint(F.col(text_col)).alias("fingerprint"),
        F.size(F.array_distinct(tokens(F.col(text_col)))).alias(
            "n_distinct_tokens"
        ),
    )


def corpus_stats(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Per-language corpus statistics — the group-by surface over text."""
    t = F.col(text_col)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length(t)), 4).alias("avg_chars"),
            F.round(F.avg(F.size(tokens(t))), 4).alias("avg_words"),
            F.sum(F.size(tokens(t))).alias("total_words"),
            F.round(F.avg(stopword_ratio(t)), 6).alias("avg_stopword_ratio"),
        )
    )


def _grams(toks, n: int):
    """Non-distinct word n-grams (repetition counting needs multiplicity,
    unlike functions.text.word_shingles which dedups for set-Jaccard)."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, gram).otherwise(
        F.array().cast("array<string>")
    )


def dup_ngram_frac_expr(t, n: int):
    """Fraction of word n-grams that repeat an earlier n-gram, as a
    plain column expression (reusable by curate_corpus gates)."""
    grams = _grams(tokens(t), n)
    return F.when(F.size(grams) > 0, F.round(
        1.0 - F.size(F.array_distinct(grams)) / F.size(grams), 6
    )).otherwise(F.lit(0.0))


def top_token_frac_expr(t):
    """Most-frequent-token share of the document, as a plain column
    expression. O(distinct x total) per row — bounded by doc length."""
    toks = tokens(t)
    max_freq = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda x: F.size(F.filter(toks, lambda y: y == x)),
        )
    )
    return F.round(max_freq / F.greatest(F.size(toks), F.lit(1)), 6)


def repetition_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 — the repetition family of
    quality filters):

    - ``top_token_frac``: occurrences of the single most frequent token /
      total tokens (docs dominated by one token are boilerplate);
    - ``dup_bigram_frac`` / ``dup_trigram_frac``: fraction of n-grams
      that are repeats of an earlier n-gram (1 - distinct/total).

    All pure per-row Catalyst higher-order functions — no explode, no
    shuffle, codegen end-to-end; a filter on these columns composes with
    curate_corpus as another cheap pretraining gate. The top-token scan
    is O(distinct x total) per row — bounded by doc length, constant per
    row at any corpus scale (the alternative, explode + window, is a
    corpus-wide shuffle).
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        top_token_frac_expr(t).alias("top_token_frac"),
        dup_ngram_frac_expr(t, 2).alias("dup_bigram_frac"),
        dup_ngram_frac_expr(t, 3).alias("dup_trigram_frac"),
    )


# PII patterns, shared VERBATIM with the DuckDB oracle (harness.py).
# Deliberately within the common Java-regex/RE2 subset: no alternation
# (leftmost-first vs leftmost-longest would diverge), no lookaround
# (RE2 has none) — only greedy quantifiers and \b/\d, which agree.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_PATTERN = r"\+?\d{1,3}[- ]\d{3}[- ]\d{4}"


def redact_pii(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII scrubbing, the standard pre-release curation pass: replace
    emails, IPv4 addresses and phone numbers with typed placeholder
    tokens, and count what was removed per doc (the counts feed audit
    rollups / drop-thresholds; a doc that is mostly PII gets dropped,
    not scrubbed).

    Stages apply in a fixed order (email -> ip -> phone), each counting
    on the PREVIOUS stage's output so a span is attributed to exactly
    one category. Pure codegen string expressions — per-row, shuffle-
    free, no Python in the path.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_PATTERN), 0))
    t1 = F.regexp_replace(t, PII_EMAIL_PATTERN, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(PII_IP_PATTERN), 0))
    t2 = F.regexp_replace(t1, PII_IP_PATTERN, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_PATTERN), 0))
    clean = F.regexp_replace(t2, PII_PHONE_PATTERN, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("text"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


def unigram_lm_scores(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram language-model scoring — the KenLM-style perplexity
    quality filter (CCNet, Wenzek et al. 2020) reduced to its unigram
    form, trained on the corpus itself in the same pass that scores it:

    1. token counts (word-count shuffle, map-side combine) -> the LM;
    2. every doc token joins its corpus probability ln(c / T);
    3. per-doc mean token log-prob = sum(ln p) / n_tokens.

    Docs far below the corpus-mean log-prob are gibberish / boilerplate
    candidates — the standard perplexity gate, with the model a
    DataFrame instead of a binary artifact. Scale shape: both sides of
    the token join are token-count-shaped relations keyed by token
    (AQE broadcasts the vocab side when it fits — vocabularies are
    ~1e7 rows even at web scale); the per-doc reduce is a map-side
    partial agg. No Python in the path.

    No OOV smoothing is needed when scoring the training corpus (every
    token has c >= 1); scoring an external corpus against this LM would
    add a coalesce(logp, ln(1/(T+V))) floor on the join.
    """
    toks = tokens(F.col(text_col))
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # T from a shuffle-free corpus pass (sum of per-row lengths), NOT by
    # re-aggregating `vocab` — that would tokenize the corpus a second
    # time through the groupBy just to produce one number. The total
    # stays IN the DAG as a broadcast 1-row aggregate (same pattern as
    # bm25_scores' N/avgdl): a `.first()` here would be an eager
    # full-tokenize scan action on the driver per invocation.
    total = docs.agg(
        F.sum(F.size(toks)).cast("double").alias("_total")
    )
    logp = F.log(F.col("c") / F.col("_total"))
    return (
        tok.join(vocab, on="token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(logp) / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


def normalize_text(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical text normalization (the first stage of every dedup/
    quality pipeline): lowercase -> non-alphanumerics to spaces ->
    collapse runs of whitespace -> trim. Emits the normalized form's
    md5 + length so downstream exact dedup keys on canonicalized
    content. Pure Catalyst string expressions — codegen, shuffle-free."""
    t = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


def _word_ngrams(text_col: str, n: int):
    """ARRAY<STRING> of space-joined word n-grams of ``text_col`` —
    transform over a 0-based index sequence, slicing the token array.
    Pure Catalyst; empty when the doc has fewer than ``n`` tokens."""
    toks = tokens(F.col(text_col))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def bigram_lm_scores(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram language-model scoring — the conditional upgrade of
    :func:`unigram_lm_scores` (one step closer to the KenLM perplexity
    gate of CCNet, Wenzek et al. 2020), trained on the corpus in the
    same pass that scores it:

    1. per-doc bigram explode (w1 w2 pairs of adjacent tokens);
    2. corpus counts C(w1,w2) and prefix counts C(w1·) =
       occurrences of w1 as a bigram prefix — both word-count-shaped
       shuffles with map-side combine;
    3. per-doc mean ln P(w2|w1) = mean ln(C(w1,w2) / C(w1·)).

    Repetitive boilerplate scores HIGH (its bigrams dominate their
    prefixes); rare/garbled transitions score LOW — the
    perplexity-style axis unigram frequency alone can't see. Docs with
    fewer than 2 tokens have no bigrams and are omitted (no
    conditional to evaluate). Scale shape: both count relations key on
    bigram/prefix strings at vocabulary² cardinality bounds (far below
    token count in practice); the per-doc reduce is a partial agg. No
    driver actions, no Python.
    """
    bg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_ngrams(text_col, 2)).alias("bigram"),
    )
    cbg = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_bigram"))
    w1 = F.substring_index(F.col("bigram"), " ", 1)
    cw1 = (
        bg.select(w1.alias("prefix"))
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("c_prefix"))
    )
    scored = (
        bg.join(cbg, on="bigram")
        .withColumn("prefix", w1)
        .join(cw1, on="prefix")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.log(F.col("c_bigram") / F.col("c_prefix")))
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


def boilerplate_ngrams(
    docs: DataFrame,
    *,
    n: int = 5,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k word n-grams by DOCUMENT frequency — the boilerplate
    detector (shared headers/footers/disclaimers surface as long
    n-grams appearing across many documents; the standard removal list
    is built from exactly this table). Per-doc DISTINCT n-grams (a doc
    repeating its own header doesn't inflate df) -> doc-frequency
    count -> deterministic top-k ((df desc, ngram) ties).

    Scale: explode + distinct + count is the word-count shuffle shape
    on n-gram keys; the top-k is a TakeOrdered over the aggregated
    (ngram, df) relation, never over raw rows."""
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_word_ngrams(text_col, n))).alias("ngram"),
    )
    df_ = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("df"))
    return df_.orderBy(F.col("df").desc(), "ngram").limit(top_k)


def cooccurrence_pmi(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 20,
    min_pair_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Document-level word co-occurrence with pointwise mutual
    information — the association-mining pass behind collocation
    detection, topic seeding, and template discovery in a pretraining
    corpus. PMI(w1,w2) = ln(P(w1,w2) / (P(w1)P(w2))) over document
    incidence.

    Scale: the quadratic danger is per-document pair generation
    (d distinct tokens → d² pairs). Two cuts bound it: (1) the
    vocabulary is restricted to words with document frequency ≥
    ``min_df`` BEFORE pairing — the df rollup is a word-keyed shuffle
    of (word, partial count) partials, and the qualifying vocab
    broadcasts; (2) pairs below ``min_pair_count`` die in the pair
    rollup. The pair generation itself is a self-equi-join on doc_id
    of the vocab-filtered distinct (doc, word) incidence list with
    ``w1 < w2`` inside the join — at 100 TB both sides partition on
    doc_id, so pairing is co-located and the only global exchange is
    the (w1, w2)-keyed count rollup. The corpus size N and the df map
    fold into the DAG as broadcasts (no driver action). All PMI inputs
    are exact integers; the final ln/round(6) is IEEE-identical across
    engines.
    """
    inc = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    df_counts = inc.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    vocab = df_counts.filter(F.col("df") >= min_df)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    vinc = inc.join(F.broadcast(vocab), "w").select("doc_id", "w", "df")
    left = vinc.select(
        "doc_id", F.col("w").alias("w1"), F.col("df").alias("df1")
    )
    right = vinc.select(
        F.col("doc_id").alias("_d2"), F.col("w").alias("w2"),
        F.col("df").alias("df2"),
    )
    pairs = left.join(
        right,
        (F.col("doc_id") == F.col("_d2")) & (F.col("w1") < F.col("w2")),
    )
    agg = (
        pairs.groupBy("w1", "w2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    scored = agg.crossJoin(F.broadcast(n_docs)).select(
        "w1",
        "w2",
        "n_pair",
        F.round(
            F.log(
                (F.col("n_pair").cast("double") * F.col("n_docs"))
                / (F.col("df1").cast("double") * F.col("df2"))
            ),
            6,
        ).alias("pmi"),
    )
    return scored.orderBy(
        F.col("pmi").desc(), "w1", "w2"
    ).limit(top_k)


def quality_logistic(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality filtering with a FIXED, interpretable
    logistic model over the same deterministic text features the
    heuristic gate uses — the plumbing of a fasttext/classifier-based
    quality filter (the industry-standard curation step), with
    hand-set public weights standing in for trained ones (no model
    runtime in the container; the weights are the documented slot a
    trained model drops into).

    Features: ln(1+n_words), stopword ratio, distinct ratio, mean word
    length. score = sigmoid(w·x + b), kept ∈ score ≥ threshold. All
    features derive from exact integer counts per row (shuffle-free
    higher-order functions); ln/exp on identical doubles round(6)
    identically across engines — the same discipline the LM scorers
    already rely on.
    """
    t = tokens(F.col(text_col))
    n_words = F.size(t)
    n_chars = F.length(F.col(text_col))
    stop_r = stopword_ratio(F.col(text_col))
    dist_r = distinct_ratio(F.col(text_col))
    mean_wl = (n_chars - (n_words - 1)).cast("double") / n_words
    z = (
        F.lit(-2.0)
        + 0.55 * F.log(1.0 + n_words)
        + 2.0 * stop_r
        + 1.5 * dist_r
        - 0.25 * mean_wl
    )
    score = 1.0 / (1.0 + F.exp(-z))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(score, 6).alias("quality_prob"),
        (F.round(score, 6) >= threshold).alias("kept"),
    )


def source_token_entropy(
    docs: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source Shannon token entropy (nats) — the corpus-diversity
    signal a data-mixing stage weighs alongside volume: a source whose
    token distribution has collapsed (templated/boilerplate content)
    shows low entropy even at high document counts, and entropy is the
    quantity DoReMi-style domain reweighting and dedup QA dashboards
    track per slice.

    H(source) = -Σ_t p(t) ln p(t), p from the source's token counts.
    Emits (source, n_tokens, vocab, entropy) rounded to 6.

    Scale: one (source, token)-keyed count — word-count shape,
    map-side combinable — then per-source normalization as a window
    sum over that AGGREGATE (vocab-sized, not corpus-sized). No
    second pass over text.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.col(source_col).alias("source"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")
    counts = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source")
    p = F.col("c") / F.sum("c").over(w)
    per_tok = counts.select(
        "source", "c", (-p * F.log(p)).alias("_h"), F.sum("c").over(w).alias("_n")
    )
    return (
        per_tok.groupBy("source")
        .agg(
            F.first("_n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.round(F.sum("_h"), 6).alias("entropy"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS slope of
    ln(frequency) on ln(rank) — natural text sits near -1; a corpus
    drifting toward 0 (flat) signals templated/duplicated content and
    one drifting steeply negative signals vocabulary collapse. The
    single-number corpus-health metric QA dashboards track next to
    entropy.

    Emits one row (vocab, n_tokens, slope, intercept, r2), all
    rounded to 6. Closed-form OLS over (ln rank, ln freq) — exact
    deterministic sums, no iterative fitting.

    Scale: one word-count shuffle; the rank window and the OLS sums
    run over the VOCAB-sized aggregate (sublinear in corpus size).
    Ranks tie-break by token string, so equal-frequency runs are
    deterministic in both dialects.
    """
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("token"))
    xy = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
        F.col("c"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    slope = sxy_c / sxx_c
    return agg.select(
        F.col("n").cast("long").alias("vocab"),
        "n_tokens",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6).alias("r2"),
    )
