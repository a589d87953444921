"""Corpus-curation operators: the composite stages a training-data
pipeline runs between raw ingest and tokenization (north-star extension
surface; the reference has no text pipeline at all — its only text
handling is the demo's positional doc lookup, semantic_search.py:43-46).

Three operators, all pure Catalyst (no Python in any hot path):

- ``curate_corpus``: the standard keep/drop gate — exact-dup drop,
  fingerprint-dup drop, quality floor, language allowlist — evaluated in
  ONE pass with fixed reason precedence. Shuffle profile: two hash-keyed
  window mins (the shuffle carries (hash, id), never text bodies); the
  rest is per-row expressions in codegen.
- ``stratified_sample``: DETERMINISTIC per-language hash sampling.
  ``rand()``-based sampling is nondeterministic under task retry and
  irreproducible across runs; hashing the stable doc id into hex space
  and comparing against a per-language prefix threshold gives the same
  sample every run, on any cluster, resumable mid-pipeline — the only
  sampling discipline that survives a 100 TB multi-day job. Shuffle-free
  (a scan + filter).
- ``vocab_top_tokens``: token frequency top-k per language — the
  vocabulary-analysis pass before building a tokenizer. Word-count
  shuffle shape (map-side combinable) + per-group top-k via ranking
  window (WindowGroupLimit bounds the second shuffle to k rows per
  partition per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_database_in_rust_spark.functions.text import (
    content_fingerprint,
    tokens,
)
from vector_database_in_rust_spark.operators.textstats import quality_expr

HEX_SPACE = 16**6  # sampling threshold resolution: first 6 md5 hex chars


def curate_corpus(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    max_top_token_frac: float | None = None,
    max_dup_trigram_frac: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Keep/drop verdict per document with a drop reason.

    Reason precedence (first match wins — fixed so the output is
    deterministic and oracle-checkable):

    1. ``exact_dup``       — not the minimum id for its exact text md5
    2. ``fingerprint_dup`` — not the minimum id for its order-insensitive
       content fingerprint (catches token permutations)
    3. ``low_quality``     — quality score below ``min_quality``
    4. ``repetition``      — Gopher-family repetition gate (only when a
       ``max_top_token_frac`` / ``max_dup_trigram_frac`` threshold is
       set; see textstats.repetition_stats)
    5. ``lang``            — language not in ``keep_langs``
    kept rows carry ``drop_reason = NULL``.

    Dup detection keeps the MINIMUM doc id of each group (the canonical
    keeper, same convention as ``dedup_exact``/``dedup_clusters``) via
    window mins partitioned by the hash — the shuffle key is the hash,
    so cost scales with corpus size, not pairs. The repetition gates
    are per-row expressions — enabling them adds no shuffle.
    """
    from vector_database_in_rust_spark.operators.textstats import (
        dup_ngram_frac_expr,
        top_token_frac_expr,
    )

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.col(lang_col).alias("lang"),
        quality_expr(F.col(text_col)).alias("quality"),
    )
    w_md5 = Window.partitionBy(F.md5(F.col("_text")))
    w_fp = Window.partitionBy(content_fingerprint(F.col("_text")))
    rep = F.lit(False)
    if max_top_token_frac is not None:
        rep = rep | (top_token_frac_expr(F.col("_text")) > max_top_token_frac)
    if max_dup_trigram_frac is not None:
        rep = rep | (
            dup_ngram_frac_expr(F.col("_text"), 3) > max_dup_trigram_frac
        )
    flagged = base.select(
        "doc_id",
        "lang",
        "quality",
        (F.col("doc_id") > F.min("doc_id").over(w_md5)).alias("_exact_dup"),
        (F.col("doc_id") > F.min("doc_id").over(w_fp)).alias("_fp_dup"),
        rep.alias("_repetitive"),
    )
    reason = (
        F.when(F.col("_exact_dup"), F.lit("exact_dup"))
        .when(F.col("_fp_dup"), F.lit("fingerprint_dup"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(F.col("_repetitive"), F.lit("repetition"))
        .when(~F.col("lang").isin(*keep_langs), F.lit("lang"))
    )
    return flagged.select(
        "doc_id",
        "lang",
        "quality",
        reason.alias("drop_reason"),
        reason.isNull().alias("kept"),
    )


def sample_threshold_hex(fraction: float) -> str:
    """The 6-hex-char prefix threshold for a sampling fraction: a doc is
    kept iff the first 6 hex chars of md5(id) sort strictly below it.
    Plain string comparison — identical semantics in any engine
    (same-length lowercase hex sorts numerically).

    A fraction that rounds to the full space returns ``"g"`` — above
    every hex character, so every key passes. (The naive
    ``format(16**6, "06x")`` would be the SEVEN-char ``"1000000"``,
    which sorts lexicographically BELOW most six-char keys and would
    silently drop them — caught by the hypothesis monotonicity test.)
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    v = int(round(fraction * HEX_SPACE))
    if v >= HEX_SPACE:
        return "g"
    return format(v, "06x")


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    *,
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Deterministic per-language sample: keep a ``fractions[lang]``
    share of each language's documents, selected by md5-hash prefix of
    the document id (languages absent from ``fractions`` are dropped).

    Unlike ``sample()``/``rand()``, the decision is a pure function of
    the id — reproducible across runs/partitionings/retries, and the
    SAME rows stay selected when the corpus grows (a stable holdout).
    """
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 6)
    cond = F.lit(False)
    for lang, frac in sorted(fractions.items()):
        cond = cond | (
            (F.col(lang_col) == lang) & (key < sample_threshold_hex(frac))
        )
    return docs.filter(cond).select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        key.alias("sample_key"),
    )


def vocab_top_tokens(
    docs: DataFrame,
    *,
    k: int = 20,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Top-k tokens per language by frequency (ties broken by token
    string): the vocabulary profile a tokenizer build starts from.
    explode -> count (map-side combinable word-count shuffle) ->
    ranking window bounded by WindowGroupLimit."""
    tok = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    counts = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", F.col("rank").cast("long").alias("rank"), "token", "n")
    )


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Temperature-weighted data mixing: emit each document
    ``weights[lang]`` times in expectation — the per-source/`per-language
    rebalancing step every pretraining mix applies (upweight tail
    languages, downweight the head; cf. the temperature-sampled mixes
    in multilingual LM training).

    A weight of 2.3 means every doc appears twice and a deterministic
    30% of docs (selected by the same md5-prefix rule as
    ``stratified_sample``) appear a third time; 0.4 keeps a 40% sample;
    languages absent from ``weights`` drop. The fractional pick is a
    pure function of the doc id — reproducible across runs, retries and
    partitionings, unlike ``rand()``-based mixing.

    Output: one row per (doc, copy) with ``copy`` in 1..n_copies.
    Per-row expressions + a bounded ``explode`` fan-out (``ceil(w)``
    rows max per doc) — zero shuffles at any corpus size.
    """
    import math

    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 6)
    expr = None
    for lang, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative mix weight for {lang!r}: {w}")
        base = int(math.floor(w))
        frac = w - base
        n = F.lit(base)
        if frac > 0:
            n = n + F.when(key < sample_threshold_hex(frac), 1).otherwise(0)
        cond = F.col(lang_col) == lang
        expr = F.when(cond, n) if expr is None else expr.when(cond, n)
    n_copies = (expr.otherwise(0) if expr is not None else F.lit(0)).cast(
        "int"
    )
    with_n = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        n_copies.alias("n_copies"),
    ).filter(F.col("n_copies") > 0)
    return with_n.select(
        "doc_id",
        "lang",
        "n_copies",
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy"),
    )


def corpus_shuffle(
    docs: DataFrame,
    *,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a pseudo-random position by sorting on ``md5(seed || doc_id)`` —
    the final "randomize example order" step of a pretraining data
    pipeline, as a pure function of (seed, id): reproducible across
    runs, partitionings and retries, and a different seed is a fresh
    epoch-order.

    Scale: the textbook two-pass global index, NOT a global
    ``row_number`` window (``Window.orderBy(...)`` plans as
    ``Exchange SinglePartition`` — one task would sort and number the
    whole corpus). Pass 1: range-partition + sort on the key (a true
    distributed sort; rows carry (id, key) only, payload re-joins
    downstream), pin the sorted partitions with an eager
    localCheckpoint, and aggregate ONE count per partition to the
    driver (state bounded by the partition count, never the corpus).
    Pass 2: broadcast the cumulative offsets back and add them to a
    per-partition ``row_number`` — every window here is partitioned,
    so no single-partition exchange exists anywhere in the plan
    (pinned in tests/test_plans.py). EAGER by design, like
    ``minhash_lsh_pairs``: the checkpoint's one job is pinning
    IDENTICAL partition contents for the count pass and the numbering
    pass. It is NOT a fault-tolerance mechanism — ``localCheckpoint``
    stores blocks on executor-local storage, so an executor loss loses
    its blocks and (lineage being truncated) fails the job; recovery
    is re-running ``corpus_shuffle`` from the source, which is safe
    because the whole mapping is a pure function of (seed, doc_id).
    On a cluster with a configured checkpoint dir, substitute reliable
    ``checkpoint()`` for executor-loss survival at the cost of a
    shared-storage write.
    """
    key = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")))
    pidded = (
        docs.select(F.col(id_col).alias("doc_id"), key.alias("shuffle_key"))
        .repartitionByRange("shuffle_key", "doc_id")
        .sortWithinPartitions("shuffle_key", "doc_id")
        .select("doc_id", "shuffle_key", F.spark_partition_id().alias("_pid"))
        .localCheckpoint()
    )
    counts = sorted(
        (r["_pid"], r["count"])
        for r in pidded.groupBy("_pid").count().collect()
    )
    offsets, running = [], 0
    for pid, cnt in counts:
        offsets.append((pid, running))
        running += cnt
    spark = docs.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy("shuffle_key", "doc_id")
    return (
        pidded.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "position",
            (F.row_number().over(w).cast("long") + F.col("_offset")),
        )
        .select("position", "doc_id", "shuffle_key")
    )


def length_buckets(
    docs: DataFrame,
    *,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quantile length-bucketing for padding-efficient batching: NTILE
    over token count assigns each doc to one of ``n_buckets``
    near-equal-size buckets of similar length — batches drawn within a
    bucket minimize padding waste (the standard bucketed-batching step
    in front of sequence packing). Deterministic: the NTILE ordering
    tie-breaks on doc id.

    Scale note: a single global NTILE window is one range sort; at
    fleet scale replace with approx_percentile cut points broadcast
    into a CASE (sketch-sized exchange) — the exact NTILE is kept here
    because it is portably oracle-checkable and the bucket SIZES (not
    boundaries) are the contract."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = Window.orderBy("n_tokens", "doc_id")
    return (
        docs.select(F.col(id_col).alias("doc_id"), n_tokens.alias("n_tokens"))
        .withColumn("bucket", F.ntile(n_buckets).over(w).cast("long"))
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "bucket")
    )


def holdout_split(
    docs: DataFrame,
    fractions: list[tuple[str, float]] | None = None,
    *,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the canonical holdout
    split of a training-data pipeline, as a pure function of
    (salt, id): ``split = CASE`` on the md5-prefix key against
    cumulative fraction thresholds (same hex-threshold convention as
    :func:`stratified_sample`). Reproducible across runs, partitionings
    and retries; documents keep their split when the corpus grows (no
    val->train leakage on refresh); a different ``salt`` is a fresh
    independent split. The last named split absorbs the remainder, so
    every document lands in exactly one bucket.

    Scale: pure map-side projection — zero shuffle, zero Python; the
    assignment pushes through any downstream filter (training readers
    scan only their split's predicate).
    """
    fractions = fractions or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    if len(fractions) < 2:
        raise ValueError("need at least two splits")
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))), 1, 6)
    expr = F.lit(fractions[-1][0])
    cum = 0.0
    branches = []
    for name, frac in fractions[:-1]:
        cum += frac
        branches.append((name, sample_threshold_hex(cum)))
    for name, threshold in reversed(branches):
        expr = F.when(key < threshold, F.lit(name)).otherwise(expr)
    return docs.select(
        F.col(id_col).alias("doc_id"), key.alias("split_key"), expr.alias("split")
    )


def source_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus profile — the first diagnostic of a web-scale
    crawl mix (domain skew, per-source quality drift): document count,
    total/mean character volume, mean token count, distinct languages.
    One map-side-combinable groupBy keyed on the source; at 100 TB the
    group count is domain-sized (~1e7), orders below the row count, so
    the shuffle moves partial aggregates only."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    return (
        docs.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(text_col)).cast("long").alias("total_chars"),
            F.round(F.avg(F.length(text_col)), 4).alias("mean_chars"),
            F.round(F.avg(n_tokens), 4).alias("mean_tokens"),
            F.count_distinct(F.col(lang_col)).alias("n_langs"),
        )
    )


def diversity_sample(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix_bits: int = 6,
    per_bucket: int = 4,
) -> DataFrame:
    """Embedding-space diversity sampling: partition the corpus into
    sign-prefix buckets (the first ``prefix_bits`` dimensions' sign
    bits — a deterministic, training-free stand-in for the k-means
    cells a SemDeDup-style cluster-balanced subsample uses) and keep a
    fixed quota per bucket, selected by md5-hash rank so the choice is
    a pure function of the id (reproducible across runs, partitionings
    and corpus growth — same discipline as ``stratified_sample``).

    Scale: the bucket id is a narrow per-row expression (no shuffle);
    the per-bucket quota is a ranking window whose WindowGroupLimit
    runs map-side BEFORE the bucket exchange, so at most
    partitions × 2^prefix_bits × per_bucket rows shuffle regardless of
    corpus size. NaN dimensions count as non-positive in BOTH dialects
    (explicit isnan guard — the BQ lane's NaN rule)."""
    el = lambda i: F.element_at(F.col(vec_col), i + 1)  # noqa: E731
    bucket = None
    for i in range(prefix_bits):
        bit = F.when(
            ~F.isnan(el(i)) & (el(i) > 0), F.lit(1 << i)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    ranked = emb.select(
        F.col(id_col).alias("vec_id"), bucket.cast("long").alias("bucket")
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy(
                F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
            )
        ),
    )
    return ranked.filter(F.col("rk") <= per_bucket).select(
        "bucket", F.col("rk").cast("long").alias("rk"), "vec_id"
    )


def dsir_select(
    docs: DataFrame,
    *,
    target_lang: str = "en",
    num_buckets: int = 1024,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR-shaped, Xie et
    al. 2023, public): score every document by the log-likelihood
    ratio of a hashed-unigram LM fit on the TARGET slice (here: the
    ``target_lang`` documents) vs one fit on the RAW corpus, and keep
    the top-``k`` — the data-selection gate that tilts a 100 TB crawl
    toward a target distribution without training a model.

    weight(doc) = sum over tokens t of
        ln((tgt[b(t)]+1)/(tgt_total+B)) - ln((raw[b(t)]+1)/(raw_total+B))

    with b(t) the md5-derived feature bucket (shared verbatim with the
    DuckDB oracle, same arithmetic as the hashed encoder) and add-one
    smoothing over B buckets.

    Scale design: the corpus tokenizes and buckets ONCE (map-side);
    per-(doc,bucket) counts are one word-count-shaped shuffle; both LM
    tables are B-row aggregates joined by BROADCAST, and the corpus
    totals fold in as an in-DAG one-row broadcast aggregate (the BM25
    N/avgdl pattern — no driver action). Top-k is orderBy+limit ->
    TakeOrderedAndProject. Nothing corpus-sized crosses the driver.
    Deterministic: ordered by (rounded weight desc, doc_id)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 6), 16, 10).cast("long")
        % num_buckets
    )
    tok = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .where(F.col("token") != "")
        .select("doc_id", "lang", bucket.alias("bucket"))
    )
    doc_b = tok.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))
    raw_lm = tok.groupBy("bucket").agg(F.count("*").alias("raw_cnt"))
    tgt_lm = (
        tok.where(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.count("*").alias("tgt_cnt"))
    )
    lm = F.broadcast(
        raw_lm.join(tgt_lm, "bucket", "left").select(
            "bucket",
            "raw_cnt",
            F.coalesce(F.col("tgt_cnt"), F.lit(0)).alias("tgt_cnt"),
        )
    )
    totals = F.broadcast(
        tok.agg(
            F.count("*").alias("raw_total"),
            F.sum(
                F.when(F.col("lang") == target_lang, F.lit(1)).otherwise(0)
            ).alias("tgt_total"),
        )
    )
    B = F.lit(float(num_buckets))
    contrib = F.col("cnt") * (
        F.log((F.col("tgt_cnt") + 1.0) / (F.col("tgt_total") + B))
        - F.log((F.col("raw_cnt") + 1.0) / (F.col("raw_total") + B))
    )
    weights = (
        doc_b.join(lm, "bucket")
        .crossJoin(totals)
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("weight"))
    )
    return (
        weights.orderBy(F.col("weight").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "weight")
    )


def source_cap(
    docs: DataFrame,
    *,
    max_per_source: int = 50,
    seed: int = 42,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap — the domain-balancing step of a web
    pipeline (RefinedWeb caps pages per registered domain so a handful
    of giant hosts can't dominate the corpus). Keeps at most
    ``max_per_source`` documents per source, chosen by DETERMINISTIC
    hash rank ``md5(seed || doc_id)`` rather than ``rand()``: the same
    survivors every run, on any partitioning, under any task retry —
    and the survivor set is stable under corpus growth in expectation
    (a new document only displaces one existing survivor of its own
    source, never reshuffles unrelated sources).

    Emits (doc_id, source, cap_rank) for the survivors, rank 1-based
    within source.

    Scale: one hash-partitioned ranking window keyed by source;
    WindowGroupLimit pushes the ``<= max_per_source`` bound map-side,
    so the shuffle carries at most ``max_per_source`` rows per source
    per input partition — bounded regardless of how skewed the source
    histogram is (the whole point: the pathological source is the one
    being capped). Rows carry (id, source, 32-hex key) only; payload
    re-joins downstream.
    """
    key = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")))
    w = Window.partitionBy("source").orderBy("cap_key")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            key.alias("cap_key"),
        )
        .withColumn("cap_rank", F.row_number().over(w).cast("long"))
        .where(F.col("cap_rank") <= max_per_source)
        .select("doc_id", "source", "cap_rank")
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 50,
    *,
    weight_col: str = "n_chars",
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, the A-ES scheme): each row gets key ``u^(1/w)`` for a
    uniform ``u``; the k largest keys are a weighted sample without
    replacement — the standard one-pass distributed primitive behind
    importance-weighted corpus subsampling (inclusion probability
    proportional to weight, no sequential draws, trivially mergeable).

    ``u`` is NOT ``rand()`` (nondeterministic under retry): it is the
    md5-prefix of (seed, id) mapped into (0,1) — the repo's hash-
    sampling discipline — so the sample is a pure function of
    (seed, id, weight), reproducible across runs and partitionings.
    Keys are compared in log space (``ln(u)/w``, monotone in
    ``u^(1/w)``) to avoid pow() precision pitfalls at tiny fractions.

    Emits the k selected (doc_id, weight, es_key) by descending key,
    es_key rounded to 6 for portable hashing.

    Scale: one map-side key computation + TakeOrderedAndProject — no
    shuffle of the corpus, k rows per partition reach the driver-side
    merge. The classic alternative (sort + limit) is a full range
    shuffle; TakeOrdered is the correct distributed top-k.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(HEX_SPACE))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(weight_col).cast("long").alias("weight"),
            F.round(key, 6).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col("doc_id"))
        .limit(k)
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    fractions: list[tuple[str, float]] | None = None,
    *,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Cluster-aware holdout split: near-duplicate documents NEVER
    straddle train/val/test. The naive per-doc hash split leaks — a
    near-dup pair lands train+val with probability 2·p·(1-p), and the
    val metric silently measures memorization. Here the split key is
    the doc's CANONICAL id (its near-dup cluster's min id from
    connected components; singleton docs are their own canonical), so
    every member of a cluster inherits the same assignment — the
    dedup-then-split discipline of a careful eval pipeline
    (cf. the contamination analyses in GPT-3/C4 dataset papers).

    ``clusters`` is (doc_id, cluster_id) from :func:`~vector_database_in_rust_spark.operators.dedup.dedup_clusters`
    over any pair generator. Emits (doc_id, canonical_id, split).

    Scale: clusters cover only docs WITH near-dups — a thin table that
    broadcasts (duplicate clusters are sparse in a deduped-ish corpus);
    the split itself stays the zero-shuffle md5-CASE projection of
    holdout_split, now keyed on the coalesced canonical.
    """
    fractions = fractions or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    if len(fractions) < 2:
        raise ValueError("need at least two splits")
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    canon = docs.select(F.col(id_col).alias("doc_id")).join(
        F.broadcast(clusters), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("canonical_id"),
    )
    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"), F.col("canonical_id").cast("string"))),
        1,
        6,
    )
    expr = F.lit(fractions[-1][0])
    cum = 0.0
    branches = []
    for name, frac in fractions[:-1]:
        cum += frac
        branches.append((name, sample_threshold_hex(cum)))
    for name, threshold in reversed(branches):
        expr = F.when(key < threshold, F.lit(name)).otherwise(expr)
    return canon.select("doc_id", "canonical_id", expr.alias("split"))


def length_buckets_approx(
    docs: DataFrame,
    *,
    n_buckets: int = 8,
    accuracy: int = 10_000,
    slack: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The 100 TB path for :func:`length_buckets`, implemented (not just
    documented): approximate quantile CUT POINTS (a mergeable rank
    sketch — sketch bytes cross the exchange, never a global sort)
    broadcast into a closed-form bucket expression. Bucket b =
    1 + |{cuts below n_tokens}|.

    Emits a per-bucket VERDICT row (bucket, monotone_ok, size_ok):

    - ``monotone_ok`` — every doc in bucket b is no longer than every
      doc in bucket b+1 (an EXACT property of cut-point bucketing; any
      assignment bug trips it);
    - ``size_ok`` — the bucket holds its ~N/n_buckets share within
      ``slack`` (ties on n_tokens all land one side of a cut, so exact
      equality is impossible by construction; the bound catches a
      broken sketch, and tightens naturally at scale as ties thin out
      relative to bucket size).

    Exact sizes/boundaries stay OUT of the hash — they are legitimately
    partition-order-free but sketch-parameter-dependent; the booleans
    are the stable contract (same discipline as
    ``approx_event_stats_verdict``).

    Scale: one sketch aggregate (broadcast back as a 1-row literal —
    in-DAG, no driver action), one map-side bucket expression, one
    |buckets|-row rollup. Compare: exact NTILE is a full range sort.
    """
    n_tokens = F.size(F.split(F.col(text_col), " "))
    lengths = docs.select(
        F.col(id_col).alias("doc_id"), n_tokens.alias("n_tokens")
    )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = lengths.agg(
        F.percentile_approx("n_tokens", qs, accuracy).alias("_cuts"),
        F.count(F.lit(1)).alias("_n_total"),
    )
    bucket = F.lit(1) + F.aggregate(
        F.col("_cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("n_tokens") > c, 1).otherwise(0),
    )
    assigned = lengths.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "n_tokens", bucket.cast("long").alias("bucket"), "_n_total"
    )
    per = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("n_tokens").alias("_lo"),
        F.max("n_tokens").alias("_hi"),
        F.first("_n_total").alias("_tot"),
    )
    w = Window.orderBy("bucket")
    target = F.col("_tot") / F.lit(n_buckets)
    return (
        per.withColumn("_prev_hi", F.lag("_hi").over(w))
        .select(
            "bucket",
            (
                F.col("_prev_hi").isNull()
                | (F.col("_lo") >= F.col("_prev_hi"))
            ).alias("monotone_ok"),
            (F.abs(F.col("_n") - target) <= F.lit(slack) * target).alias(
                "size_ok"
            ),
        )
        .orderBy("bucket")
    )


def curriculum_order(
    docs: DataFrame,
    *,
    n_phases: int = 4,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Phase-annealed training order — the "end training on the
    highest-quality data" curriculum recipe (quality-annealed data
    schedules for LLM mid/late training). Documents land in
    ``n_phases`` quality tiers (phase 0 = lowest quality, consumed
    first; phase ``n_phases``-1 = highest, consumed last) and are
    shuffled WITHIN each phase by the same seeded md5 key
    ``corpus_shuffle`` uses.

    The training order is the sort by ``(phase, order_key)``. Unlike
    ``corpus_shuffle`` there is deliberately NO materialized global
    position: the output contract is the sort key itself, so the plan
    is a pure map (scan + per-row expressions — no window, no
    exchange, pinned in tests/test_plans.py); the consuming writer
    realizes the order as a range-partitioned sort at write time,
    exactly the two-pass discipline corpus_shuffle documents. Both
    phase and key are pure functions of (text, seed, doc_id):
    retry-deterministic, and a different seed yields a fresh
    within-phase epoch order without changing the curriculum."""
    q = quality_expr(F.col(text_col))
    phase = F.least(
        F.floor(q * n_phases).cast("int"), F.lit(int(n_phases) - 1)
    )
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        phase.alias("phase"),
        key.alias("order_key"),
        q.alias("quality"),
    )
