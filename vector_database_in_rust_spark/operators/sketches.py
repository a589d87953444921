"""Approximate (sketch-backed) aggregates: HyperLogLog++ distinct
counts and quantile sketches.

At 100 TB, exact COUNT(DISTINCT) materializes the full key set through
a shuffle and exact percentiles need a global sort; both are
non-starters. Spark's `approx_count_distinct` (HLL++, Heule et al.
2013) and `percentile_approx` (a KLL/GK-family rank sketch) are
MERGEABLE partial aggregates: each task folds its partition into a
fixed-size sketch, only sketch bytes cross the exchange, and accuracy
is a knob (`rsd`, `accuracy`) — the standard trade at scale.

These are approximate by design, so the driver records a rows-only
check; tests/test_sketches.py holds the real bars (HLL relative error
within 3*rsd, quantile rank error within the sketch's guarantee)
against exact answers computed at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_event_stats(
    events: DataFrame,
    *,
    rsd: float = 0.05,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-event-type rollup of sketch aggregates: HLL++ distinct users
    and approximate value percentiles, alongside the exact row count
    (one pass, one shuffle of sketches + counters)."""
    pct = F.percentile_approx(
        "value", [float(p) for p in percentiles], accuracy
    )
    cols = [
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        pct.alias("_pct"),
    ]
    out = events.groupBy("event_type").agg(*cols)
    for i, p in enumerate(percentiles):
        out = out.withColumn(
            f"p{int(p * 100)}", F.round(F.col("_pct")[i], 4)
        )
    return out.drop("_pct")


def approx_event_stats_verdict(
    events: DataFrame,
    *,
    rsd: float = 0.05,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
    rank_slack: float = 0.005,
) -> DataFrame:
    """Verdict-table form of :func:`approx_event_stats` so the sketch
    lane can hold a HASH-verifIABLE driver-correctness row (the same
    trick ``curate_corpus`` uses for its gate booleans): alongside the
    exact per-type row count, emit per-sketch ``*_within_bounds``
    BOOLEANS computed in-plan against exact answers —

    - ``users_within_bounds``: |HLL estimate - exact COUNT DISTINCT|
      <= 3*rsd * exact (the standard 3-sigma bar for HLL++);
    - ``p*_within_bounds``: each approximate percentile lies between
      the EXACT percentiles at ranks p +- ``rank_slack`` (the sketch
      guarantees 1/accuracy = 1e-4 rank error; the verdict allows 50x
      that, so the boolean is stable under any partitioning/merge
      order while a broken sketch — off by whole ranks — still trips).

    The SQL oracle asserts the EXPECTED verdict (all booleans true)
    next to the exact counts, so a sketch drifting out of bounds flips
    the value hash red. Estimates themselves stay out of the hash —
    they are implementation-defined.

    Scale note: this variant is the VERIFICATION harness — it pays for
    exact COUNT(DISTINCT) and exact percentiles, which is exactly what
    sketches exist to avoid at 100 TB. Production uses
    :func:`approx_event_stats`; this runs at driver-check scale.
    """
    pct = F.percentile_approx(
        "value", [float(p) for p in percentiles], accuracy
    )
    exact_lo = F.percentile(
        F.col("value"),
        F.array(*[F.lit(max(0.0, p - rank_slack)) for p in percentiles]),
    )
    exact_hi = F.percentile(
        F.col("value"),
        F.array(*[F.lit(min(1.0, p + rank_slack)) for p in percentiles]),
    )
    out = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd).alias("_approx_users"),
        F.count_distinct("user_id").alias("_exact_users"),
        pct.alias("_pct"),
        exact_lo.alias("_lo"),
        exact_hi.alias("_hi"),
    )
    users_ok = (
        F.abs(F.col("_approx_users") - F.col("_exact_users"))
        <= 3.0 * rsd * F.col("_exact_users")
    )
    out = out.withColumn("users_within_bounds", users_ok)
    for i, p in enumerate(percentiles):
        out = out.withColumn(
            f"p{int(p * 100)}_within_bounds",
            (F.col("_pct")[i] >= F.col("_lo")[i])
            & (F.col("_pct")[i] <= F.col("_hi")[i]),
        )
    return out.drop("_approx_users", "_exact_users", "_pct", "_lo", "_hi")


def heavy_hitters_verdict(
    docs: DataFrame,
    *,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Misra-Gries heavy hitters over the token stream
    (``DataFrame.stat.freqItems`` — Spark's single-pass, mergeable
    frequent-items sketch), in verdict-table form so the lane holds a
    hash-verifiable driver row (the ``approx_event_stats_verdict``
    trick).

    The sketch guarantees every item with frequency > n/k appears in
    its result (false positives allowed, false negatives impossible).
    The verdict computes the EXACT heavy-hitter set at driver-check
    scale and emits (n_tokens, n_heavy, all_present): ``all_present``
    must be true by the guarantee, so a broken sketch — or a support
    mis-wiring — flips the value hash red, while the sketch's
    implementation-defined extra items stay OUT of the hash.

    Scale: the production path is the sketch alone (fixed-size state,
    map-side mergeable — the 100 TB vocabulary profiler); the exact
    side exists only for this verdict. One token-keyed shuffle for the
    exact counts; the 1-row sketch result and the 1-row token total
    broadcast."""
    from vector_database_in_rust_spark.functions.text import tokens

    tok = docs.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    total = tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    heavy = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("_n") * k > F.col("n_tokens"))
    )
    sketch = tok.stat.freqItems(["token"], support=1.0 / k)
    return (
        heavy.crossJoin(F.broadcast(sketch))
        .select(
            "n_tokens",
            F.array_contains(F.col("token_freqItems"), F.col("token")).alias(
                "_present"
            ),
        )
        .groupBy("n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_heavy"),
            F.min("_present").alias("all_present"),
        )
    )


def hll_merge_verdict(
    events: DataFrame,
    *,
    rel_tol: float = 0.15,
) -> DataFrame:
    """HLL MERGEABILITY under the verdict-table hash check: per-type
    per-day Datasketches HLL sketches (``hll_sketch_agg``) are unioned
    (``hll_union_agg``) and the merged estimate is compared against

    1. the single-pass direct sketch over the same rows — these must be
       EXACTLY equal (``merge_equals_direct``): HLL registers combine
       by element-wise max, an associative/commutative/idempotent
       operation, so any split of the data yields bit-identical
       registers. This is the property that makes sketches usable at
       100 TB (per-partition partials, per-day rollups, cross-cluster
       union — all exact-equivalent to one pass); a sketch library
       whose union drifted would break every downstream rollup.
    2. the exact COUNT DISTINCT within ``rel_tol`` (loose 15% bar —
       default lgConfigK=12 gives ~1.6% standard error; the verdict
       only needs to catch a BROKEN estimator, not re-verify the
       error analysis, which tests/test_sketches.py bounds tightly).

    Emits (event_type, n_days, exact_users, merge_equals_direct,
    within_bounds); the oracle asserts both booleans TRUE next to the
    exact counts, so a failed merge or a drifting estimate flips the
    value hash red. Estimates stay out of the hash (implementation-
    defined bytes; equality BETWEEN them is the contract).

    Scale: the daily rollup shuffles fixed-size sketch bytes (the
    whole point); the exact COUNT DISTINCT exists only in this
    verification harness, same caveat as approx_event_stats_verdict.
    """
    daily = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("_day")
    ).agg(F.hll_sketch_agg("user_id").alias("_sk"))
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est_merged"),
    )
    direct = events.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("_est_direct"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    out = merged.join(direct, "event_type")
    return out.select(
        "event_type",
        "n_days",
        "exact_users",
        (F.col("_est_merged") == F.col("_est_direct")).alias("merge_equals_direct"),
        (
            F.abs(F.col("_est_merged") - F.col("exact_users"))
            <= F.lit(rel_tol) * F.col("exact_users")
        ).alias("within_bounds"),
    )
