"""Relational/analytic operators over the harness star schema.

The reference has no relational operators at all (SURVEY.md §2.2) — this
module is the extension surface proving the engine is a general analytics
engine, exercised over the driver's TPC-H-ish tables and the ``events``
stream table. Each query is shaped for scale:

- aggregations are expressed so map-side partial aggregation applies
  (plain groupBy/agg over low-cardinality keys);
- dimension joins broadcast the small side explicitly;
- the events rollup pre-truncates timestamps before grouping so the
  shuffle key is the (hour, type) pair, never the raw timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multimodal_join(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """One row per document carrying text metadata AND its vector side by
    side — the multimodal-column fixture (documents ⋈ embeddings on
    doc_id = vec_id, FIXTURES.md §B). Equi-join on the shared key; at
    scale both sides bucket by id so this is shuffle-free with bucketed
    tables."""
    from vector_database_in_rust_spark.functions.vectors import dot_product

    return (
        docs.join(emb, on=docs.doc_id == emb.vec_id, how="inner")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "label",
            F.size("embedding").alias("dim"),
            F.round(
                F.sqrt(dot_product(F.col("embedding"), F.col("embedding"))), 4
            ).alias("emb_norm"),
        )
    )


def events_hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event type: the batch form of the
    streaming windowed aggregation (streaming/ runs the same logic
    incrementally with a watermark)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            # avg derived from the rounded sum: round(avg(x)) can land on a
            # rounding boundary where partial-sum order flips the hash;
            # round(sum)/count is deterministic given the sum is.
            F.round(
                F.round(F.sum("value"), 4) / F.count(F.lit(1)), 4
            ).alias("avg_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


def events_json_stats(events: DataFrame) -> DataFrame:
    """JSON scalar-function surface: extract props.k and aggregate."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.round(F.sum(k), 4) / F.count(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
            F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("n_missing_k"),
        )
    )


def tpch_q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape (pricing summary report) on the harness lineitem:
    the canonical wide-aggregation benchmark query. Filter pushes to the
    parquet scan; group-by keys are 2 low-cardinality flags."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            # Money sums aggregate ~60k doubles of magnitude 1e4: partial-sum
            # order can perturb the last ~1e-7; 2-decimal rounding keeps the
            # oracle hash stable with huge margin.
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(
                F.round(F.sum("l_quantity"), 4) / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.round(
                F.round(F.sum("l_discount"), 4) / F.count(F.lit(1)), 4
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_customers_by_region(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    top_n: int = 10,
) -> DataFrame:
    """Star-schema join + per-group top-k: revenue top-N customers per
    region. Dimensions (nation, region) broadcast; the orders->customer
    join shuffles on custkey; per-region ranking is a window over the
    aggregated (small) result."""
    from pyspark.sql import Window

    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
    joined = rev.join(dim, rev.o_custkey == dim.c_custkey)
    w = Window.partitionBy("r_name").orderBy(
        F.col("revenue").desc(), F.col("c_custkey")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.col("r_name").alias("region"),
            "rank",
            F.col("c_custkey").alias("custkey"),
            "revenue",
        )
        .orderBy("region", "rank")
    )


def label_topk_per_query(
    emb: DataFrame, queries: DataFrame, k: int = 3
) -> DataFrame:
    """Per-(query, label) top-k: grouped ranking over a computed key —
    exercises multi-key windows (per-label nearest neighbors is the
    standard per-class retrieval shape).

    Scale: same two-phase WindowGroupLimit top-k as knn_batch, with
    (query_id, label) as the group key."""
    from pyspark.sql import Window

    from vector_database_in_rust_spark.functions.vectors import l2_squared

    pairs = emb.join(F.broadcast(queries), how="cross")
    scored = pairs.select(
        "query_id",
        "label",
        F.col("vec_id").alias("vec_id"),
        F.round(
            l2_squared(F.col("embedding"), F.col("query_embedding")), 4
        ).alias("dist"),
    )
    w = Window.partitionBy("query_id", "label").orderBy("dist", "vec_id")
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select("query_id", "label", "vec_id", "dist")
        .orderBy("query_id", "label", "dist", "vec_id")
    )


def sessionize_events(
    events: DataFrame, *, gap_minutes: int = 30
) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    gap to the previous event exceeds ``gap_minutes``. Classic lag +
    cumulative-sum window pattern; returns per-session summaries.

    Scale: one shuffle on user_id (the window key); sessions never
    materialize as state — they are derived by prefix sum inside each
    user's sorted partition. Skewed users are bounded by per-user event
    counts; for power users combine with a date co-key."""
    from pyspark.sql import Window

    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap math in exact integer MICROSECONDS (unix_micros), never seconds:
    # unix_timestamp truncates sub-second parts, which flips sessions
    # whose true gap straddles the threshold by < 1s vs any
    # full-precision implementation (e.g. the DuckDB oracle's epoch_us).
    gap_us = gap_minutes * 60 * 1_000_000
    marked = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w_user))
            )
            > gap_us,
            1,
        )
        .otherwise(0)
        .alias("_new_session"),
    )
    with_ids = marked.withColumn(
        "session_seq",
        F.sum("_new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def asof_join_events(
    events: DataFrame,
    *,
    left_type: str = "click",
    right_type: str = "error",
) -> DataFrame:
    """AS-OF join within the events table: for every ``left_type`` event,
    the most recent ``right_type`` event by the same user at or before
    it. A custom operator Spark lacks natively, composed from existing
    DataFrame ops (SURVEY §2.2 joins row):

    union the two tagged streams -> one window per user ordered by
    (ts, event_id) -> ``last(right_ts, ignoreNulls)`` carries the latest
    preceding right-side event forward. ONE shuffle on user_id, no
    range-join explosion — the standard distributed as-of shape
    (time-series joins in kdb/Flink follow the same merge discipline).
    """
    from pyspark.sql import Window

    tagged = events.filter(
        F.col("event_type").isin([left_type, right_type])
    ).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("_r_ts"),
        F.when(F.col("event_type") == right_type, F.col("event_id")).alias(
            "_r_id"
        ),
    )
    # Order by (ts, is_left, event_id): a right event at the SAME
    # timestamp as a left event sorts first, making the join "at or
    # before" inclusively, deterministically.
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            (F.col("event_type") == left_type).cast("int"),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        F.last("_r_id", ignorenulls=True).over(w).alias("asof_event_id"),
    )
    return (
        joined.filter(F.col("event_type") == left_type)
        .select("user_id", "event_id", "ts", "asof_event_id", "asof_ts")
        .orderBy("user_id", "event_id")
    )


def events_value_percentiles(events: DataFrame) -> DataFrame:
    """Exact per-type percentiles of the value column (median/p90/p99,
    linear interpolation). Exact percentile is a full-sort-per-group
    aggregate — fine for bounded groups; for 100 TB pipelines prefer
    ``approx_percentile`` (t-digest, mergeable sketch) and accept the
    error bound."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
    )


def events_grouping_sets(events: DataFrame) -> DataFrame:
    """Multi-granularity rollup via GROUPING SETS: totals by
    (type, hour-of-day), by type alone, and grand total in ONE pass —
    Spark computes all granularities from a single shuffle (Expand +
    partial aggregation), instead of three separate jobs."""
    spark = events.sparkSession
    events.select(
        F.col("event_type"),
        F.hour("ts").cast("long").alias("hod"),
        "value",
    ).createOrReplaceTempView("_ev_gs")
    return spark.sql(
        """
        SELECT event_type, hod,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM _ev_gs
        GROUP BY GROUPING SETS ((event_type, hod), (event_type), ())
        """
    )


def derive_time_windows(events: DataFrame, *, n_windows: int = 24) -> DataFrame:
    """Deterministic non-aligned time windows spanning the events table:
    window k covers [mn + k*span//n, mn + k*span//n + span//(2n)] in
    epoch MICROSECONDS — half the stride, so windows are disjoint and
    deliberately NOT aligned to any calendar bucket (the adversarial
    case for a range join). Fully declarative: one global agg (two
    longs) broadcast into an exploded sequence — no driver action."""
    span = events.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    stride = ((F.col("mx") - F.col("mn")) / n_windows).cast("long")
    return (
        span.select(
            F.explode(F.sequence(F.lit(0), F.lit(n_windows - 1))).alias("k"),
            "mn",
            "mx",
        )
        .select(
            F.col("k").cast("long").alias("window_id"),
            (F.col("mn") + F.col("k") * stride).alias("w_start_us"),
            (F.col("mn") + F.col("k") * stride + (stride / 2).cast("long")).alias(
                "w_end_us"
            ),
        )
    )


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str = "ts",
    start_col: str = "w_start_us",
    end_col: str = "w_end_us",
    bucket_minutes: int = 360,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join (event.ts BETWEEN interval.start/end)
    via EQUI-BUCKET prefiltering — the range-join operator Spark lacks.

    A raw theta join compiles to BroadcastNestedLoopJoin: every event
    tested against every interval, O(|events| x |intervals|) per-pair
    work even when the small side broadcasts — the classic range-join
    scale killer. Instead: each event carries its ONE time bucket; each
    interval explodes to the buckets it covers (span/bucket + 1 keys);
    an ordinary shuffled equi-join on the bucket key pairs events only
    with temporally-plausible intervals, and a cheap residual BETWEEN
    filter finalizes. An event matches an interval in exactly one
    bucket (its own), so no post-join dedup is needed. Cost:
    |events| + Σ(interval span)/bucket join input rows + true matches —
    linear, shuffle keyed on time (naturally balanced unless the
    workload itself is a time hotspot; then shrink bucket_minutes).

    ``bucket_minutes`` trades interval replication (long intervals,
    small buckets -> many keys) against join selectivity (huge buckets
    -> more residual-filter misses). Set it near the median interval
    length.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000
    ev = events.withColumn(
        "_b", F.floor(F.unix_micros(ts_col) / bucket_us).cast("long")
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_us).cast("long"),
                F.floor(F.col(end_col) / bucket_us).cast("long"),
            )
        ),
    )
    return (
        ev.join(iv, on="_b", how=how)
        .filter(
            (F.unix_micros(ts_col) >= F.col(start_col))
            & (F.unix_micros(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )


def events_in_windows(events: DataFrame, *, n_windows: int = 24) -> DataFrame:
    """Per-window event totals via the bucketed range join — the harness
    shape: derive disjoint non-aligned windows, range-join, aggregate."""
    windows = derive_time_windows(events, n_windows=n_windows)
    joined = bucketed_range_join(events, windows)
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def tpch_q3_shipping(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    top_n: int = 10,
) -> DataFrame:
    """TPC-H Q3 (shipping priority), adapted to the driver's columns:
    revenue of orders from one market segment placed before the cutoff
    with line items shipped after it. Plan shape: both date predicates
    push to the scans, the filtered customer key list broadcasts, the
    orders⋈lineitem join shuffles on the orderkey, and the top-N is a
    TakeOrderedAndProject over the aggregated rows."""
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    cut = F.lit(cutoff).cast("timestamp")
    o = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        li, F.col("o_orderkey") == F.col("l_orderkey")
    )
    agg = j.groupBy("o_orderkey", "o_orderdate").agg(
        F.round(F.sum("_rev"), 4).alias("revenue")
    )
    return agg.orderBy(F.col("revenue").desc(), "o_orderkey").limit(top_n)


def events_moving_avg(events: DataFrame, *, event_type: str = "click") -> DataFrame:
    """Frame-based analytic windows (the one window class the suite
    didn't cover): per-user 5-event moving average (ROWS BETWEEN 4
    PRECEDING AND CURRENT ROW) and running total. One shuffle on
    user_id; frames evaluate inside each sorted partition, and the
    deterministic (ts, event_id) order makes float accumulation
    reproducible across engines."""
    from pyspark.sql import Window

    base = events.filter(F.col("event_type") == event_type)
    order = [F.col("ts"), F.col("event_id")]
    w5 = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-4, 0)
    wcum = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return base.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w5), 4).alias("avg5"),
        F.round(F.sum("value").over(wcum), 4).alias("cum_value"),
    )


def tpch_q5_local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per nation from orders
    where the customer and the line item's supplier sit in the SAME
    nation, inside one region, for one order year. The canonical
    many-way star join.

    Plan shape at scale: region and nation are tiny and broadcast
    always; customer and supplier broadcast at driver scale via AQE
    stats but are written as plain equi-joins so at 100 TB they shuffle
    on their keys instead of OOMing the driver — the only unavoidable
    big shuffle is orders⋈lineitem on the orderkey. The date predicates
    push to the orders scan; the region filter prunes nation before
    anything joins it; the same-nation constraint is the
    c_nationkey = s_nationkey equi-join condition, not a post-filter.
    """
    r = region.filter(F.col("r_name") == region_name).select("r_regionkey")
    n = nation.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = customer.join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey")
    s = supplier.join(
        F.broadcast(n.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(F.round(F.sum("_rev"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def tpch_q6_forecast_revenue(
    lineitem: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    discount_lo: float = 0.05,
    discount_hi: float = 0.07,
    max_quantity: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): one filtered scan, one
    global sum — the pure predicate-pushdown benchmark. All four
    predicates (two dates, discount band, quantity cap) reach the
    parquet scan as PushedFilters; only 3 columns are read; the
    aggregate is a map-side partial sum into a 1-row exchange."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= discount_lo)
            & (F.col("l_discount") <= discount_hi)
            & (F.col("l_quantity") < max_quantity)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    limit: int = 20,
) -> DataFrame:
    """TPC-H Q10 (returned item reporting): customers who returned the
    most revenue in one quarter — fact⋈fact join + dimension lookup +
    grouped rollup + top-k.

    Plan shape at scale: the order-date quarter pushes to the orders
    scan and ``l_returnflag = 'R'`` pushes to the lineitem scan (both
    facts pre-filtered before the orderkey shuffle — the only big
    exchange); nation broadcasts; the customer rollup shuffles
    (custkey, partial sums) only; top-k is TakeOrdered."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    # Revenue accumulates in DECIMAL: the per-customer sums here are
    # small groups of near-boundary values, where double's partition-
    # order non-associativity can flip a round(x, 2) (observed at
    # sf0.01: 307843.595 rounding differently per engine). Decimal
    # addition is exact and order-independent, so the rounded result is
    # deterministic on any cluster layout.
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("_rev"),
    )
    j = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum("_rev"), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(limit)
    )


def tpch_q14_promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    date_from: str = "1996-03-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of one month's revenue from
    promo parts — a conditional aggregate over lineitem⋈part.

    Plan shape at scale: the ship-date window pushes to the lineitem
    scan (reads one month of a 100 TB fact table); part joins on
    p_partkey as a plain equi-join — AQE broadcasts it at driver scale,
    shuffles on partkey beyond — and the CASE folds into the partial
    aggregate, so one row crosses the final exchange."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    j = li.join(
        part.select("p_partkey", "p_type"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.sum(
        F.when(F.col("p_type").like("PROMO%"), F.col("_rev")).otherwise(0.0)
    )
    total = F.sum("_rev")
    return j.agg(
        F.round(promo, 2).alias("promo_revenue"),
        F.round(total, 2).alias("total_revenue"),
        F.round(100.0 * promo / total, 4).alias("promo_pct"),
    )


def tpch_q18_large_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    min_quantity: float = 250.0,
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q18 (large volume customers): orders whose total line-item
    quantity exceeds a threshold, with their customers — the
    aggregate-then-semi-join pattern (SQL: IN over a HAVING subquery).

    Plan shape at scale: the quantity rollup shuffles lineitem once on
    l_orderkey (map-side partial sums); the HAVING filter cuts it to a
    sliver (<1% of orders), so the subsequent joins carry a tiny build
    side that AQE broadcasts against orders and customer — neither big
    table shuffles again. Top-k by order value is TakeOrdered, not a
    global sort."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_quantity)
    )
    j = orders.join(
        big, F.col("o_orderkey") == F.col("l_orderkey")
    ).join(customer, F.col("o_custkey") == F.col("c_custkey"))
    return (
        j.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(limit)
    )


def unfulfilled_orders(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Orders with NO line items — the LEFT ANTI join (SQL NOT EXISTS).
    Anti/semi joins ship only the probe side's columns and keep at most
    one output row per probe row — no fan-out, no payload from the
    build side; the build side reduces to a distinct-key relation
    before shuffling."""
    keys = lineitem.select(F.col("l_orderkey")).distinct()
    return (
        orders.join(keys, orders.o_orderkey == keys.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


def fulfilled_high_value_orders(
    orders: DataFrame, lineitem: DataFrame, *, min_total: float = 100_000.0
) -> DataFrame:
    """High-value orders that DO have line items — the LEFT SEMI join
    (SQL EXISTS). The value filter pushes to the orders scan before the
    join; the lineitem side contributes existence only."""
    keys = lineitem.select(F.col("l_orderkey")).distinct()
    return (
        orders.filter(F.col("o_totalprice") >= min_total)
        .join(keys, orders.o_orderkey == keys.l_orderkey, "left_semi")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(events: DataFrame, *, types: tuple[str, ...] = EVENT_TYPES) -> DataFrame:
    """Hour × event-type count matrix via PIVOT — the wide-format
    rollup dashboards consume.

    The pivot value list is EXPLICIT (never inferred): inference costs
    an extra distinct-scan job and makes the output schema data-
    dependent — a new event type appearing at hour N would change every
    downstream consumer's schema. With fixed values the pivot compiles
    to one groupBy with |types| conditional partial aggregates — the
    same single-shuffle shape as the long-format rollup."""
    p = (
        events.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour")
        .pivot("event_type", list(types))
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "hour",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in types
        ],
    )


def events_histogram(
    events: DataFrame,
    *,
    value_col: str = "value",
    bin_width: float = 25.0,
    num_bins: int = 20,
) -> DataFrame:
    """Fixed-width histogram of a value column (out-of-range values
    clamp to the edge bins). Fixed bounds on purpose: data-dependent
    bounds (min/max) cost an extra full pass and make the bin edges
    nondeterministic under late data — dashboards want stable edges.
    One narrow projection + one |bins|-key groupBy: map-side partial
    counts, a few dozen rows cross the exchange regardless of input
    size."""
    v = F.col(value_col)
    bin_ = F.least(
        F.greatest(F.floor(v / bin_width), F.lit(0)), F.lit(num_bins - 1)
    ).cast("int")
    return (
        events.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin") * bin_width).alias("lo"),
            ((F.col("bin") + 1) * bin_width).alias("hi"),
            "n",
        )
    )


def events_anomalies(
    events: DataFrame, *, z_threshold: float = 3.0
) -> DataFrame:
    """Per-event-type z-score outlier flagging — the standard
    monitoring pass over a metric stream.

    Variance comes from the explicit two-moment formula
    (E[x²] − E[x]²) computed on ROUNDED sums, not the built-in
    stddev aggregate: the built-ins accumulate in partition order
    (Welford partials), so their last bits differ run to run and
    across engines; rounded moment sums are deterministic — same
    discipline as the rollup's avg. One groupBy over the type key
    (map-side partials), then a broadcast join of the 5-row stats
    table back onto the stream — the big side never shuffles."""
    stats = (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.round(F.sum("value"), 4).alias("_s"),
            F.round(F.sum(F.col("value") * F.col("value")), 4).alias("_s2"),
        )
        .select(
            "event_type",
            (F.col("_s") / F.col("_n")).alias("_mean"),
            F.sqrt(
                F.col("_s2") / F.col("_n")
                - (F.col("_s") / F.col("_n")) * (F.col("_s") / F.col("_n"))
            ).alias("_std"),
        )
    )
    z = (F.col("value") - F.col("_mean")) / F.col("_std")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > z_threshold)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("z"),
        )
    )


def tpch_q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q4 shape (order priority checking), adapted to the driver
    schema: count orders per priority in a date window having AT LEAST
    ONE returned lineitem (the testdata lacks commit/receipt dates, so
    ``l_returnflag = 'R'`` stands in for the late-delivery EXISTS —
    the plan shape is identical: grouped LEFT SEMI join).

    Scale: the orders side is pre-filtered by the pushed date window
    BEFORE the semi join; the lineitem probe side carries only
    (l_orderkey) after its pushed returnflag filter. The semi join
    never duplicates orders rows (EXISTS semantics, not inner-join +
    distinct), and the final agg is 5 groups."""
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey"
    )
    return (
        window.join(
            returned,
            on=window.o_orderkey == returned.l_orderkey,
            how="left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q12_shipmode(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority), adapted:
    group the year's lineitems by ``l_linestatus`` (the schema's stand-in
    for shipmode) and count high-priority (1-URGENT/2-HIGH) vs
    low-priority orders per group — the classic conditional-aggregation-
    over-a-join probe.

    Scale: lineitem pre-filters on the pushed shipdate window; orders
    projects only (o_orderkey, o_orderpriority). The join is
    fact-to-fact on orderkey — at 100 TB both sides shuffle on the key
    once (AQE may broadcast the filtered orders side); the conditional
    sums are map-side partials into a 2-group exchange."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    ords = orders.select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, on=li.l_orderkey == ords.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profiler: per column, the row/null/distinct
    counts and min/max (stringified for type portability) — the
    data-quality summary a pipeline computes before trusting a new
    drop of upstream data.

    Scale: ONE scan computes every column's aggregates side by side
    (a single wide HashAggregate with map-side partials — not one job
    per column, the classic profiling mistake). Exact count_distinct
    here because the oracle checks it exactly at test scale; the fleet
    variant swaps in approx_count_distinct (HLL, mergeable, fixed
    size) per the sketches module.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    # unpivot to one row per column: (column, n_rows, n_nulls,
    # n_distinct, min_str, max_str)
    parts = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*parts)).alias("p")).select("p.*")
