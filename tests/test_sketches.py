"""Accuracy bars for the sketch aggregates — the driver's check is
rows-only (sketch estimates aren't portable SQL), so these bounds
against exact answers are the real gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vector_database_in_rust_spark.operators.sketches import approx_event_stats
from vector_database_in_rust_spark.sources.tables import load_table


def test_hll_distinct_within_error_bound(spark):
    events = load_table(spark, SF_ORACLE, "events")
    got = {
        r["event_type"]: r["approx_users"]
        for r in approx_event_stats(events, rsd=0.05).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, n in exact.items():
        # HLL++ rsd=0.05 => 3 sigma = 15% relative error
        assert abs(got[et] - n) <= max(0.15 * n, 3), (et, got[et], n)


def test_quantiles_within_rank_tolerance(spark):
    """Each approximate percentile must sit between the exact values at
    q +/- 2% rank — the GK-sketch guarantee at this accuracy, with
    slack for the grouped data."""
    events = load_table(spark, SF_ORACLE, "events")
    got = {r["event_type"]: r for r in approx_event_stats(events).collect()}
    for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        lo_q, hi_q = max(q - 0.02, 0.0), min(q + 0.02, 1.0)
        bounds = {
            r["event_type"]: (r["lo"], r["hi"])
            for r in events.groupBy("event_type")
            .agg(
                F.expr(f"percentile(value, {lo_q})").alias("lo"),
                F.expr(f"percentile(value, {hi_q})").alias("hi"),
            )
            .collect()
        }
        for et, (lo, hi) in bounds.items():
            assert lo - 1e-9 <= got[et][col] <= hi + 1e-9, (col, et)


def test_exact_count_column_is_exact(spark):
    events = load_table(spark, SF_ORACLE, "events")
    got = {
        r["event_type"]: r["n_events"]
        for r in approx_event_stats(events).collect()
    }
    exact = {
        r["event_type"]: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    assert got == exact


def test_hll_union_partition_invariant(spark):
    """Register max-merge is associative/commutative: unioning per-day
    sketches must give the IDENTICAL estimate under any repartitioning
    of the input — the soundness property every downstream sketch
    rollup rests on."""
    from vector_database_in_rust_spark.operators.sketches import (
        hll_merge_verdict,
    )

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    a = hll_merge_verdict(ev).orderBy("event_type").collect()
    b = hll_merge_verdict(ev.repartition(17)).orderBy("event_type").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(r["merge_equals_direct"] and r["within_bounds"] for r in a)
