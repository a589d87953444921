"""Funnel/retention semantics on constructed corpora: the ordering
cases the oracle-parity check can't isolate (the synthetic corpus has
few order violations; these construct them explicitly)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.relational import (
    events_funnel,
    events_retention,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, t, 1.0) for i, (d, h, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_order_semantics(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
        # user 2: purchase BEFORE view -> converts only to stage 1
        (2, 1, 2, "purchase"), (2, 2, 2, "view"),
        # user 3: view then purchase but click precedes the view -> stage 1 only
        (3, 1, 3, "click"), (3, 2, 3, "view"), (3, 3, 3, "purchase"),
        # user 4: view + click, no purchase -> stage 2
        (4, 1, 4, "view"), (4, 2, 4, "click"),
        # user 5: no view at all -> nowhere
        (5, 1, 5, "click"), (5, 2, 5, "purchase"),
    ]
    got = {r["stage"]: r["n_users"] for r in events_funnel(_ev(spark, rows)).collect()}
    assert got == {1: 4, 2: 2, 3: 1}


def test_funnel_counts_monotone_on_corpus(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = [r["n_users"] for r in events_funnel(ev).orderBy("stage").collect()]
    assert got[0] >= got[1] >= got[2] >= 0 and got[0] > 0


def test_retention_offset_zero_is_cohort_size(spark):
    rows = [
        (1, 1, 1, "view"), (1, 2, 1, "click"),   # u1 cohort d1, active d1
        (2, 1, 1, "view"),                         # u1 active d2
        (1, 1, 2, "view"),                         # u2 cohort d1, active d1 only
        (3, 1, 3, "view"), (5, 1, 3, "view"),      # u3 cohort d3, active d3+d5
    ]
    out = {
        (str(r["cohort_day"].date()), r["day_offset"]): r["n_active"]
        for r in events_retention(_ev(spark, rows)).collect()
    }
    assert out[("2024-01-01", 0)] == 2     # u1, u2
    assert out[("2024-01-01", 1)] == 1     # u1 returns day 2
    assert out[("2024-01-03", 0)] == 1
    assert out[("2024-01-03", 2)] == 1     # u3 returns at offset 2
    assert ("2024-01-01", 2) not in out    # nobody active
    # offset-0 row exists for every cohort and equals its size
    sizes = {("2024-01-01",): 2, ("2024-01-03",): 1}
    for (c,), n in sizes.items():
        assert out[(c, 0)] == n


def test_unpivot_roundtrips_pivot(spark):
    """pivot ∘ unpivot == the plain long rollup, exactly."""
    from vector_database_in_rust_spark.operators.relational import (
        events_unpivot,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        (r["hour"], r["event_type"]): r["n"]
        for r in events_unpivot(ev).collect()
    }
    want = {
        (r["hour"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_full_join_keeps_one_sided_days(spark):
    from vector_database_in_rust_spark.operators.relational import (
        events_daily_full_join,
    )

    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 1, "click", 1.0),
        (2, dt.datetime(2024, 1, 2, 5), 1, "error", 1.0),   # error-only day
        (3, dt.datetime(2024, 1, 3, 5), 1, "click", 1.0),   # click-only day
        (4, dt.datetime(2024, 1, 3, 6), 2, "error", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {
        str(r["day"].date()): (r["n_clicks"], r["n_errors"])
        for r in events_daily_full_join(df).collect()
    }
    assert got == {
        "2024-01-01": (1, 0),
        "2024-01-02": (0, 1),
        "2024-01-03": (1, 1),
    }
