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


def test_scd2_intervals_partition_and_chain(spark):
    """SCD2 invariants: intervals per user are contiguous (each
    valid_to == the next valid_from), exactly one open (NULL) interval
    per user, and consecutive intervals never share an event_type
    (runs are maximal)."""
    from vector_database_in_rust_spark.operators.relational import events_scd2

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = events_scd2(ev).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for u, iv in by_user.items():
        iv.sort(key=lambda r: r["valid_from"])
        opens = [r for r in iv if r["valid_to"] is None]
        assert len(opens) == 1 and iv[-1]["valid_to"] is None
        for a, b in zip(iv, iv[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]


def test_dq_report_detects_planted_violations(spark):
    """Plant one violation of each class and check the counts."""
    from vector_database_in_rust_spark.operators.relational import dq_report

    import datetime as dt

    d = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, d, "p"),
            (1, 10, "O", 5.0, d, "p"),      # dup orderkey
            (2, None, "O", 5.0, d, "p"),     # null custkey
            (3, 99, "O", -1.0, d, "p"),      # orphan + nonpositive price
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "a")], "c_custkey long, c_name string"
    )
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
         (7, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)],  # orphan l_orderkey
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = {r["check"]: (r["n_checked"], r["n_violations"])
           for r in dq_report(orders, customer, lineitem).collect()}
    assert got["orders_custkey_not_null"] == (4, 1)
    assert got["orders_orderkey_unique"] == (3, 1)
    # NULL custkey is not an FK violation (not-null is its own check);
    # the orphan is order 3
    assert got["orders_fk_customer"][1] == 1
    assert got["lineitem_fk_orders"] == (2, 1)
    assert got["orders_totalprice_positive"] == (4, 1)


def test_scd2_merge_equals_rebuild_at_any_split(spark):
    """merge(build(log<=T), log>T) == build(log) at several split
    points — including splits where some users appear only before or
    only after T."""
    from vector_database_in_rust_spark.operators.relational import (
        events_scd2,
        events_scd2_merge,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = sorted(map(tuple, events_scd2(ev).collect()))
    for day in ("2024-01-03", "2024-01-16", "2024-01-29"):
        split = F.lit(day).cast("timestamp")
        dim = events_scd2(ev.filter(F.col("ts") < split))
        got = sorted(
            map(tuple, events_scd2_merge(dim, ev.filter(F.col("ts") >= split)).collect())
        )
        assert got == want, f"split {day} diverged"


def test_scd2_merge_no_op_batch_keeps_dimension(spark):
    """An empty batch returns the dimension unchanged (open rows stay
    open); a batch repeating every user's current type changes
    nothing either."""
    from vector_database_in_rust_spark.operators.relational import (
        events_scd2,
        events_scd2_merge,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dim = events_scd2(ev)
    empty = ev.filter(F.lit(False))
    got = sorted(map(tuple, events_scd2_merge(dim, empty).collect()))
    assert got == sorted(map(tuple, dim.collect()))


def test_transitions_probabilities_sum_to_one(spark):
    from vector_database_in_rust_spark.operators.relational import (
        events_transitions,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = events_transitions(ev).collect()
    assert out
    by_cur = {}
    for r in out:
        by_cur.setdefault(r["cur"], []).append(r["p"])
        assert r["n"] >= 1 and 0 < r["p"] <= 1
    for cur, ps in by_cur.items():
        assert abs(sum(ps) - 1.0) < 1e-4, cur


def test_transitions_constructed_chain(spark):
    import datetime as dt

    from vector_database_in_rust_spark.operators.relational import (
        events_transitions,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1, i), 1, t, 0.0)
        for i, t in enumerate(["view", "click", "view", "click", "purchase"])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {(r["cur"], r["nxt"]): (r["n"], r["p"]) for r in events_transitions(df).collect()}
    assert got == {
        ("view", "click"): (2, 1.0),
        ("click", "view"): (1, 0.5),
        ("click", "purchase"): (1, 0.5),
    }


def test_fuzzy_pairs_all_within_distance_and_blocked(spark):
    from vector_database_in_rust_spark.operators.relational import (
        fuzzy_name_pairs,
    )

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    out = fuzzy_name_pairs(cust).collect()
    assert out  # neighboring customer numbers differ by one digit
    for r in out:
        assert r["dist"] <= 1
        assert r["name_a"][:15] == r["name_b"][:15]
        assert r["name_a"] < r["name_b"]


def test_bootstrap_ci_brackets_mean_and_narrows_with_n(spark):
    """The CI must bracket the plain mean, be reproducible, and narrow
    as the sample grows (sqrt-n behavior, loosely checked)."""
    from vector_database_in_rust_spark.operators.relational import (
        events_bootstrap_ci,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    out = {r["event_type"]: r for r in events_bootstrap_ci(ev).collect()}
    assert out
    for t, r in out.items():
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], t
        assert r["ci_hi"] - r["ci_lo"] > 0
    again = {r["event_type"]: r for r in events_bootstrap_ci(ev.repartition(11)).collect()}
    assert {t: tuple(r) for t, r in out.items()} == {
        t: tuple(r) for t, r in again.items()
    }
    small = ev.where("event_id % 10 = 0")
    out_small = {
        r["event_type"]: r for r in events_bootstrap_ci(small).collect()
    }
    wide = sum(r["ci_hi"] - r["ci_lo"] for r in out_small.values())
    narrow = sum(r["ci_hi"] - r["ci_lo"] for r in out.values())
    assert narrow < wide


def test_ks_matches_scipy_free_reference(spark):
    """KS stat vs a driver-side exact reference on the real data, and
    the identical-distribution sanity case (A vs A -> D == 0)."""
    from vector_database_in_rust_spark.operators.relational import (
        events_ks_test,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    r = events_ks_test(ev).collect()[0]
    rows = ev.where("event_type in ('click','error')").select(
        "value", "event_type"
    ).collect()
    a = sorted(x["value"] for x in rows if x["event_type"] == "click")
    b = sorted(x["value"] for x in rows if x["event_type"] == "error")
    import bisect

    pts = sorted(set(a) | set(b))
    d = max(
        abs(bisect.bisect_right(a, v) / len(a) - bisect.bisect_right(b, v) / len(b))
        for v in pts
    )
    assert r["ks_stat"] == round(d, 6)
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    # A-vs-A sanity via a relabeled copy (calling with type_a == type_b
    # is out of contract: the B sample would be empty):
    half = ev.where("event_type = 'click'")
    both = half.unionByName(
        half.replace("click", "error", subset=["event_type"])
    )
    r2 = events_ks_test(both).collect()[0]
    assert r2["ks_stat"] == 0.0 and not r2["reject"]


def test_chi2_zero_on_perfectly_independent_table(spark):
    from vector_database_in_rust_spark.operators.relational import (
        docs_chi2_independence,
    )

    rows = [
        (i, "t", lang, f"s{i % 4}", 1)
        for i, lang in enumerate(
            [l for l in ("en", "de") for _ in range(8)]
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r = docs_chi2_independence(df).collect()[0]
    # every lang sees every source equally often -> exact independence
    assert r["chi2"] == 0.0
    assert r["df"] == 3 and r["n"] == 16
