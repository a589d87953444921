from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_in_rust_spark.functions.skew import content_salt, salted_join


def test_salted_join_equals_plain_join(spark):
    # Heavily skewed big side: 90% of rows share key 1.
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(big, small, "k", salt_factor=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    a = {r["k"]: (r["n"], r["s"]) for r in plain.collect()}
    b = {r["k"]: (r["n"], r["s"]) for r in salted.collect()}
    assert a == b


def test_salt_deterministic_across_runs_and_partitioning(spark):
    """The salt must be a pure function of row content: two independent
    evaluations — including one over a reshuffled copy of the data —
    must assign every row the same salt. (A salt derived from
    monotonically_increasing_id or unseeded rand fails this and can
    drop/duplicate rows under task retry.)"""
    big = spark.range(5_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    def assignment(df):
        return {
            (r["k"], r["payload"]): r["_salt"]
            for r in df.withColumn(
                "_salt", content_salt(["k", "payload"], 8)
            ).collect()
        }
    first = assignment(big)
    second = assignment(big)                     # fresh evaluation, same plan
    reshuffled = assignment(big.repartition(13)) # different physical layout
    assert first == second == reshuffled
    assert set(first.values()) == set(range(8)), "salts should cover all buckets"


def test_salted_aggregate_equals_plain(spark):
    from vector_database_in_rust_spark.functions.skew import salted_aggregate

    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(1000)],
        "key INT, event_id BIGINT, value DOUBLE",
    )
    got = {
        r["key"]: (round(r["sum_value"], 6), r["count_event_id"])
        for r in salted_aggregate(
            df, ["key"], {"value": "sum", "event_id": "count"}
        ).collect()
    }
    want = {
        r["key"]: (round(r["s"], 6), r["n"])
        for r in df.groupBy("key")
        .agg(F.sum("value").alias("s"), F.count("event_id").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_aggregate_spreads_hot_key(spark):
    """A single hot key must occupy multiple salt buckets in the
    partial stage — the whole point of the rewrite."""
    from vector_database_in_rust_spark.functions.skew import content_salt

    df = spark.createDataFrame(
        [(1, i) for i in range(500)], "key INT, event_id BIGINT"
    )
    n_salts = (
        df.withColumn("_salt", content_salt(["event_id"], 8))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_salted_aggregate_rejects_unknown_agg(spark):
    import pytest

    from vector_database_in_rust_spark.functions.skew import salted_aggregate

    df = spark.createDataFrame([(1, 2)], "key INT, v INT")
    with pytest.raises(ValueError):
        salted_aggregate(df, ["key"], {"v": "avg"})
