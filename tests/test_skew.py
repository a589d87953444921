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
