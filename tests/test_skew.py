from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_in_rust_spark.functions.skew import salted_join


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
