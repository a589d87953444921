"""Parquet table sources.

Replaces the reference's mmap binary store open
(``MmapVectorStore::open``, ``src/disk_store.rs:14-36``) with lazy,
columnar, predicate-pushdown-capable Parquet scans. Nothing is read until
an action runs — the same laziness the reference gets from mmap page
faults, but partitioned and column-pruned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from vector_database_in_rust_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver's parquet stores timestamps as TIMESTAMP(NANOS), which Spark's
# parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). We read nanos as
# raw int64 (legacy conf) and convert to microsecond timestamps with exact
# integer division (`div`, never float division — a double mantissa cannot
# hold 1e18-scale nanos exactly, and a 1us drift vs the DuckDB oracle would
# flip hashes).
TIMESTAMP_COLS = ("ts", "l_shipdate", "o_orderdate")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated table by name from an sf directory."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c, t in df.dtypes:
        if c in TIMESTAMP_COLS and t == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
