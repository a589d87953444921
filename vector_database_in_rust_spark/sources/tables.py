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

from vector_database_in_rust_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated table by name from an sf directory."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
