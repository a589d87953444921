"""Parquet table sources.

Replaces the reference's mmap binary store open
(``MmapVectorStore::open``, ``src/disk_store.rs:14-36``) with lazy,
columnar, predicate-pushdown-capable Parquet scans. Nothing is read until
an action runs — the same laziness the reference gets from mmap page
faults, but partitioned and column-pruned.

Timestamp ingest contract (the Spark analogue of ``MmapVectorStore``'s
reject-or-normalize schema check, disk_store.rs:22-27): the driver's
parquet has shipped timestamps in more than one physical encoding over
time — TIMESTAMP(NANOS) (which Spark reads as raw int64 under the
``nanosAsLong`` legacy conf) and plain ``timestamp[us]`` (which Spark 4
reads as TIMESTAMP_NTZ). ``canonicalize_timestamps`` normalizes EVERY
representation to session-zoned TIMESTAMP with the session pinned to
UTC, so epoch math (``unix_micros``) and calendar math (``hour``,
``window``, ``date_trunc``) both agree exactly with a naive-timestamp
oracle. Conversions are exact integer ops (``div``, never float
division — a double mantissa cannot hold 1e18-scale nanos exactly, and
a 1us drift vs the DuckDB oracle would flip hashes). Both the batch
loader (here) and the streaming reader (streaming/events.py) go through
this one function; tests/test_loader_contract.py pins all encodings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from vector_database_in_rust_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TIMESTAMP_COLS = ("ts", "l_shipdate", "o_orderdate")


def configure_reader(spark: SparkSession) -> None:
    """Session confs the ingest contract depends on: UTC session zone
    (calendar functions on canonicalized TIMESTAMP must match the naive
    oracle) and nanos-as-long (so TIMESTAMP(NANOS) files load at all
    instead of PARQUET_TYPE_ILLEGAL).

    .. warning:: SESSION-WIDE side effect. These two confs apply to the
       whole ``SparkSession``, not just this load — every
       ``load_table``/``read_events_stream`` call pins the session to
       UTC timestamp semantics, which changes how unrelated code
       sharing the session renders/parses timestamps. This is the
       engine's declared ingest contract (every operator and oracle in
       this repo assumes it); an application embedding the engine in a
       session it also uses with local-zone semantics should either
       apply UTC at session construction (the recommendation — it makes
       the pin explicit) or use a separate session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def canonicalize_timestamps(df: DataFrame) -> DataFrame:
    """Normalize every known timestamp column to session-zoned TIMESTAMP
    regardless of how the file encoded it:

    - ``bigint``        -> int64 nanoseconds (TIMESTAMP(NANOS) read under
      nanosAsLong, or a raw epoch-nanos column): exact integer div 1000
      to micros.
    - ``timestamp_ntz`` -> plain ``timestamp[us]`` parquet: cast to
      TIMESTAMP — an identity on the wall-clock under the UTC-pinned
      session, making ``unix_micros`` equal the naive epoch micros.
    - ``timestamp``     -> already canonical.
    """
    for c, t in df.dtypes:
        if c not in TIMESTAMP_COLS:
            continue
        if t == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated table by name from an sf directory."""
    configure_reader(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return canonicalize_timestamps(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
