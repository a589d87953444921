"""Bucketed storage for co-located (shuffle-free) joins.

At 100 TB the documents ⋈ embeddings multimodal join must not shuffle
either side. Bucketing both tables by the join key into the same number
of buckets makes the sort-merge join read-local: Spark plans it with
ZERO Exchange operators (pinned in tests/test_bucketed.py).

Bucketed tables require the session catalog (``saveAsTable``); the
warehouse dir is whatever ``spark.sql.warehouse.dir`` points at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables. With matching bucket specs
    Catalyst elides both shuffle exchanges (and both sorts if sorted)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
