"""Result sinks: export query results to parquet / CSV / JSON.

The reference's only sink is a raw-binary ``tofile`` (its data
generator, generate_mock_data.py:18); the engine adds the standard
columnar + interchange formats. Vector columns (``ARRAY<FLOAT>``) are
not representable in flat CSV — they are JSON-encoded there (explicit,
lossless, documented) and kept native in parquet/JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_result(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
) -> None:
    """Write a result DataFrame. ``single_file`` coalesces to one task —
    only for small results (top-k lists, aggregates), never raw data."""
    if fmt not in ("parquet", "csv", "json", "orc"):
        raise ValueError(f"unsupported sink format {fmt!r}")
    out = df
    if fmt == "csv":
        for name, dtype in df.dtypes:
            if dtype.startswith("array") or dtype.startswith("struct"):
                out = out.withColumn(name, F.to_json(F.col(name)))
    if single_file:
        out = out.coalesce(1)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)


def read_result(
    spark: SparkSession, path: str, *, fmt: str = "parquet",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    if fmt == "csv":
        reader = spark.read.option("header", "true")
        return reader.schema(schema).csv(path) if schema else reader.option(
            "inferSchema", "true"
        ).csv(path)
    if fmt == "json":
        return spark.read.schema(schema).json(path) if schema else spark.read.json(path)
    if fmt == "orc":
        return spark.read.orc(path)
    return spark.read.parquet(path)
