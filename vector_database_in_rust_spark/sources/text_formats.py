"""CSV / JSON ingestion with ENFORCED schemas.

The reference ingests only its raw binary store (src/disk_store.rs) and
parquet-shaped mock data; real pipelines ingest CSV/JSON first. Design
rules, chosen for the 100 TB case:

- **Schema is required, never inferred.** Inference is a full extra
  pass over the data before the real scan, and silently degrades types
  (ints become doubles, timestamps become strings) on dirty rows. An
  explicit schema keeps ingestion single-pass and makes the contract
  checkable.
- **FAILFAST by default.** PERMISSIVE (Spark's default) turns corrupt
  rows into silent nulls — at ingest time that is data loss you find
  weeks later. ``mode="PERMISSIVE"`` remains available for
  quarantine-style flows (pair it with ``columnNameOfCorruptRecord``).
- **Arrays ride as JSON strings in CSV.** Flat CSV cannot represent
  ``ARRAY<FLOAT>``; the sink (``sinks.write_result``) JSON-encodes them
  and these readers decode them back, so vector columns survive a
  CSV round trip losslessly. Pass the TARGET schema (with array types);
  the reader reads those columns as strings and ``from_json``s them.
- Both scans are splittable (CSV always; JSON unless ``multiline``),
  so they parallelize across executors like any other file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _parse_schema(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)  # noqa: SLF001
    if not isinstance(parsed, T.StructType):
        raise ValueError(f"schema must describe a struct, got {parsed}")
    return parsed


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-enforced CSV reader (inverse of ``write_result(fmt='csv')``).

    ``schema`` is the TARGET schema and may contain array/struct columns:
    those are read as JSON strings (how the sink writes them) and decoded
    with ``from_json``, everything else is parsed natively. A row that
    does not parse under the schema fails the job (FAILFAST) instead of
    becoming nulls.
    """
    target = _parse_schema(schema)
    read_fields = [
        T.StructField(
            f.name,
            T.StringType()
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
            else f.dataType,
            f.nullable,
        )
        for f in target.fields
    ]
    # Spark applies a CSV schema POSITIONALLY; enforceSchema=false makes
    # it additionally validate the file header against the schema's field
    # names, so a column-order mismatch fails loudly instead of silently
    # mis-assigning columns.
    raw = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .option("enforceSchema", "false")
        .schema(T.StructType(read_fields))
        .csv(path)
    )
    cols = []
    for f in target.fields:
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)):
            cols.append(F.from_json(F.col(f.name), f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return raw.select(*cols)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    multiline: bool = False,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-enforced JSON-lines reader (inverse of
    ``write_result(fmt='json')``). Keep ``multiline=False`` for scale:
    JSON-lines splits by line and parallelizes; a multiline document is
    one unsplittable task."""
    target = _parse_schema(schema)
    return (
        spark.read.option("multiLine", str(multiline).lower())
        .option("mode", mode)
        .schema(target)
        .json(path)
    )


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON ingestion with an explicit quarantine lane:
    returns ``(good, quarantined)`` — rows parsing cleanly under the
    schema, and the raw text of rows that did not.

    This is the production middle ground between FAILFAST (right for
    curated inputs; one bad row kills a 10-hour job on uncurated ones)
    and silent PERMISSIVE (corrupt rows become NULL-filled ghosts that
    poison aggregates weeks later): the pipeline proceeds on clean
    rows while every malformed line is preserved for replay/alerting —
    same quarantine discipline as streaming/ingest. One pass, one
    filter split on ``_corrupt_record``; both lanes are lazy."""
    target = _parse_schema(schema)
    with_corrupt = T.StructType(
        target.fields
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    raw = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(with_corrupt)
        .json(path)
        .cache()
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_record")
    )
    return good, bad
