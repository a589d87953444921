from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_in_rust_spark.sources.sinks import read_result, write_result
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def topk(spark):
    from vector_database_in_rust_spark import harness

    return harness.QUERIES["knn_exact"](spark, SF_SMOKE)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip(spark, tmp_path, topk, fmt):
    p = str(tmp_path / fmt)
    write_result(topk, p, fmt=fmt, single_file=True)
    back = read_result(spark, p, fmt=fmt, schema="vec_id BIGINT, dist DOUBLE" if fmt != "parquet" else None)
    got = sorted((r["vec_id"], r["dist"]) for r in back.collect())
    want = sorted((r["vec_id"], r["dist"]) for r in topk.collect())
    assert got == want


def test_csv_encodes_vector_columns(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(3)
    p = str(tmp_path / "vec_csv")
    write_result(emb, p, fmt="csv", single_file=True)
    raw = spark.read.option("header", "true").csv(p)
    assert raw.schema["embedding"].dataType.simpleString() == "string"
    import json

    first = raw.first()
    arr = json.loads(first["embedding"])
    assert isinstance(arr, list) and len(arr) == 64


def test_partitioned_parquet_sink(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    p = str(tmp_path / "by_lang")
    write_result(docs, p, fmt="parquet", partition_by=["lang"])
    back = spark.read.parquet(p)
    assert back.count() == docs.count()
    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan


def test_bad_format_rejected(topk, tmp_path):
    with pytest.raises(ValueError, match="unsupported sink format"):
        write_result(topk, str(tmp_path / "x"), fmt="avro")
