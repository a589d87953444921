from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_in_rust_spark.sources.sinks import read_result, write_result
from tests.conftest import SF_ORACLE, SF_SMOKE


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


def test_csv_reader_vector_roundtrip_exact(spark, tmp_path):
    """ARRAY<FLOAT> -> JSON-in-CSV -> back: bit-exact floats (shortest-
    roundtrip text repr both directions)."""
    from vector_database_in_rust_spark.sources.text_formats import read_csv

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    p = str(tmp_path / "vec_rt")
    write_result(emb, p, fmt="csv")
    back = read_csv(
        spark, p, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    want = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    got = {r["vec_id"]: r["embedding"] for r in back.collect()}
    assert got == want


def test_csv_reader_failfast_on_corrupt_row(spark, tmp_path):
    """A row that doesn't parse under the enforced schema must FAIL the
    job (FAILFAST), not become silent nulls."""
    from py4j.protocol import Py4JJavaError

    from vector_database_in_rust_spark.sources.text_formats import read_csv

    d = tmp_path / "bad_csv"
    d.mkdir()
    (d / "part.csv").write_text("a,b\n1,x\n")  # 'x' not an INT
    with pytest.raises(Py4JJavaError):
        read_csv(spark, str(d), "a INT, b INT").collect()
    # PERMISSIVE mode keeps the row with a null instead
    got = read_csv(spark, str(d), "a INT, b INT", mode="PERMISSIVE").collect()
    assert got[0]["a"] == 1 and got[0]["b"] is None


def test_json_reader_failfast_on_malformed_line(spark, tmp_path):
    from py4j.protocol import Py4JJavaError

    from vector_database_in_rust_spark.sources.text_formats import read_json

    d = tmp_path / "bad_json"
    d.mkdir()
    (d / "part.json").write_text('{"a": 1}\n{not json}\n')
    with pytest.raises(Py4JJavaError):
        read_json(spark, str(d), "a INT").collect()


def test_json_reader_schema_not_inferred(spark, tmp_path):
    """The enforced schema wins over what inference would guess: ints
    stay ints, absent fields surface as typed nulls."""
    from vector_database_in_rust_spark.sources.text_formats import read_json

    d = tmp_path / "typed_json"
    d.mkdir()
    (d / "part.json").write_text('{"a": 1, "b": "x"}\n{"a": 2}\n')
    back = read_json(spark, str(d), "a BIGINT, b STRING")
    assert back.schema.simpleString() == "struct<a:bigint,b:string>"
    rows = sorted((r["a"], r["b"]) for r in back.collect())
    assert rows == [(1, "x"), (2, None)]


def test_json_quarantine_lane_counts(spark, tmp_path):
    """Good rows parse through; each malformed line lands in quarantine
    with its raw text preserved."""
    from vector_database_in_rust_spark.sources.text_formats import (
        read_json_quarantine,
    )

    p = tmp_path / "in"
    p.mkdir()
    (p / "good.json").write_text(
        '{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n'
    )
    (p / "bad.json").write_text(
        'not json\n{"a": "NaN-ish", "b": 3}\n'
    )
    good, bad = read_json_quarantine(spark, str(p), "a BIGINT, b STRING")
    assert sorted(r["a"] for r in good.collect()) == [1, 2]
    raws = {r["raw_record"] for r in bad.collect()}
    assert len(raws) == 2 and any("not json" in r for r in raws)


def test_orc_roundtrip_lossless(spark, tmp_path):
    from vector_database_in_rust_spark.sources.sinks import (
        read_result,
        write_result,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "k BIGINT, s STRING, v DOUBLE"
    )
    path = str(tmp_path / "orc")
    write_result(df, path, fmt="orc")
    back = read_result(spark, path, fmt="orc")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_codec_choice_roundtrips_and_compresses(spark, tmp_path):
    """Codec is a sink knob, not a semantics knob: zstd and snappy
    roundtrip identically; zstd compresses the text corpus tighter
    (the 100 TB storage-bill knob — the data is unchanged, only the
    encoding)."""
    import pathlib

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    want = sorted(map(tuple, docs.collect()))
    sizes = {}
    for codec in ("snappy", "zstd"):
        d = tmp_path / codec
        docs.coalesce(1).write.option("compression", codec).parquet(str(d))
        back = spark.read.parquet(str(d))
        assert sorted(map(tuple, back.collect())) == want
        sizes[codec] = sum(
            p.stat().st_size for p in pathlib.Path(d).glob("*.parquet")
        )
    assert sizes["zstd"] < sizes["snappy"]


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appends with a new column must stay readable: mergeSchema
    unions the schemas, old files read the new column as NULL — the
    contract any long-lived 100 TB table relies on when a field is
    added mid-history."""
    v1 = spark.createDataFrame([(1, "a")], "id long, text string")
    v2 = spark.createDataFrame(
        [(2, "b", "en")], "id long, text string, lang string"
    )
    v1.write.parquet(f"{tmp_path}/t/batch=1")
    v2.write.parquet(f"{tmp_path}/t/batch=2")
    got = {
        r["id"]: (r["text"], r["lang"])
        for r in spark.read.option("mergeSchema", "true")
        .parquet(f"{tmp_path}/t")
        .collect()
    }
    assert got == {1: ("a", None), 2: ("b", "en")}
    # without mergeSchema the read must still succeed on the pinned
    # schema of one file set (no crash — pruned to the common subset)
    plain = spark.read.parquet(f"{tmp_path}/t")
    assert plain.count() == 2
