"""Sharding + sequence-packing semantics: the distributed packer must
equal a driver-side greedy reference, and every bin must respect the
context length (except documented single-doc overflows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.packing import (
    pack_sequences,
    shard_assignments,
    shard_manifest,
)
from tests.conftest import SF_SMOKE

CONTEXT = 512
SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()
    df.count()
    return df


def test_shard_assignment_deterministic_and_total(spark, docs):
    a = {(r["doc_id"], r["shard"]) for r in shard_assignments(docs, num_shards=SHARDS).collect()}
    b = {
        (r["doc_id"], r["shard"])
        for r in shard_assignments(docs.repartition(7), num_shards=SHARDS).collect()
    }
    assert a == b
    assert len(a) == docs.count()
    assert {s for _, s in a} <= set(range(SHARDS))


def test_manifest_totals(spark, docs):
    m = shard_manifest(docs, num_shards=SHARDS).collect()
    assert sum(r["n_docs"] for r in m) == docs.count()
    want_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).first()["t"]
    assert sum(r["total_tokens"] for r in m) == want_tokens


def _greedy_reference(rows, context_len):
    """Driver-side greedy first-fit, same contract as pack_sequences."""
    out = {}
    by_shard = {}
    for doc_id, shard, n in rows:
        by_shard.setdefault(shard, []).append((doc_id, n))
    for shard, docs_ in by_shard.items():
        base = shard << 40
        ordinal, fill = 0, 0
        for doc_id, n in sorted(docs_):
            if fill > 0 and fill + n > context_len:
                ordinal += 1
                fill = 0
            overflow = n > context_len
            out[doc_id] = (shard, base + ordinal, n, overflow)
            fill += n
            if overflow:
                ordinal += 1
                fill = 0
    return out


def test_pack_equals_greedy_reference(spark, docs):
    assigned = [
        (r["doc_id"], r["shard"], r["n_tokens"])
        for r in shard_assignments(docs, num_shards=SHARDS).collect()
    ]
    want = _greedy_reference(assigned, CONTEXT)
    got = {
        r["doc_id"]: (r["shard"], r["bin_id"], r["n_tokens"], r["overflow"])
        for r in pack_sequences(
            docs, context_len=CONTEXT, num_shards=SHARDS
        ).collect()
    }
    assert got == want


def test_pack_bin_invariants(spark, docs):
    packed = pack_sequences(docs, context_len=CONTEXT, num_shards=SHARDS).collect()
    assert len(packed) == docs.count(), "every doc packed exactly once"
    fills = {}
    for r in packed:
        fills.setdefault(r["bin_id"], []).append((r["n_tokens"], r["overflow"]))
    for bin_id, members in fills.items():
        total = sum(n for n, _ in members)
        if any(o for _, o in members):
            assert len(members) == 1, "an overflow doc must sit alone in its bin"
        else:
            assert total <= CONTEXT, f"bin {bin_id} overfilled: {total}"


def test_pack_rejects_bad_context():
    with pytest.raises(ValueError, match="context_len"):
        pack_sequences(None, context_len=0)


def test_chunk_reconstruction_and_overlap(spark):
    """Chunk invariants: consecutive chunks overlap by exactly
    chunk_size - stride tokens; concatenating each chunk's first
    `stride` tokens (plus the final tail) reconstructs the document;
    short docs yield exactly one whole-text chunk."""
    from vector_database_in_rust_spark.operators.packing import chunk_documents

    long_text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, long_text), (2, "tiny doc only five tokens")],
        "doc_id BIGINT, text STRING",
    )
    out = chunk_documents(docs, chunk_size=32, stride=24)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in out.collect())
    )
    by_doc: dict[int, list[str]] = {}
    for d, _, c in rows:
        by_doc.setdefault(d, []).append(c)

    # doc 2: one chunk, the whole text
    assert by_doc[2] == ["tiny doc only five tokens"]

    # doc 1: overlap of 8 tokens between consecutive chunks
    chunks = [c.split(" ") for c in by_doc[1]]
    assert len(chunks) == 5  # starts 0,24,48,72,96 for n=100
    for a, b in zip(chunks, chunks[1:]):
        assert a[24:] == b[: len(a) - 24]
    # reconstruction: first `stride` tokens of each chunk + last tail
    rebuilt = []
    for c in chunks[:-1]:
        rebuilt.extend(c[:24])
    rebuilt.extend(chunks[-1])
    assert rebuilt == long_text.split(" ")


def test_chunk_plan_no_shuffle(spark):
    """Chunking must stay a per-row flatMap: zero exchanges."""
    from vector_database_in_rust_spark.operators.packing import chunk_documents
    from vector_database_in_rust_spark.plans.explain import audit
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = audit(chunk_documents(docs))
    assert a.n_shuffle_exchanges == 0
