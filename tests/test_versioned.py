"""VersionedStore semantics: snapshot folding, tombstones, diff
classification, and the partition-pruning property that keeps old
snapshot reads from scanning newer commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_in_rust_spark.sources.versioned import VersionedStore


@pytest.fixture()
def store(spark, tmp_path):
    s = VersionedStore(spark, str(tmp_path / "store"), key_col="k")
    s.commit(spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING"))
    s.commit(spark.createDataFrame([(2, "B"), (3, "c")], "k BIGINT, v STRING"))
    s.commit(spark.createDataFrame([(1,)], "k BIGINT"), op="delete")
    return s


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_snapshots(store):
    assert store.versions() == [1, 2, 3]
    assert _rows(store.read(1)) == [(1, "a"), (2, "b")]
    assert _rows(store.read(2)) == [(1, "a"), (2, "B"), (3, "c")]
    assert _rows(store.read(3)) == [(2, "B"), (3, "c")]
    assert _rows(store.read()) == _rows(store.read(3))  # latest default


def test_diff_classification(store):
    got = {(r["k"], r["change"]) for r in store.diff(1, 3).collect()}
    assert got == {(1, "removed"), (2, "changed"), (3, "added")}
    # reverse direction flips added/removed
    rev = {(r["k"], r["change"]) for r in store.diff(3, 1).collect()}
    assert rev == {(1, "added"), (2, "changed"), (3, "removed")}


def test_commit_is_append_only(store, spark):
    """A new commit must not rewrite old version partitions: snapshot 1
    reads identically before and after more commits."""
    before = _rows(store.read(1))
    store.commit(
        spark.createDataFrame([(9, "z")], "k BIGINT, v STRING")
    )
    assert _rows(store.read(1)) == before
    assert (9, "z") in _rows(store.read())


def test_old_snapshot_prunes_newer_versions(store):
    """read(1) must push the version bound into the scan's partition
    filters — a time-travel read never scans future commits."""
    plan = store.read(1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_version" in plan


def test_delete_requires_key_only(spark, tmp_path):
    s = VersionedStore(spark, str(tmp_path / "s2"), key_col="k")
    s.commit(spark.createDataFrame([(1, "a")], "k BIGINT, v STRING"))
    with pytest.raises(ValueError):
        s.commit(spark.createDataFrame([(1, "a")], "k BIGINT, v STRING"), op="bad")


def test_compact_preserves_all_snapshots(store):
    cv = store.compact()
    assert cv == 4
    # latest unchanged by compaction; history intact
    assert _rows(store.read()) == [(2, "B"), (3, "c")]
    assert _rows(store.read(1)) == [(1, "a"), (2, "b")]
    assert _rows(store.read(2)) == [(1, "a"), (2, "B"), (3, "c")]
    # deleted key stays deleted at and after the compaction point
    assert all(r["k"] != 1 for r in store.read(cv).collect())
