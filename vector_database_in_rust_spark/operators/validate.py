"""Schema/dimension validation operators.

Reference parity: ``add_vector`` rejects any vector whose length differs
from the store's declared dimension (``src/lib.rs:62-72``), and
``MmapVectorStore::open`` rejects ragged files (``src/disk_store.rs:22-27``).
In a declarative engine the same contract is a predicate over
``size(embedding)`` — evaluated JVM-side during the scan, so validation of
100 TB is one pushdown-friendly pass, not a per-insert code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_ok(vec_col: str, dimensions: int):
    c = F.col(vec_col)
    return c.isNotNull() & (F.size(c) == dimensions)


def validate_dims(
    df: DataFrame, dimensions: int, *, vec_col: str = "embedding"
) -> DataFrame:
    """One-row summary: total rows, valid rows, invalid rows."""
    ok = dim_ok(vec_col, dimensions)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(ok.cast("long")).alias("n_valid"),
        F.sum((~ok).cast("long")).alias("n_invalid"),
    )


def add_vectors(store: DataFrame, new: DataFrame, dimensions: int) -> DataFrame:
    """Append semantics of ``VectorStore::add_vector`` (src/lib.rs:62-72):
    union new vectors onto the store, failing if any new vector has the
    wrong dimension (strict, like the reference's Err).

    The check is EAGER (one count over the invalid predicate) because a
    lazy in-plan ``raise_error`` guard is unreliable: Catalyst prunes it
    whenever the downstream query never evaluates the embedding column
    (e.g. ``count()``). One extra validation scan of the *new* rows is the
    honest price of the contract — new batches are small relative to the
    store, and the scan reads a single column.
    """
    n_bad = new.filter(~dim_ok("embedding", dimensions)).count()
    if n_bad:
        raise ValueError(
            f"dimension mismatch: {n_bad} new vector(s) do not have the "
            f"declared dimension {dimensions}"
        )
    return store.unionByName(new, allowMissingColumns=True)


def upsert_vectors(
    store: DataFrame,
    updates: DataFrame,
    dimensions: int,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """MERGE semantics the reference cannot express at all (its store is
    append-only, src/lib.rs:62-72): rows whose id appears in ``updates``
    are REPLACED, new ids are appended. Same eager dimension check as
    ``add_vectors``.

    Shape: ``store LEFT ANTI updates`` (drops superseded rows) unioned
    with the updates. Scale: the anti-join shuffles on the id — or
    broadcasts when the update batch is small (the common case, and
    what AQE picks automatically); either way the store is scanned
    once. On real deployments this is the logical plan a table format
    (Delta/Iceberg MERGE) executes under the hood — here it is the
    plain-parquet equivalent, written back via overwrite.
    """
    n_bad = updates.filter(~dim_ok("embedding", dimensions)).count()
    if n_bad:
        raise ValueError(
            f"dimension mismatch: {n_bad} update vector(s) do not have "
            f"the declared dimension {dimensions}"
        )
    survivors = store.join(updates.select(id_col), on=id_col, how="left_anti")
    return survivors.unionByName(updates, allowMissingColumns=True)


def delete_vectors(
    store: DataFrame, ids: DataFrame, *, id_col: str = "vec_id"
) -> DataFrame:
    """Anti-join delete (also absent in the append-only reference):
    remove every row whose id appears in ``ids``. One store scan, id
    shuffle or broadcast — the plain-parquet form of a format-level
    DELETE."""
    return store.join(ids.select(id_col), on=id_col, how="left_anti")
