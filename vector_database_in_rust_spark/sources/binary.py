"""Raw float32 binary vector file source (reference compat path).

The reference stores vectors as one C-contiguous float32 matrix in a raw
binary file (``generate_mock_data.py:13-18``) and memory-maps it
(``src/disk_store.rs:14-36``), with the row id equal to the row offset.
This source reads the same file format into the engine's canonical
``(vec_id BIGINT, embedding ARRAY<FLOAT>)`` DataFrame.

Scale design: ``binaryFile`` hands each file to one task, so a single
100 TB file would not parallelize — exactly like mmap on one node. For
scale the engine's native format is Parquet; this reader exists for
byte-level compatibility with reference-produced stores, and it splits a
multi-file directory across tasks. Decoding is Arrow-batched numpy
(``mapInPandas``), never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OUT_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>"


def read_raw_f32(
    spark: SparkSession, path: str, dimensions: int, id_base: int = 0
) -> DataFrame:
    """Read raw float32 row-major vector file(s) as (vec_id, embedding).

    Enforces the reference's ragged-file check: file size must be a
    multiple of ``dimensions * 4`` (``src/disk_store.rs:22-27``) — raises
    ``ValueError`` inside the task otherwise (ragged files also fail the
    driver-side offset pass below before any task runs).

    IDs are positional ACROSS files: files are ordered by path and each
    file's ids start at ``id_base`` + the cumulative row count of all
    preceding files — a multi-file directory therefore gets globally
    unique, deterministic ids, preserving the reference's id-is-offset
    semantics (``src/disk_store.rs:40-47``) as if the files were
    concatenated. The offset pass reads only file METADATA (path, size)
    on the driver — never content.
    """
    if dimensions <= 0:
        raise ValueError(f"dimensions must be positive, got {dimensions}")
    row_bytes = dimensions * 4

    files = spark.read.format("binaryFile").load(path)
    meta = sorted(
        (r["path"], int(r["length"])) for r in files.select("path", "length").collect()
    )
    offsets: dict[str, int] = {}
    cum = id_base
    for p, size in meta:
        if size % row_bytes != 0:
            raise ValueError(
                f"ragged file {p}: {size} bytes is not a multiple of "
                f"{row_bytes} (dim={dimensions} * 4)"
            )
        offsets[p] = cum
        cum += size // row_bytes

    def decode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                raw = row["content"]
                if len(raw) % row_bytes != 0:
                    raise ValueError(
                        f"ragged file {row['path']}: {len(raw)} bytes is not "
                        f"a multiple of {row_bytes} (dim={dimensions} * 4)"
                    )
                mat = np.frombuffer(raw, dtype=np.float32).reshape(-1, dimensions)
                base = offsets[row["path"]]
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(len(mat), dtype=np.int64) + base,
                        "embedding": list(mat),
                    }
                )

    return files.select("path", "content").mapInPandas(decode, schema=OUT_SCHEMA)


def write_raw_f32(df: DataFrame, path: str) -> None:
    """Sink back to the reference's raw binary format (single file,
    id-ordered — matches ``tofile`` in generate_mock_data.py:18).

    Driver-side collect by design: the raw format is a single
    non-splittable file, only usable at reference scale (~100k rows).
    """
    rows = df.select("vec_id", "embedding").orderBy("vec_id").collect()
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float32)
    mat.tofile(path)
