"""PySpark-native vector analytics engine.

A from-scratch re-expression of the capabilities of the reference
``apaul02/Vector-Database-in-Rust`` ("CoreVec": mmap float32 vector store +
brute-force exact k-NN + HNSW ANN index + thin Python API), built Spark-first:

- Storage: partitioned Parquet with an ``embedding ARRAY<FLOAT>`` column
  (replaces the raw-binary mmap store, reference ``disk_store.rs:14-52``).
- Exact k-NN: declarative ``orderBy(dist).limit(k)`` so Catalyst picks
  ``TakeOrderedAndProject`` — the distributed form of the reference's
  bounded-heap scan (``src/lib.rs:74-97``).
- ANN: IVF coarse quantization (KMeans cells + nprobe partition-pruned
  probe) replaces the sequential, order-dependent HNSW graph build
  (``src/lib.rs:126-302``), which does not parallelize.
- Beyond reference parity: LLM-data-pipeline operators — dedup (exact,
  n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine), text analysis,
  multimodal column plumbing — all designed for 100 TB scale.

Everything is stock PySpark DataFrame API; no RDDs, no custom Catalyst
rules. Python UDFs appear only where Catalyst genuinely cannot express the
semantics, and then always Arrow-batched (pandas_udf / mapInPandas).
"""

from vector_database_in_rust_spark.engine import VectorEngine
from vector_database_in_rust_spark.session import get_spark

__all__ = ["VectorEngine", "get_spark"]
__version__ = "0.1.0"
