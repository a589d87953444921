"""Round-15 A/B: minhash_lsh_pairs with persisted intermediates (current)
vs eager localCheckpoint truncation of the analyzed plan (guide §3.3 —
the warm lane's wall is dominated by one 12.5 s driver-side planning gap
on this box, measured by scripts/r15_jobtrace.py).

Both variants compute identical rows (asserted). Usage:
    python scripts/r15_minhash_ab.py [repeats]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators import dedup as D
from vector_database_in_rust_spark.session import get_spark


def variant_checkpoint(docs, *, threshold=0.5, n=3, num_perm=64,
                       num_bands=16, seed=42, max_shingle_freq=10_000,
                       max_band_bucket=500, known_count=None):
    """minhash_lsh_pairs with sh/banded as EAGER localCheckpoints."""
    from pyspark.sql import Window

    rows_per_band = num_perm // num_bands
    n_docs = D._router_count(docs, known_count)
    sh, _pre = D._minhash_retained_index(
        docs, "doc_id", "text", n, max_shingle_freq, n_docs, hashed=False
    )
    sh = sh.localCheckpoint(eager=True)
    h32 = F.xxhash64("shingle").bitwiseAND(F.lit((1 << 32) - 1))
    params = D.minhash_permutation_params(num_perm, seed)
    sigs = (
        sh.select("doc_id", h32.alias("h"))
        .groupBy("doc_id")
        .agg(*[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(D.MINHASH_PRIME)).alias(f"s{i}")
            for i, (a, b) in enumerate(params)
        ])
    )
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(*[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("band_hash"),
        )
        for b in range(num_bands)
    ])
    banded = sigs.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"),
    )
    if max_band_bucket is not None and (n_docs is None or n_docs > max_band_bucket):
        w_bucket = Window.partitionBy("band_id", "band_hash")
        banded = (
            banded.withColumn("_bn", F.count(F.lit(1)).over(w_bucket))
            .filter(F.col("_bn") <= max_band_bucket)
            .drop("_bn")
        )
    banded = banded.localCheckpoint(eager=True)
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    result = D._verify_candidate_pairs(sh, candidates, threshold, corpus_rows=n_docs)
    result = result.localCheckpoint(eager=True)
    for c in _pre:
        c.unpersist()
    return result


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r15-minhash-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    def run(fn, label):
        times = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(docs, known_count=n_docs)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
        print(f"{label}: {times} min={min(times)}")
        return df

    # interleave to share box state
    a1 = run(lambda d, **kw: D.minhash_lsh_pairs(d, threshold=0.5, **kw), "persist   #1")
    b1 = run(variant_checkpoint, "checkpoint#1")
    run(lambda d, **kw: D.minhash_lsh_pairs(d, threshold=0.5, **kw), "persist   #2")
    run(variant_checkpoint, "checkpoint#2")
    rows_a = sorted(tuple(r) for r in a1.collect())
    rows_b = sorted(tuple(r) for r in b1.collect())
    print("identical:", rows_a == rows_b, f"({len(rows_a)} pairs)")
    spark.stop()


if __name__ == "__main__":
    main()
