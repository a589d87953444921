"""Diagnose the 5M minhash_clusters ENOSPC: measure the PREAMBLE only
(shingle index -> hot cut -> hash -> persist -> count), print the
optimized plan of the hot-cut join, and sample disk usage while it
runs. Usage: python scripts/probe_5m_preamble.py [n_docs]
"""
import os
import shutil
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F

from vector_database_in_rust_spark.operators.dedup import (
    DEFAULT_MAX_SHINGLE_FREQ,
    _shingle_index,
)
from vector_database_in_rust_spark.sources.synthetic import generate_documents


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-preamble")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "80g"))
        .config("spark.sql.shuffle.partitions", os.environ.get("SCALING_SHUFFLE_PARTITIONS", "256"))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    peak = {"used": 0}
    stop = threading.Event()

    def watch():
        while not stop.is_set():
            u = shutil.disk_usage("/tmp")
            used = u.used // (1 << 30)
            if used > peak["used"]:
                peak["used"] = used
            time.sleep(5)

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    base = shutil.disk_usage("/tmp").used // (1 << 30)
    print(f"baseline disk used: {base} GiB", flush=True)

    path = f"{REPO}/spark-warehouse/scaling/docs_v2_{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_documents(spark, n, num_partitions=32).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)

    sh = _shingle_index(docs, "doc_id", "text", 3)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") > DEFAULT_MAX_SHINGLE_FREQ)
        .select("shingle")
    )
    cut = sh.join(hot, "shingle", "left_anti")
    hashed = cut.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    print("=== optimized plan of the hot-cut preamble ===", flush=True)
    print(
        hashed._jdf.queryExecution().optimizedPlan().treeString()[:4000],
        flush=True,
    )
    t0 = time.time()
    hashed = hashed.persist()
    kept = hashed.count()
    t1 = time.time() - t0
    print(f"preamble: {t1:.1f}s, kept rows={kept}", flush=True)
    print("=== executed plan (joins as run) ===", flush=True)
    print(hashed._jdf.queryExecution().executedPlan().treeString()[:4000], flush=True)
    n_hot = hot.count()
    print(f"hot shingles (> {DEFAULT_MAX_SHINGLE_FREQ} docs): {n_hot}", flush=True)
    stop.set()
    print(
        f"peak disk used: {peak['used']} GiB (delta {peak['used'] - base} GiB)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
