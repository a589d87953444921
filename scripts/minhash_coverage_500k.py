"""Measured chain-edge coverage ladder for ``minhash_clusters`` at 500k.

The clique contract guarantees CONTAINMENT by construction (every
chain edge is an exact J>=t pair the pair route would also verify);
what the per-doc edge budget trades is RECALL — a doc keeps edges
from only its ``max_doc_star_edges`` most selective band buckets.
The verdict lane pins a coverage floor at driver scale (sf0.01); this
script measures it at 500k — the largest decade where the exact pair
route still completes on one box (444.6 s, SCALE.md round 10) —
across the budget ladder (4 = default, 2 = the 5M operating point,
1 = the smallest), so the 5M completion row has a measured same-form
recall number beside it.

Metrics per budget (all Spark-side, O(1)-row outputs):
- containment violations: clusters straddling two pair-closure
  clusters, or merging a pair-route singleton (expected 0);
- merge recall: merges_clique / merges_pairs where merges = docs in
  size>=2 clusters minus cluster count (fraction of the pair
  closure's merges the chain form realizes);
- pairwise recall: sum C(size,2) over clique clusters / same over
  pair-closure clusters.

Usage: python scripts/minhash_coverage_500k.py [n_docs] [b1,b2,...]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F

from vector_database_in_rust_spark.operators import dedup
from vector_database_in_rust_spark.sources.synthetic import generate_documents


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    budgets = (
        [int(b) for b in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [4, 2, 1]
    )
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("minhash-coverage")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "80g"))
        .config("spark.sql.shuffle.partitions", os.environ.get("SCALING_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # Same corpus family and staging as scripts/scaling_study.py.
    path = f"{REPO}/spark-warehouse/scaling/docs_v2_{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_documents(spark, n, num_partitions=32).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    docs.count()

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(docs, known_count=n)
    p_clusters = dedup.dedup_clusters(pairs, on_nonconverge="raise").persist()
    p_stats = p_clusters.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).first()
    t_pairs = time.time() - t0
    merges_p = p_stats["docs"] - p_stats["clusters"]
    pw_p = (
        p_clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("s"))
        .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("pw"))
        .first()["pw"]
    )
    print(
        f"n={n} pair route: {t_pairs:.1f}s, clusters={p_stats['clusters']}, "
        f"merges={merges_p}, pairwise={pw_p}",
        flush=True,
    )

    for budget in budgets:
        t0 = time.time()
        c_clusters = dedup.minhash_clusters(
            docs, known_count=n, max_doc_star_edges=budget
        ).persist()
        c_stats = c_clusters.filter(F.col("cluster_size") >= 2).agg(
            F.count(F.lit(1)).alias("docs"),
            F.countDistinct("cluster_id").alias("clusters"),
        ).first()
        t_clique = time.time() - t0
        merges_c = (c_stats["docs"] or 0) - (c_stats["clusters"] or 0)

        # Containment: a clique cluster (size>=2) must sit inside ONE
        # pair-closure cluster and contain NO pair-route singleton.
        violations = (
            c_clusters.filter(F.col("cluster_size") >= 2)
            .join(
                p_clusters.select(
                    "doc_id", F.col("cluster_id").alias("p_cid")
                ),
                "doc_id",
                "left",
            )
            .groupBy("cluster_id")
            .agg(
                F.countDistinct("p_cid").alias("n_p"),
                F.sum(
                    F.when(F.col("p_cid").isNull(), 1).otherwise(0)
                ).alias("orphans"),
            )
            .filter((F.col("n_p") > 1) | (F.col("orphans") > 0))
            .count()
        )
        pw_c = (
            c_clusters.filter(F.col("cluster_size") >= 2)
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("s"))
            .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("pw"))
            .first()["pw"]
        )
        print(
            f"budget={budget}: {t_clique:.1f}s, "
            f"clusters={c_stats['clusters']}, merges={merges_c}, "
            f"containment_violations={violations}, "
            f"merge_recall={merges_c / max(merges_p, 1):.4f}, "
            f"pairwise_recall={(pw_c or 0) / max(pw_p or 1, 1):.4f}",
            flush=True,
        )
        c_clusters.unpersist()

    p_clusters.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
