"""Measured chain-edge coverage for ``minhash_clusters`` at 500k.

The clique contract guarantees CONTAINMENT by construction (every
chain edge is an exact J>=t pair the pair route would also verify);
what it trades is RECALL — a bucket member can lose its witnesses if
its Jaccard with bucket NEIGHBORS is under threshold. The verdict
lane pins a coverage floor at driver scale (sf0.01); this script
measures it at 500k — the largest decade where the exact pair route
still completes on one box (444.6 s, SCALE.md round 10) — at the 5M
operating point (budget-2 chain form), so the 5M completion row has a
measured same-form recall number beside it.

Metrics (all Spark-side, O(1)-row outputs):
- containment violations: clusters straddling two pair-closure
  clusters, or merging a pair-route singleton (expected 0);
- merge recall: (n - #clusters_clique) / (n - #clusters_pairs) —
  the fraction of the pair closure's merges the chain form realizes;
- pairwise recall: sum C(size,2) over clique clusters / same over
  pair-closure clusters.

Usage: python scripts/minhash_coverage_500k.py [n_docs] [edge_budget]
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
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("minhash-coverage")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "80g"))
        .config("spark.sql.shuffle.partitions", os.environ.get("SCALING_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/tmp"))
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
    p_clusters = dedup.dedup_clusters(
        pairs, on_nonconverge="raise"
    ).persist()
    p_stats = p_clusters.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).first()
    t_pairs = time.time() - t0
    merges_p = p_stats["docs"] - p_stats["clusters"]

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
    joined = (
        c_clusters.filter(F.col("cluster_size") >= 2)
        .join(
            p_clusters.select("doc_id", F.col("cluster_id").alias("p_cid")),
            "doc_id",
            "left",
        )
        .groupBy("cluster_id")
        .agg(
            F.countDistinct("p_cid").alias("n_p"),
            F.sum(F.when(F.col("p_cid").isNull(), 1).otherwise(0)).alias(
                "orphans"
            ),
        )
    )
    violations = joined.filter(
        (F.col("n_p") > 1) | (F.col("orphans") > 0)
    ).count()

    # Pairwise recall: sum C(size,2) per route.
    pw_p = (
        p_clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("s"))
        .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("pw"))
        .first()["pw"]
    )
    pw_c = (
        c_clusters.filter(F.col("cluster_size") >= 2)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("s"))
        .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("pw"))
        .first()["pw"]
    )

    print(
        f"n={n} budget={budget}\n"
        f"pair route: {t_pairs:.1f}s, clusters={p_stats['clusters']}, "
        f"merges={merges_p}\n"
        f"chain form: {t_clique:.1f}s, clusters={c_stats['clusters']}, "
        f"merges={merges_c}\n"
        f"containment violations: {violations}\n"
        f"merge recall: {merges_c / max(merges_p, 1):.4f}\n"
        f"pairwise recall: {(pw_c or 0) / max(pw_p or 0, 1):.4f}"
    )
    p_clusters.unpersist()
    c_clusters.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
