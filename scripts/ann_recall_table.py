"""Print the tracked ANN recall@10 table (markdown) for both corpora:
the driver's uniform embeddings (adversarial control) and the
structure-bearing synthetic corpus (planted clusters + MRL decay).

The measurement grid lives in
vector_database_in_rust_spark/operators/ann_eval.py and is enforced as
a regression gate by tests/test_ann_recall.py — this script only
formats it for the round notes.

Usage: python scripts/ann_recall_table.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_in_rust_spark.operators.ann_eval import (  # noqa: E402
    K,
    N_QUERIES,
    SEED,
    recall_grid,
    structured_embeddings,
)
from vector_database_in_rust_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    corpora = {
        f"uniform ({sf_dir})": spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        "structured (planted clusters + MRL decay, seed 7)": (
            structured_embeddings(spark)
        ),
    }
    for label, emb in corpora.items():
        n = emb.count()
        grid = recall_grid(emb)
        print(f"\nrecall@{K} vs knn_exact, {N_QUERIES} self-queries, n={n}, "
              f"corpus: {label}, seed={SEED}\n")
        print("| method | setting | recall@10 |")
        print("|---|---|---|")
        for (method, setting), r in grid.items():
            print(f"| {method} | {setting} | {r:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
