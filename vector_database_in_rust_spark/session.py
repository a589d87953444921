"""SparkSession construction for tests and benchmarks.

The correctness driver supplies its own SparkSession to
``__spark_entry__``; this builder is used by pytest and ``bench.py`` only.

Scale notes: configs below are chosen so the same code runs unchanged on a
real cluster — AQE handles runtime re-planning (partition coalescing, skew
joins), Arrow makes any pandas_udf exchange columnar, and shuffle
partitions default to the local core count (on a cluster you'd size this
to ~2-3x total cores or rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector-db-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    cpus: int | str | None = None,
) -> SparkSession:
    """``cpus`` overrides the ``$SPARK_GRAFT_CPUS`` master core count.
    bench.py NEVER passes it (the driver contract: the bench must honor
    the env so the driver's low-core scaling run measures real scaling);
    the test conftest passes a cap — see tests/conftest.py for the
    measured rationale."""
    cpus = str(cpus) if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # AQE's RUNTIME broadcast conversions compare COMPRESSED
        # shuffle bytes, and narrow repetitive rows compress ~20x — at
        # 64 MB a "small" side can deserialize to >1 GiB of
        # driver-collected task results (measured: duplicated_span_stats
        # at 500k docs aborted on spark.driver.maxResultSize). 8 MB
        # bounds that worst case ~8x lower for every lane; explicit
        # F.broadcast pins and the static 64 MB planner threshold are
        # unaffected, and bench-scale plans measured neutral.
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(8 * 1024 * 1024),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
