"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``vector_database_in_rust_spark``; this file is a
thin adapter over its harness registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The engine package lives next to this file; make the import robust to
# the driver running with any working directory.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from vector_database_in_rust_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact k-NN over sf0.001 (SURVEY.md §7 M2).

    Exercises scan -> broadcast join -> native distance expr -> top-k
    (TakeOrderedAndProject). The self-query invariant (reference
    src/lib.rs:543-549) holds: the first row is the query vector itself at
    distance 0.0.
    """
    return harness.QUERIES["knn_exact"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(harness.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; approximate
    ops (ANN probes, MinHash/SimHash) are intentionally absent -> the
    driver's rows-only check, with recall bars enforced in tests/."""
    return dict(harness.ORACLES)
