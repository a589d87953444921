"""SQL-first interface: the same engine surface through ``spark.sql``.

Everything the DataFrame operators express is also reachable as ANSI-ish
Spark SQL over registered views — the distance expressions are plain SQL
higher-order functions (``aggregate``/``zip_with``), so a SQL-only user
of the engine gets identical plans (Catalyst compiles both paths to the
same physical operators; the parity harness proves result equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vector_database_in_rust_spark.schemas import TABLE_NAMES
from vector_database_in_rust_spark.sources.tables import load_table

# Reusable SQL fragment: squared L2 between two ARRAY<FLOAT> columns,
# computed in DOUBLE (mirrors functions/vectors.l2_squared).
SQL_L2SQ = (
    "aggregate(zip_with(cast({a} as array<double>), cast({b} as array<double>),"
    " (x, y) -> (x - y) * (x - y)), cast(0.0 as double), (acc, v) -> acc + v)"
)


def register_views(spark: SparkSession, sf_dir: str, *, prefix: str = "") -> None:
    """Register every harness table as a temp view (idempotent)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{prefix}{name}")


def sql_knn(spark: SparkSession, sf_dir: str, query_vec: list[float], k: int = 5) -> DataFrame:
    """Exact k-NN authored entirely in SQL — compiles to the same
    TakeOrderedAndProject plan as the DataFrame form."""
    register_views(spark, sf_dir)
    vec_sql = "array(" + ", ".join(f"cast({float(x)} as float)" for x in query_vec) + ")"
    return spark.sql(
        f"""
        SELECT vec_id,
               round({SQL_L2SQ.format(a='embedding', b=vec_sql)}, 4) AS dist
        FROM embeddings
        ORDER BY dist, vec_id
        LIMIT {int(k)}
        """
    )


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Ad-hoc SQL entry point over the registered engine views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
