"""Full driver-flow dress rehearsal: what the grading driver does each
round, runnable locally before committing.

1. fresh import of __spark_entry__;
2. entry(spark) smoke (rows > 0, stable schema);
3. every queries()[name] at sf0.01, compared to oracle_sql()[name] via
   DuckDB (row count + column names + order-insensitive values);
4. rows-only queries executed for shape;
prints one summary line per query and a final PASS/FAIL.

Usage: python scripts/rehearsal.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def frames_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            for u, v in zip(x.astype(float), y.astype(float)):
                if not (
                    (math.isnan(u) and math.isnan(v))
                    or math.isclose(u, v, rel_tol=0, abs_tol=1e-9)
                ):
                    return False
        elif (x.astype(str) != y.astype(str)).any():
            return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(sf_dir):
        print(f"error: sf_dir {sf_dir!r} does not exist", file=sys.stderr)
        return 2
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    rows = E.entry(spark).collect()
    print(f"entry: {len(rows)} rows, first={rows[0] if rows else None}")
    if not rows:
        failures.append("entry")

    qs, oracles = E.queries(), E.oracle_sql()
    for name in sorted(qs):
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                want = con.sql(oracles[name]).df()
                ok = frames_match(canon(got), canon(want))
                status = "MATCH" if ok else "MISMATCH"
                if not ok:
                    failures.append(name)
            else:
                status = "rows-only"
            print(f"{name}: {len(got)} rows [{status}]")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:120]}")

    print(
        f"\n{len(qs)} queries ({len(oracles)} oracle-backed) — "
        + ("PASS" if not failures else f"FAIL: {failures}")
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
