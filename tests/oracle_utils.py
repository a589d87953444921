"""Local mirror of the driver's Spark-vs-DuckDB comparison, so oracle
mismatches are caught in pytest before the driver's per-round gate."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from vector_database_in_rust_spark.schemas import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # An in-memory DuckDB cannot spill without a temp_directory, so a
    # heavy oracle (search_mmr's k-level chained self-joins) competing
    # with the suite's Spark JVM for RAM dies with OutOfMemoryException
    # instead of spilling — one flaked run in the r13 end-state suite,
    # green in isolation. Give it a spill path; correctness unchanged.
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        # Dtype identity first: the driver value-hashes each side's
        # pandas repr, so an int64 Spark column against a float64
        # oracle column (e.g. DuckDB HUGEINT→float64 coercion, the
        # round-6 `events_ks_test` red row) hash-mismatches even when
        # every value is equal. The old mirror coerced both sides to
        # float before comparing and could never see this.
        int_g = pd.api.types.is_integer_dtype(g)
        int_w = pd.api.types.is_integer_dtype(w)
        float_g = pd.api.types.is_float_dtype(g)
        float_w = pd.api.types.is_float_dtype(w)
        assert not (int_g and float_w) and not (float_g and int_w), (
            f"col {c}: dtype class mismatch spark={g.dtype} oracle={w.dtype}"
            " — the driver hashes these differently even if values match"
            " (cast the oracle, e.g. HUGEINT sums to BIGINT)"
        )
        if float_g or float_w:
            # EXACT equality, not tolerance: the driver VALUE-HASHES
            # both sides, so a last-ulp difference the old 1e-9
            # tolerance absorbed would still flip a window row red.
            # Every declared query rounds its float outputs in-plan
            # precisely so both engines emit identical values — a
            # round-6 sweep confirmed all 187 oracle-backed queries are
            # bit-exact at sf0.01. A failure here means the query needs
            # (more) in-plan rounding, not a looser mirror.
            #
            # Remediation path for a Spark/DuckDB VERSION BUMP that
            # shifts last-ulp results: run the suite once with
            # SPARK_GRAFT_ORACLE_FLOAT_TOL=1e-9 to separate
            # rounding-drift failures (pass under tolerance -> the
            # query needs one more in-plan F.round / SQL round() digit
            # trimmed) from real divergences (fail under tolerance
            # too). The flag is triage-only: the driver's hash gate
            # stays exact, so never ship with it set.
            tol = float(os.environ.get("SPARK_GRAFT_ORACLE_FLOAT_TOL", "0"))
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                ok = (math.isnan(a) and math.isnan(b)) or a == b or (
                    tol > 0 and abs(a - b) <= tol
                )
                assert ok, f"col {c} row {i}: spark={a!r} oracle={b!r}"
        else:
            mism = (g.astype(str) != w.astype(str))
            assert not mism.any(), (
                f"col {c}: first mismatch row {mism.idxmax()}: "
                f"spark={g[mism.idxmax()]!r} oracle={w[mism.idxmax()]!r}"
            )
