"""Z-order layout: the interleave must be an exact invertible Morton
code, and the layout must deliver its pruning contract MEASURABLY —
after range-partitioning on z, every partition's min/max spread shrinks
on BOTH dimensions (that spread is exactly the file-statistics window a
scan pruner consults)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_database_in_rust_spark.functions.zorder import (
    quantize,
    z_value_2d,
    zorder_layout,
)
from tests.conftest import SF_ORACLE


def _morton_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i + 1)
        z += ((y >> i) & 1) << (2 * i)
    return z


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=32,
    )
)
def test_z_value_matches_reference_morton(spark, pairs):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)], "i long, x long, y long"
    )
    got = {
        r["i"]: r["z"]
        for r in df.select("i", z_value_2d(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for i, (x, y) in enumerate(pairs):
        assert got[i] == _morton_py(x, y)


def test_z_value_is_injective_over_the_grid(spark):
    """Distinct (x, y) -> distinct z (the code is a bijection onto
    [0, 2^16) for 8-bit inputs); spot-check the full 64x64 subgrid."""
    rows = [(x, y) for x in range(0, 256, 4) for y in range(0, 256, 4)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(z_value_2d(F.col("x"), F.col("y")).alias("z"))
    assert out.distinct().count() == len(rows)


def test_quantize_clamps_and_is_monotone(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (511.9,), (1023.9,), (1024.0,), (9999.0,)], "v double"
    )
    got = [r["q"] for r in df.select(quantize(F.col("v"), 0.0, 1024.0).alias("q")).collect()]
    assert got == [0, 0, 127, 255, 255, 255]
    assert got == sorted(got)


def test_zorder_layout_tightens_both_dims(spark):
    """The pruning contract, measured: after zorder_layout, the AVERAGE
    per-partition (max - min) window shrinks well below the global
    window on BOTH dimensions. A value-sorted layout serves only value:
    its user_id windows stay ~global — which is exactly why z order
    exists."""
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select("value", "user_id")
    gv = ev.agg((F.max("value") - F.min("value")).alias("s")).first()["s"]
    gu = ev.agg((F.max("user_id") - F.min("user_id")).alias("s")).first()["s"]

    def spreads(df):
        p = df.withColumn("pid", F.spark_partition_id())
        agg = p.groupBy("pid").agg(
            (F.max("value") - F.min("value")).alias("sv"),
            (F.max("user_id") - F.min("user_id")).alias("su"),
        )
        r = agg.agg(F.avg("sv").alias("av"), F.avg("su").alias("au")).first()
        return r["av"], r["au"]

    # quantization ranges come from table stats at deploy time (the
    # operator's documented premise) — match them to this corpus so the
    # full 8-bit resolution is in play
    zdf = zorder_layout(
        ev,
        "value",
        "user_id",
        x_range=(0.0, float(gv) + 1.0),
        y_range=(0.0, float(gu) + 1.0),
        num_partitions=16,
    )
    zv, zu = spreads(zdf)
    # both dims tighten (each partition covers a bounded z interval,
    # i.e. a union of small rectangles in (value, user_id) space)
    assert zv < 0.55 * gv
    assert zu < 0.55 * gu

    lex = ev.repartitionByRange(16, "value").sortWithinPartitions("value")
    lv, lu = spreads(lex)
    assert lv < 0.2 * gv            # a 1-D sort nails its own column...
    assert lu > 0.9 * gu            # ...and leaves the other at ~global


def test_zorder_parquet_file_skipping(spark, tmp_path):
    """The pruning contract measured at the FILE level: write each
    layout as 16 parquet files and compute — from the files' actual
    parquet min/max statistics, exactly as any stats-based pruner
    does — how many files a 2-dim box predicate must read. The z
    layout lets the pruner skip most files; the id-ordered control
    can skip none (both dims look uniform inside every file)."""
    import pyarrow.parquet as pq

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "event_id", "value", "user_id"
    )
    zdf = zorder_layout(
        ev, "value", "user_id",
        x_range=(0.0, 512.0), y_range=(0.0, 150.0), num_partitions=16,
    )
    ctrl = ev.repartitionByRange(16, "event_id").sortWithinPartitions("event_id")

    def candidate_fraction(df, lo_v, hi_v, lo_u, hi_u, d):
        df.write.mode("overwrite").parquet(str(d))
        files = [p for p in d.iterdir() if p.suffix == ".parquet"]
        assert len(files) >= 8, f"need multiple files, got {len(files)}"
        kept = 0
        for f in files:
            md = pq.ParquetFile(str(f)).metadata
            mins, maxs = {}, {}
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(rg.num_columns):
                    col = rg.column(j)
                    st = col.statistics
                    name = col.path_in_schema
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
            if not (maxs["value"] < lo_v or mins["value"] > hi_v
                    or maxs["user_id"] < lo_u or mins["user_id"] > hi_u):
                kept += 1
        return kept / len(files)

    # a selective box: one 1/8 slice of each dimension
    zf = candidate_fraction(zdf, 64.0, 128.0, 20, 40, tmp_path / "z")
    cf = candidate_fraction(ctrl, 64.0, 128.0, 20, 40, tmp_path / "c")
    assert cf > 0.9          # id order: every file overlaps the box
    assert zf <= 0.5 * cf    # z order: the pruner skips at least half
