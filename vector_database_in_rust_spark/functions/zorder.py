"""Z-order (Morton) interleaving for multi-dimensional data layout.

The lakehouse clustering technique (Databricks Z-ORDER, Iceberg sort
orders): interleave the bits of two quantized dimensions so that sorting
by the single z-value co-locates rows that are close in BOTH dimensions.
Files/partitions written in z order get TIGHT min/max column statistics
on every participating dimension simultaneously — so predicate pruning
(row-group stats, partition zone maps) works for queries filtering on
either dimension or both, where a lexicographic sort only serves its
leading column.

Pure integer bit arithmetic end to end (shift/and/or) — deterministic,
engine-portable (the DuckDB oracle computes the identical expression),
and whole-stage-codegen friendly (no UDF, no Python).

Extension surface: the reference stores vectors flat with no layout
control (src/lib.rs:36-44); layout-for-pruning is what replaces "read
everything" at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int = 8) -> Column:
    """Clamp-quantize a numeric column into ``[0, 2**bits)`` over the
    fixed range ``[lo, hi)``. Bounds are explicit PARAMETERS (taken from
    table statistics at deploy time), not computed in-plan — a
    data-dependent min/max would cost an extra pass and make the layout
    nondeterministic under appends."""
    n = 1 << bits
    scaled = F.floor((col.cast("double") - F.lit(float(lo))) * F.lit(n / (hi - lo)))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(n - 1)).cast("long")


def z_value_2d(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton code of two pre-quantized integer columns: bit i of ``x``
    lands at position 2i+1, bit i of ``y`` at 2i. Disjoint target bits,
    so the interleave is a plain SUM of shifted masks — one codegen'd
    integer expression, no loop at runtime."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 8,
    num_partitions: int = 16,
    z_col: str = "z_value",
) -> DataFrame:
    """Re-layout ``df`` in z order over (``x_col``, ``y_col``): quantize
    both dimensions, compute the Morton code, range-partition on it and
    sort within partitions. Writing the result gives every file tight
    min/max stats on BOTH dimensions (the pruning contract; measured by
    the per-partition spread test rather than asserted abstractly).
    The Morton code is added as ``z_col``; to avoid silently clobbering
    caller data the name must not already exist in ``df``.

    Scale: one range shuffle on an 8-byte key — the same cost as any
    global sort-by-key; the z computation itself is map-side integer
    arithmetic. This is exactly what a nightly OPTIMIZE ZORDER BY job
    does, expressed as a plain DataFrame transform.
    """
    if z_col in df.columns:
        raise ValueError(
            f"zorder_layout output column {z_col!r} already exists in the "
            "input — pass a different z_col"
        )
    xq = quantize(F.col(x_col), *x_range, bits=bits)
    yq = quantize(F.col(y_col), *y_range, bits=bits)
    with_z = df.withColumn(z_col, z_value_2d(xq, yq, bits=bits))
    return with_z.repartitionByRange(num_partitions, z_col).sortWithinPartitions(
        z_col
    )
