"""Distributed linear algebra for model fitting: the normal equations
(Gram matrix XᵀX and moment vector Xᵀy) as ONE map-side-combinable
aggregation, plus the driver-side ridge solve.

This is the standard split for fitting linear probes / quality
regressors / calibration heads over a 100 TB feature table: the ONLY
corpus-sized work is computing d(d+1)/2 + d sums — embarrassingly
map-side-combinable, one shuffle of (i, j) keyed partials — and the
d×d solve is a microsecond of driver numpy. (MLlib's own linear
regression normal-equation solver does exactly this split.)

The distributed half is hash-checked against SQL (exact index
arithmetic, rounded sums); the solve is pinned by a weight-recovery
test on synthetic y = Xw* + noise.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Normal-equation sufficient statistics as rows:

    - ``(i, j, value)`` with ``i, j >= 0`` — XᵀX entries (full matrix);
    - ``(i, -1, value)`` — Xᵀy entries;
    - ``(-1, -1, n)`` — the row count.

    Sums are rounded to ``round_digits`` so partition-order float
    non-associativity cannot flip a value hash (the repo's determinism
    contract; at these magnitudes the accumulated error is ~1e-13,
    far inside the rounding).

    Scale: the double posexplode fans each row into d² (i, j, xᵢ·xⱼ)
    terms that partially aggregate MAP-SIDE before one (i, j)-keyed
    exchange of at most d² rows per partition — the corpus itself
    never shuffles. For very large d, switch to per-partition numpy
    BLAS partials via mapInPandas (same output contract); the exact
    expression form is kept here for oracle portability.
    """
    e = df.select(
        F.col(vec_col).cast("array<double>").alias("x"),
        F.col(label_col).cast("double").alias("y"),
    )
    xi = e.select("x", "y", F.posexplode("x").alias("i", "xi"))
    xtx = (
        xi.select("i", "xi", F.posexplode("x").alias("j", "xj"))
        .groupBy("i", "j")
        .agg(F.round(F.sum(F.col("xi") * F.col("xj")), round_digits).alias("value"))
    )
    xty = (
        xi.groupBy("i")
        .agg(F.round(F.sum(F.col("xi") * F.col("y")), round_digits).alias("value"))
        .select("i", F.lit(-1).alias("j"), "value")
    )
    n = e.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
        F.lit(-1).alias("i"), F.lit(-1).alias("j"), "value"
    )
    return xtx.select("i", "j", "value").unionByName(xty).unionByName(n)


def ridge_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    reg: float = 1e-3,
) -> np.ndarray:
    """Ridge regression weights from the distributed sufficient
    statistics: solve ``(XᵀX + reg·n·I) w = Xᵀy`` on the driver. The
    collect is d² + d + 1 rows — index-sized, never corpus-sized."""
    rows = gram_matrix(
        df, vec_col=vec_col, label_col=label_col, round_digits=9
    ).collect()
    d = max(r["i"] for r in rows) + 1
    a = np.zeros((d, d))
    b = np.zeros(d)
    n = 1.0
    for r in rows:
        if r["i"] < 0:
            n = r["value"]
        elif r["j"] < 0:
            b[r["i"]] = r["value"]
        else:
            a[r["i"], r["j"]] = r["value"]
    return np.linalg.solve(a + reg * n * np.eye(d), b)
