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


def _moment_stats(df: DataFrame, *, vec_col: str) -> tuple[np.ndarray, np.ndarray, float]:
    """Collect (XᵀX, Σx, n) via per-partition numpy BLAS partials:
    each Arrow batch contributes one ``xᵀx`` matmul plus a column sum,
    emitted as a flattened (d² + d + 1)-value row and summed across
    tasks by ONE tiny aggregation — the corpus never shuffles and the
    exchange moves one short row per batch. This is the "for very
    large d, switch to numpy partials" production path the
    ``gram_matrix`` docstring reserves (gram_matrix itself keeps the
    exact-expression form because its output is the SQL-oracle-anchored
    query surface; this internal fit path has no oracle and takes the
    fast shape). Driver materializes d² + d + 1 doubles —
    index-sized, never corpus-sized."""
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            x = np.vstack(pdf["_x"].to_numpy())
            xtx = x.T @ x
            vals = np.concatenate(
                [xtx.ravel(), x.sum(axis=0), [float(len(x))]]
            )
            yield pd.DataFrame({"vals": [list(vals)]})

    src = df.select(F.col(vec_col).cast("array<double>").alias("_x"))
    summed = (
        src.mapInPandas(partials, schema="vals ARRAY<DOUBLE>")
        .select(F.posexplode("vals").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    flat = np.zeros(len(summed))
    for r in summed:
        flat[r["idx"]] = r["v"]
    d = int(round((-1 + np.sqrt(1 + 4 * (len(flat) - 1))) / 2))
    assert d * d + d + 1 == len(flat), (d, len(flat))
    xtx = flat[: d * d].reshape(d, d)
    s = flat[d * d : d * d + d]
    n = flat[-1]
    return xtx, s, n


def pca_whiten_model(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    rank_rtol: float = 1e-10,
) -> dict:
    """Fit a PCA-whitening transform over a distributed embedding
    column — the standard preprocessing for retrieval embeddings
    (whitening post-processing; e.g. Su et al. 2021, "Whitening
    Sentence Representations") and a prerequisite for OPQ-style
    quantizer training.

    Scale split (identical to :func:`ridge_fit`): the ONLY
    corpus-sized work is the d²-term covariance sufficient statistic —
    one map-side-combinable aggregation, the corpus never shuffles —
    and the eigendecomposition is d×d driver numpy (microseconds for
    embedding-sized d). Components with eigenvalue <=
    ``rank_rtol × max_eig`` are dropped (degenerate directions would
    otherwise blow up under 1/√λ), so the output dimensionality is
    the numerical rank of the covariance.

    Returns ``{"mean": (d,), "eigvals": (k,) descending,
    "whiten": (d, k)}`` with ``whiten = V · diag(1/√λ)`` — applying
    ``(x - mean) @ whiten`` yields components with identity
    covariance.
    """
    xtx, s, n = _moment_stats(df, vec_col=vec_col)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    eigvals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals, kind="stable")[::-1]
    eigvals, vecs = eigvals[order], vecs[:, order]
    keep = eigvals > max(eigvals[0], 0.0) * rank_rtol
    eigvals, vecs = eigvals[keep], vecs[:, keep]
    whiten = vecs @ np.diag(1.0 / np.sqrt(eigvals))
    return {"mean": mean, "eigvals": eigvals, "whiten": whiten}


def pca_whiten(
    df: DataFrame,
    model: dict,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply a fitted whitening transform: one BLAS
    ``(batch - mean) @ whiten`` per Arrow batch in ``mapInPandas`` —
    the established quadratic-work-in-BLAS discipline (SCALE.md). The
    (d, k) matrix rides in the task closure (a few KB at embedding
    dims — bounded by d², never by the corpus); per-row output is the
    k whitened components as ``array<double>``."""
    import pandas as pd

    mean = np.asarray(model["mean"], dtype=np.float64)
    w = np.asarray(model["whiten"], dtype=np.float64)

    def project(batches):
        for pdf in batches:
            x = np.vstack(pdf["_x"].to_numpy())
            z = (x - mean) @ w
            yield pd.DataFrame(
                {"_id": pdf["_id"].to_numpy(), "whitened": list(z)}
            )

    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_x"),
    )
    out = src.mapInPandas(project, schema="_id BIGINT, whitened ARRAY<DOUBLE>")
    return out.select(F.col("_id").alias(id_col), "whitened")


def pca_whiten_verdict(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mean_tol: float = 1e-6,
    cov_tol: float = 1e-4,
) -> DataFrame:
    """Single-row driver-hash-verifiable verdict for the (non-SQL) PCA
    whitening lane, in the ann-verdict-twin mold: fit on the corpus,
    whiten the corpus, then re-measure the WHITENED corpus's moment
    statistics with the same distributed aggregation and check the
    definition of whitening itself:

    - ``n_rows``: the transform is row-lossless (oracle predicts
      count(embeddings));
    - ``mean_zero_ok``: max |mean(whitened)| < mean_tol;
    - ``cov_identity_ok``: max |cov(whitened) − I| < cov_tol — the
      full d×k pipeline (sufficient stats → eigh → projection) must
      compose correctly for this to hold;
    - ``eig_desc_ok``: explained variance non-increasing — measured
      INDEPENDENTLY of the model's own (always-sorted) eigvals array:
      the variance of the corpus along rotation direction j is
      recovered from the re-measured whitened moments as
      ``eigvals[j] · cov(whitened)[j,j]``, so a regression in the
      eigendecomposition ordering contract (dropped argsort, permuted
      components) flips this check even though the stored eigvals
      read as sorted;
    - ``full_rank_ok``: no component was dropped on this corpus
      (uniform test embeddings are full-rank; a rank collapse means a
      broken covariance).

    Both moment passes are the bounded-collect aggregation
    (d² + d + 1 rows each); the booleans are computed driver-side
    from those index-sized arrays and emitted as a one-row plan.
    """
    model = pca_whiten_model(df, vec_col=vec_col)
    d = int(np.asarray(model["mean"]).shape[0])
    k = int(np.asarray(model["eigvals"]).shape[0])
    white = pca_whiten(df, model, id_col=id_col, vec_col=vec_col)
    ztz, zs, n = _moment_stats(white, vec_col="whitened")
    zmean = zs / n
    zcov = ztz / n - np.outer(zmean, zmean)
    eig = np.asarray(model["eigvals"])
    # Independent ordering check: var(rotated_j) = λ_j · var(whitened_j),
    # with var(whitened_j) re-measured from the distributed moments —
    # NOT a re-read of the model's sorted eigvals (which would be
    # vacuously non-increasing by construction). Slack of cov_tol×max
    # absorbs the measured-variance noise around 1.0 for near-equal λ.
    measured_var = eig * np.diag(zcov)
    eig_desc = bool(
        np.all(np.diff(measured_var) <= cov_tol * measured_var.max())
    )
    spark = df.sparkSession
    return spark.range(1).select(
        F.lit(int(n)).cast("long").alias("n_rows"),
        F.lit(bool(np.abs(zmean).max() < mean_tol)).alias("mean_zero_ok"),
        F.lit(bool(np.abs(zcov - np.eye(k)).max() < cov_tol)).alias(
            "cov_identity_ok"
        ),
        F.lit(eig_desc).alias("eig_desc_ok"),
        F.lit(bool(k == d)).alias("full_rank_ok"),
    )
