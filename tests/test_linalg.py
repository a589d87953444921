"""Distributed normal equations: the Spark-side sufficient statistics
must reproduce numpy exactly, and the ridge solve must recover planted
weights from y = Xw* + noise."""

from __future__ import annotations

import numpy as np

from vector_database_in_rust_spark.operators.linalg import (
    gram_matrix,
    ridge_fit,
)


def _planted(spark, n=400, d=8, noise=0.01, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    w_star = rng.normal(size=d)
    y = x @ w_star + noise * rng.normal(size=n)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]], float(y[i])) for i in range(n)],
        "vec_id long, embedding array<double>, label double",
    )
    return df, x, y, w_star


def test_gram_matches_numpy(spark):
    df, x, y, _ = _planted(spark)
    rows = gram_matrix(df, round_digits=9).collect()
    d = x.shape[1]
    a = np.zeros((d, d))
    b = np.zeros(d)
    n = None
    for r in rows:
        if r["i"] < 0:
            n = r["value"]
        elif r["j"] < 0:
            b[r["i"]] = r["value"]
        else:
            a[r["i"], r["j"]] = r["value"]
    assert n == x.shape[0]
    assert np.allclose(a, x.T @ x, atol=1e-6)
    assert np.allclose(b, x.T @ y, atol=1e-6)
    assert np.allclose(a, a.T)  # Gram symmetry survives the shuffle


def test_ridge_recovers_planted_weights(spark):
    df, x, y, w_star = _planted(spark)
    w = ridge_fit(df, reg=1e-6)
    assert np.max(np.abs(w - w_star)) < 0.05
    # and the near-unregularized solve matches lstsq on the raw data
    w_np = np.linalg.lstsq(x, y, rcond=None)[0]
    assert np.allclose(w, w_np, atol=1e-3)


def test_ridge_regularization_shrinks(spark):
    df, _, _, _ = _planted(spark)
    w_small = ridge_fit(df, reg=1e-6)
    w_big = ridge_fit(df, reg=10.0)
    assert np.linalg.norm(w_big) < np.linalg.norm(w_small)
