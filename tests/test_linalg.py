"""Distributed normal equations: the Spark-side sufficient statistics
must reproduce numpy exactly, and the ridge solve must recover planted
weights from y = Xw* + noise."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

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


def test_pca_whiten_identity_covariance(spark):
    """The definition of whitening, end to end: whitened corpus has
    ~zero mean and ~identity covariance; eigenvalues descend."""
    import numpy as np

    from vector_database_in_rust_spark.operators.linalg import (
        _moment_stats,
        pca_whiten,
        pca_whiten_model,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    model = pca_whiten_model(emb)
    assert np.all(np.diff(model["eigvals"]) <= 0)
    white = pca_whiten(emb, model)
    ztz, zs, n = _moment_stats(white, vec_col="whitened")
    zmean = zs / n
    zcov = ztz / n - np.outer(zmean, zmean)
    k = len(model["eigvals"])
    assert np.abs(zmean).max() < 1e-6
    assert np.abs(zcov - np.eye(k)).max() < 1e-4


def test_pca_whiten_matches_numpy(spark):
    """Distributed fit+projection vs a straight numpy PCA whitening of
    the collected matrix (test-scale oracle): same subspace, same
    per-row whitened norms up to sign/rotation-free invariants —
    compare via the Gram matrices of a small sample, which are
    invariant to the eigenvector sign ambiguity."""
    import numpy as np

    from vector_database_in_rust_spark.operators.linalg import (
        pca_whiten,
        pca_whiten_model,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.orderBy("vec_id").limit(50).collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)

    model = pca_whiten_model(emb)
    got = (
        pca_whiten(emb, model)
        .filter("vec_id < 50")
        .orderBy("vec_id")
        .toPandas()
    )
    z_spark = np.vstack(got["whitened"].to_numpy())

    full = np.array(
        [r["embedding"] for r in emb.collect()], dtype=np.float64
    )
    mean = full.mean(axis=0)
    cov = np.cov(full.T, bias=True)
    eigvals, vecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    eigvals, vecs = eigvals[order], vecs[:, order]
    z_np = (x - mean) @ (vecs @ np.diag(1.0 / np.sqrt(eigvals)))
    # sign-invariant comparison: inner-product structure must agree
    assert np.allclose(z_spark @ z_spark.T, z_np @ z_np.T, atol=1e-4)


def test_pca_whiten_rank_truncation(spark):
    """A corpus embedded in a lower-dimensional subspace must drop the
    degenerate directions instead of dividing by ~zero eigenvalues."""
    import numpy as np

    from vector_database_in_rust_spark.operators.linalg import (
        pca_whiten,
        pca_whiten_model,
    )

    rng = np.random.RandomState(0)
    base = rng.rand(80, 3)
    lift = rng.rand(3, 8)  # rank-3 data in 8 dims
    x = base @ lift
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    model = pca_whiten_model(df, rank_rtol=1e-8)
    assert len(model["eigvals"]) == 3
    white = pca_whiten(df, model)
    assert white.first()["whitened"].__len__() == 3
    assert white.count() == 80


def test_moment_stats_match_gram_matrix(spark):
    """The BLAS-partial fit path must agree with the oracle-anchored
    exact-expression aggregation (same sufficient statistics, two
    plans)."""
    import numpy as np

    from vector_database_in_rust_spark.operators.linalg import (
        _moment_stats,
        gram_matrix,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    xtx, s, n = _moment_stats(emb, vec_col="embedding")

    rows = gram_matrix(
        emb.withColumn("_one", F.lit(1.0)),
        vec_col="embedding",
        label_col="_one",
        round_digits=9,
    ).collect()
    d = max(r["i"] for r in rows) + 1
    xtx2 = np.zeros((d, d))
    s2 = np.zeros(d)
    n2 = 1.0
    for r in rows:
        if r["i"] < 0:
            n2 = r["value"]
        elif r["j"] < 0:
            s2[r["i"]] = r["value"]
        else:
            xtx2[r["i"], r["j"]] = r["value"]
    assert n == n2
    assert np.allclose(xtx, xtx2, atol=1e-6)
    assert np.allclose(s, s2, atol=1e-6)


def test_pca_verdict_eig_desc_detects_permuted_components(spark, monkeypatch):
    """eig_desc_ok must be an independent measurement, not a re-read of
    the model's always-sorted eigvals: a consistently permuted model
    (eigvals AND whiten columns swapped together — cov identity still
    holds) must flip eig_desc_ok to False while cov_identity_ok stays
    True, proving the check measures the corpus, not the model array."""
    import numpy as np

    from vector_database_in_rust_spark.operators import linalg

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    real = linalg.pca_whiten_model

    def permuted(df, **kw):
        # Simulate a dropped/broken argsort: eigvals and whiten columns
        # consistently out of descending order (the model is internally
        # coherent — whitening still works — but the ordering contract
        # "component 0 explains the most variance" is broken).
        m = real(df, **kw)
        perm = np.arange(len(m["eigvals"]))
        perm[[0, -1]] = perm[[-1, 0]]
        return {
            "mean": m["mean"],
            "eigvals": m["eigvals"][perm],
            "whiten": m["whiten"][:, perm],
        }

    monkeypatch.setattr(linalg, "pca_whiten_model", permuted)
    row = linalg.pca_whiten_verdict(emb).first()
    assert row["cov_identity_ok"]  # permutation preserves whitening
    assert not row["eig_desc_ok"]  # ...but breaks the ordering contract
