"""Distributed Gram/covariance/PCA vs numpy ground truth."""

import numpy as np
import pytest

from summingbird_spark.functions.similarity import (
    covariance_matrix,
    gram_stats,
    pca_project,
    pca_train,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(7)
    # anisotropic data so PCA has a meaningful dominant direction
    base = rng.randn(120, 6) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        base,
    )


def test_gram_and_covariance_match_numpy(spark, emb_df):
    df, x = emb_df
    g, s, n = gram_stats(df, "embedding")
    assert n == len(x)
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-10)
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-10)
    cov, mu, _ = covariance_matrix(df, "embedding")
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False, bias=True), rtol=1e-9)
    np.testing.assert_allclose(mu, x.mean(axis=0), rtol=1e-10)


def test_pca_projection_matches_numpy(spark, emb_df):
    df, x = emb_df
    comp, mu = pca_train(df, k=3, vec_col="embedding")
    out = pca_project(df, comp, mu, vec_col="embedding")
    got = {r["vec_id"]: np.array(r["pca"]) for r in out.collect()}

    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    ref = v[:, ::-1][:, :3].T
    flips = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref = ref * flips[:, None]
    want = (x - x.mean(axis=0)) @ ref.T
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-8, atol=1e-10)


def test_pca_variance_ordering(spark, emb_df):
    df, x = emb_df
    comp, mu = pca_train(df, k=3, vec_col="embedding")
    out = pca_project(df, comp, mu, vec_col="embedding").collect()
    y = np.vstack([np.array(r["pca"]) for r in out])
    variances = y.var(axis=0)
    assert variances[0] > variances[1] > variances[2]
    # dominant direction captures the 5.0-scaled axis
    assert variances[0] > 15


def test_pca_basis_reuse_on_new_batch(spark, emb_df):
    df, x = emb_df
    comp, mu = pca_train(df, k=2, vec_col="embedding")
    new = spark.createDataFrame(
        [(999, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = np.array(pca_project(new, comp, mu).collect()[0]["pca"])
    want = (np.array([1.0, 0, 0, 0, 0, 0]) - mu) @ np.asarray(comp).T
    np.testing.assert_allclose(got, want, rtol=1e-10)
