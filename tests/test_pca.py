"""PCA / covariance parity vs numpy-exact (operators/pca.py).

The distributed two-phase moment aggregation must reproduce the exact
covariance (up to float-summation noise), its eigen-spectrum, and a
projection that preserves pairwise distances in the retained subspace.
"""

from __future__ import annotations

import numpy as np
import pytest

from cdc_streaming_pipeline_spark.operators.pca import (
    covariance_matrix,
    pca_explained_variance,
    pca_project,
)

D = 16
N = 400


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    # anisotropic data: a few dominant directions so the spectrum is distinctive
    basis = rng.normal(size=(D, D))
    scales = np.linspace(5.0, 0.1, D)
    x = rng.normal(size=(N, D)) * scales @ basis.T + rng.normal(size=D)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, schema="vec_id bigint, embedding array<double>")
    return df.repartition(8), x


def test_covariance_matches_numpy(emb_df):
    df, x = emb_df
    cov, n = covariance_matrix(df)
    assert n == N
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), rtol=1e-9, atol=1e-9)


def test_explained_variance_matches_numpy(spark, emb_df):
    df, x = emb_df
    got = pca_explained_variance(spark, df, k=10).toPandas()
    eig = np.linalg.eigh(np.cov(x, rowvar=False))[0][::-1]
    frac = eig / eig.sum()
    np.testing.assert_allclose(got["eigenvalue"], np.round(eig[:10], 6), atol=2e-6)
    np.testing.assert_allclose(got["explained_frac"], np.round(frac[:10], 6), atol=2e-6)
    assert (got["cum_frac"].diff().dropna() > 0).all()
    assert got["cum_frac"].iloc[-1] <= 1.0 + 1e-9


def test_projection_preserves_energy(emb_df):
    df, x = emb_df
    k = D  # full-rank projection is an isometry around the mean
    proj = pca_project(df, k=k).toPandas().sort_values("vec_id")
    p = np.stack(proj["pca"].to_numpy())
    centered = x - x.mean(axis=0)
    # rotation preserves row norms
    np.testing.assert_allclose(
        np.linalg.norm(p, axis=1), np.linalg.norm(centered, axis=1), rtol=1e-8
    )


def test_projection_topk_captures_variance(emb_df):
    df, x = emb_df
    k = 4
    proj = pca_project(df, k=k).toPandas()
    p = np.stack(proj["pca"].to_numpy())
    centered = x - x.mean(axis=0)
    eig = np.linalg.eigh(np.cov(x, rowvar=False))[0][::-1]
    got_var = p.var(axis=0, ddof=1).sum()
    want_var = eig[:k].sum()
    np.testing.assert_allclose(got_var, want_var, rtol=1e-6)
    assert got_var / centered.var(axis=0, ddof=1).sum() > 0.5
