"""Quality gates for the distributed PCA operator (rows-only registry
entry ``emb_pca_project``): numpy parity, orthonormality, variance
accounting, partitioning invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysteryann_spark.operators.pca import fit_pca, project_pca
from mysteryann_spark.sources.tables import load_table
from tests.conftest import SF_DIR

K = 8


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR).cache()


@pytest.fixture(scope="module")
def local(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, x


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_fit_matches_numpy(emb, local):
    _, x = local
    model = fit_pca(emb, K)
    mean, comps, evals = _numpy_pca(x, K)
    np.testing.assert_allclose(model.mean, mean, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(model.explained_var, evals, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(model.components, comps, rtol=1e-6, atol=1e-9)


def test_components_orthonormal_and_variance_descending(emb):
    model = fit_pca(emb, K)
    gram = model.components @ model.components.T
    np.testing.assert_allclose(gram, np.eye(K), atol=1e-10)
    assert np.all(np.diff(model.explained_var) <= 1e-12)
    assert np.all(model.explained_var > 0)


def test_projection_matches_numpy_and_captures_variance(emb, local):
    ids, x = local
    model = fit_pca(emb, K)
    proj = project_pca(emb, model)
    got = {r["vec_id"]: np.array(r["pc"]) for r in proj.collect()}
    expect = (x - model.mean) @ model.components.T
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[int(vid)], expect[i], rtol=1e-8, atol=1e-10)
    # score variance per component equals the eigenvalue (PCA identity)
    score_var = expect.var(axis=0)
    np.testing.assert_allclose(score_var, model.explained_var, rtol=1e-8)


def test_fit_invariant_to_partitioning(emb):
    a = fit_pca(emb, K)
    b = fit_pca(emb.repartition(7), K)
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(a.components, b.components, rtol=1e-5, atol=1e-8)


def test_registry_entry_shape(spark):
    from mysteryann_spark.queries.pipeline import emb_pca_project

    df = emb_pca_project(spark, SF_DIR)
    # scalar (vec_id, component, value) rows: driver hash canonicalizers
    # sort pandas frames and crash on array columns, so the entry
    # posexplodes the projection
    assert df.columns == ["vec_id", "component", "value"]
    rows = df.where(F.col("vec_id") == df.select(F.min("vec_id")).first()[0]).collect()
    assert sorted(r["component"] for r in rows) == list(range(K))
