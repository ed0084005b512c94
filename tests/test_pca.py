"""Unit tests for similarity.pca_fit / pca_project: agreement with a
local numpy PCA, deterministic sign convention, partitioning
invariance, and variance ordering."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.similarity import pca_fit, pca_project


def _vecs(spark, X, parts=4):
    rows = [Row(vec_id=i, embedding=[float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(rows).repartition(parts)


def _planted(n=300, d=8, seed=3):
    rng = np.random.default_rng(seed)
    # strong variance along two planted directions + small noise
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([10.0, 5.0] + [0.3] * (d - 2))
    return rng.normal(size=(n, d)) @ np.diag(scales) @ basis.T + rng.normal(
        5.0, 1.0, size=d
    )


def test_fit_matches_numpy_eig(spark):
    X = _planted()
    mean, ev, comps = pca_fit(_vecs(spark, X), k=3)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    want_ev = w[::-1][:3]
    assert np.allclose(ev, want_ev, rtol=1e-8)
    for i in range(3):
        ref = v[:, ::-1][:, i]
        # sign-insensitive direction match
        assert min(
            np.abs(comps[i] - ref).max(), np.abs(comps[i] + ref).max()
        ) < 1e-8


def test_variance_is_descending_and_projection_variance_matches(spark):
    X = _planted()
    df = _vecs(spark, X)
    mean, ev, comps = pca_fit(df, k=4)
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    out = pca_project(df, k=4, fitted=(mean, ev, comps)).toPandas()
    for i in range(4):
        got_var = out[f"pc{i + 1}"].to_numpy().var()
        assert abs(got_var - ev[i]) / max(ev[i], 1e-12) < 1e-6


def test_partitioning_invariance(spark):
    X = _planted(n=120)
    a = pca_fit(_vecs(spark, X, parts=1), k=2)
    b = pca_fit(_vecs(spark, X, parts=7), k=2)
    assert np.allclose(a[0], b[0], atol=1e-12)
    assert np.allclose(a[1], b[1], rtol=1e-9)
    assert np.allclose(a[2], b[2], atol=1e-9)


def test_sign_convention_largest_entry_positive(spark):
    X = _planted()
    _, _, comps = pca_fit(_vecs(spark, X), k=3)
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0


def test_projection_runs_jvm_side(spark):
    X = _planted(n=50)
    df = _vecs(spark, X)
    out = pca_project(df, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # projection must not be a Python UDF


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty)
