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


def test_kcenter_sample_greedy_parity_and_coverage(spark, sf_dir):
    """Picks must equal an exact-integer numpy replay of greedy
    farthest-point (same HALF_UP quantization, same min-id tiebreak),
    and the selection must be a 2-approximate cover: max over points
    of distance-to-nearest-pick equals the LAST pick's selection
    distance or less."""
    import numpy as np

    from dlp_rdb_bq_import_spark.operators.similarity import (
        QUANT_SCALE,
        kcenter_sample,
    )

    d = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = 10
    got = [
        (r.vec_id, r.pick_order)
        for r in kcenter_sample(d, k=k).orderBy("pick_order").collect()
    ]
    rows = d.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])

    def q(x):  # HALF_UP like Spark round()
        v = float(np.float64(x)) * QUANT_SCALE
        return int(np.floor(v + 0.5)) if v >= 0 else -int(np.floor(-v + 0.5))

    Q = np.array([[q(x) for x in r.embedding] for r in rows], dtype=np.int64)
    n2 = (Q * Q).sum(axis=1)
    sel = [int(np.lexsort((ids, -n2))[0])]
    mind = ((Q - Q[sel[0]]) ** 2).sum(axis=1)
    mind[sel[0]] = -1
    for _ in range(k - 1):
        nxt = int(np.lexsort((ids, -mind))[0])
        sel.append(nxt)
        mind = np.minimum(mind, ((Q - Q[nxt]) ** 2).sum(axis=1))
        mind[nxt] = -1
    assert got == [(int(ids[i]), j + 1) for j, i in enumerate(sel)]
    # coverage: no remaining point is farther than the last selection was
    last_sel_dist = ((Q - Q[sel[-1]]) ** 2).sum(axis=1)  # not needed directly
    centers = Q[sel]
    d2 = ((Q[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2).min(axis=1)
    radius = int(d2.max())
    picked_dist = int(
        max(
            ((Q[s] - Q[sel[: j]]) ** 2).sum(axis=1).min()
            for j, s in enumerate(sel)
            if j > 0
        )
    )
    assert radius <= picked_dist  # Gonzalez invariant

    # degenerate inputs: k larger than n truncates; empty input is empty
    tiny = d.limit(3)
    assert kcenter_sample(tiny, k=10).count() == 3
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kcenter_sample(empty, k=4).count() == 0
    # clustering-scale k fails loudly instead of running thousands of
    # sequential driver rounds
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k=256"):
        kcenter_sample(d, k=257)
