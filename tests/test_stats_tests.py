"""Property tests for the two-sample hypothesis tests and the Gini
concentration readout (round-11 wave 3): each operator pinned to an
independent numpy reference computed a completely different way
(per-row ranks / ECDF scans, not grouped distinct-value arithmetic),
plus the degenerate-input contracts."""

from __future__ import annotations

import numpy as np
import pytest

from dlp_rdb_bq_import_spark.operators.profiling import (
    gini_coefficient,
    ks_test_2sample,
    mann_whitney_u,
)


def _ks_reference(xa: np.ndarray, xb: np.ndarray) -> tuple[float, float]:
    allv = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(np.sort(xa), allv, side="right") / len(xa)
    fb = np.searchsorted(np.sort(xb), allv, side="right") / len(xb)
    d = float(np.max(np.abs(fa - fb)))
    return d, d * np.sqrt(len(xa) * len(xb) / (len(xa) + len(xb)))


def _mwu_reference(xa: np.ndarray, xb: np.ndarray) -> tuple[float, float]:
    comb = np.concatenate([xa, xb])
    order = np.argsort(comb, kind="mergesort")
    ranks = np.empty(len(comb))
    sv = comb[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n1, n2 = len(xa), len(xb)
    u = float(ranks[: n1].sum() - n1 * (n1 + 1) / 2)
    _, counts = np.unique(comb, return_counts=True)
    ties = float(np.sum(counts.astype(float) ** 3 - counts))
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    return u, (u - n1 * n2 / 2.0) / np.sqrt(var)


def _gini_reference(x: np.ndarray, unit_scale: int = 100) -> float:
    v = np.sort(np.round(x * unit_scale).astype(np.int64))
    n = len(v)
    return float(
        (2 * np.sum(np.arange(1, n + 1) * v) - (n + 1) * v.sum())
        / (n * v.sum())
    )


def test_ks_and_mwu_match_numpy_rank_references(spark):
    rng = np.random.RandomState(11)
    xa = np.round(rng.gamma(2.0, 50.0, 500), 2)
    xb = np.round(rng.gamma(2.4, 55.0, 350), 2)
    a = spark.createDataFrame([(float(v),) for v in xa], "x double")
    b = spark.createDataFrame([(float(v),) for v in xb], "x double")

    d_ref, z_ref = _ks_reference(xa, xb)
    r = ks_test_2sample(a, b, "x").collect()[0]
    assert (r.n_a, r.n_b) == (500, 350)
    assert r.d == pytest.approx(d_ref, abs=1e-9)
    assert r.ks_z == pytest.approx(z_ref, abs=1e-6)

    u_ref, uz_ref = _mwu_reference(xa, xb)
    m = mann_whitney_u(a, b, "x").collect()[0]
    assert m.u == pytest.approx(u_ref, abs=1e-6)
    assert m.z == pytest.approx(uz_ref, abs=1e-6)


def test_ks_identical_samples_zero_and_disjoint_one(spark):
    vals = [(float(v),) for v in range(1, 60)]
    a = spark.createDataFrame(vals, "x double")
    r = ks_test_2sample(a, a, "x").collect()[0]
    assert r.d == 0.0 and r.ks_z == 0.0
    lo = spark.createDataFrame([(float(v),) for v in range(100)], "x double")
    hi = spark.createDataFrame(
        [(float(v),) for v in range(1000, 1100)], "x double"
    )
    r = ks_test_2sample(lo, hi, "x").collect()[0]
    assert r.d == 1.0  # fully separated CDFs


def test_mwu_symmetry_and_all_tied_null_z(spark):
    rng = np.random.RandomState(3)
    xa = np.round(rng.normal(10, 2, 200), 1)
    xb = np.round(rng.normal(11, 2, 150), 1)
    a = spark.createDataFrame([(float(v),) for v in xa], "x double")
    b = spark.createDataFrame([(float(v),) for v in xb], "x double")
    rab = mann_whitney_u(a, b, "x").collect()[0]
    rba = mann_whitney_u(b, a, "x").collect()[0]
    # U_a + U_b = n_a * n_b (the rank identity), z antisymmetric
    assert rab.u + rba.u == pytest.approx(200 * 150, abs=1e-9)
    assert rab.z == pytest.approx(-rba.z, abs=1e-9)
    const = spark.createDataFrame([(5.0,)] * 30, "x double")
    r = mann_whitney_u(const, const, "x").collect()[0]
    assert r.u == pytest.approx(30 * 30 / 2) and r.z is None  # var = 0


def test_gini_bounds_and_reference(spark):
    # perfectly equal -> 0
    eq = spark.createDataFrame([(7.0,)] * 40, "x double")
    assert gini_coefficient(eq, "x").collect()[0].gini == 0.0
    # one holder of everything -> (n-1)/n
    n = 25
    conc = spark.createDataFrame(
        [(0.0,)] * (n - 1) + [(1000.0,)], "x double"
    )
    assert gini_coefficient(conc, "x").collect()[0].gini == pytest.approx(
        (n - 1) / n, abs=1e-9
    )
    rng = np.random.RandomState(5)
    x = np.round(rng.lognormal(3, 1, 300), 2)
    df = spark.createDataFrame([(float(v),) for v in x], "x double")
    assert gini_coefficient(df, "x").collect()[0].gini == pytest.approx(
        _gini_reference(x), abs=1e-9
    )


def test_two_sample_degenerate_and_validation(spark):
    a = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    e = spark.createDataFrame([], "x double")
    r = ks_test_2sample(a, e, "x").collect()[0]
    assert (r.n_b, r.d, r.ks_z) == (0, None, None)
    r = mann_whitney_u(e, a, "x").collect()[0]
    assert (r.n_a, r.u, r.z) == (0, None, None)
    assert gini_coefficient(e, "x").collect()[0].gini is None
    with pytest.raises(ValueError, match="value_round"):
        ks_test_2sample(a, a, "x", value_round=-1)
    with pytest.raises(ValueError, match="unit_scale"):
        gini_coefficient(a, "x", unit_scale=0)
    with pytest.raises(Exception, match="negative"):
        gini_coefficient(
            spark.createDataFrame([(-1.0,), (2.0,)], "x double"), "x"
        ).collect()


def test_ks_value_round_caps_domain(spark):
    rng = np.random.RandomState(9)
    xa = rng.normal(0, 1, 400)  # raw continuous scores
    xb = rng.normal(0.5, 1, 400)
    a = spark.createDataFrame([(float(v),) for v in xa], "x double")
    b = spark.createDataFrame([(float(v),) for v in xb], "x double")
    d_ref, _ = _ks_reference(np.round(xa, 2), np.round(xb, 2))
    r = ks_test_2sample(a, b, "x", value_round=2).collect()[0]
    assert r.d == pytest.approx(d_ref, abs=1e-9)
