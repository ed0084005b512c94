"""Property tests for wave J: Mann-Kendall vs a direct numpy S/z
computation (null and planted-trend cases, tie correction), and the
G-test's exact 2N·MI identity plus its chi-square bracketing."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest


def _mk_ref(x):
    x = np.asarray(x)
    n = len(x)
    s = 0
    for i in range(n - 1):
        s += int(np.sign(x[i + 1 :] - x[i]).sum())
    _, counts = np.unique(x, return_counts=True)
    tie = float(np.sum(counts * (counts - 1) * (2 * counts + 5)))
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    if var <= 0:
        return s, None
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, z


def _series_df(spark, values, start="2023-01-01"):
    d0 = dt.date.fromisoformat(start)
    return spark.createDataFrame(
        [
            (dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time(8)), float(v))
            for i, v in enumerate(values)
        ],
        "ts timestamp, v double",
    )


def test_mann_kendall_matches_numpy_and_detects_trend(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import mann_kendall_trend

    rng = np.random.RandomState(7)
    # null: white noise with ties (rounded to 1 decimal)
    noise = np.round(rng.normal(100, 5, 90), 1)
    r = mann_kendall_trend(
        _series_df(spark, noise), ts_col="ts", value_col="v", unit_scale=10
    ).collect()[0]
    cents = np.round(noise * 10).astype(np.int64)
    s_ref, z_ref = _mk_ref(cents)
    assert r.s == s_ref and r.z == pytest.approx(z_ref, abs=1e-9)
    assert abs(r.z) < 2.5  # no trend planted
    # planted upward trend dominates the noise
    trend = noise + np.arange(90) * 2.0
    r2 = mann_kendall_trend(
        _series_df(spark, trend), ts_col="ts", value_col="v", unit_scale=10
    ).collect()[0]
    s2, z2 = _mk_ref(np.round(trend * 10).astype(np.int64))
    assert r2.s == s2 and r2.z == pytest.approx(z2, abs=1e-9)
    assert r2.z > 5
    # all-tied series: variance degenerates -> NULL z, S = 0
    flat = mann_kendall_trend(
        _series_df(spark, [7.0] * 30), ts_col="ts", value_col="v"
    ).collect()[0]
    assert flat.s == 0 and flat.z is None


def test_g_test_is_2n_times_mi_and_brackets_chi2(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import (
        chi_square_independence,
        g_test_independence,
        mutual_information,
    )

    rng = np.random.RandomState(3)
    # dependent design: b mostly tracks a
    a = rng.choice(["x", "y", "z"], 600)
    b = np.where(rng.rand(600) < 0.7, a, rng.choice(["x", "y", "z"], 600))
    df = spark.createDataFrame(
        [(str(u), str(v)) for u, v in zip(a, b)], "a string, b string"
    )
    g = g_test_independence(df, "a", "b").collect()[0]
    mi = mutual_information(df, "a", "b").collect()[0]
    chi = chi_square_independence(df, "a", "b").collect()[0]
    assert g.n == mi.n == chi.n == 600 and g.dof == chi.dof == 4
    # the exact identity G = 2N·I(A;B) (same micro fold, doubled)
    assert g.g == pytest.approx(2 * mi.n * mi.mi_nats, abs=1e-3)
    # both tests see the strong dependence, same order of magnitude
    assert g.g > 100 and chi.chi2 > 100
    assert g.g == pytest.approx(chi.chi2, rel=0.5)
    # independent design: both near zero relative to n
    ind = spark.createDataFrame(
        [(str(u), str(v)) for u, v in zip(rng.choice(["x", "y"], 800),
                                          rng.choice(["p", "q"], 800))],
        "a string, b string",
    )
    gi = g_test_independence(ind, "a", "b").collect()[0]
    assert gi.dof == 1 and gi.g < 7
    # single-category -> NULL
    one = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    assert g_test_independence(one, "a", "b").collect()[0].g is None
