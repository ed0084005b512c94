"""Round-14 wave A: the classical test-battery extensions — Welch t,
one-way ANOVA F, Jarque–Bera, Bartlett, Cochran's Q, Cramér's V — each
pinned to an independent numpy reference computed a completely
different way (per-row arrays, not grouped integer folds), plus the
degenerate-input contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.profiling import (
    anova_f_oneway,
    bartlett_test,
    cochrans_q_test,
    cramers_v,
    jarque_bera_test,
    welch_t_test,
)


def _two_groups(rng, na=400, nb=300):
    xa = np.round(rng.gamma(2.0, 50.0, na), 2)
    xb = np.round(rng.gamma(2.5, 48.0, nb), 2)
    return xa, xb


def test_welch_t_matches_numpy(spark):
    rng = np.random.RandomState(14)
    xa, xb = _two_groups(rng)
    df = spark.createDataFrame(
        [Row(g=True, v=float(v)) for v in xa]
        + [Row(g=False, v=float(v)) for v in xb]
    )
    out = welch_t_test(df, "g", "v").collect()[0]
    qa, qb = np.round(xa * 100), np.round(xb * 100)
    va, vb = qa.var(ddof=1), qb.var(ddof=1)
    ua, ub = va / len(qa), vb / len(qb)
    t_ref = (qa.mean() - qb.mean()) / np.sqrt(ua + ub)
    df_ref = (ua + ub) ** 2 / (ua**2 / (len(qa) - 1) + ub**2 / (len(qb) - 1))
    assert out.n_a == len(xa) and out.n_b == len(xb)
    assert out.mean_a == pytest.approx(xa.mean(), rel=1e-9)
    assert out.t_stat == pytest.approx(t_ref, rel=1e-9)
    assert out.df == pytest.approx(df_ref, rel=1e-9)


def test_welch_degenerate_groups_null(spark):
    df = spark.createDataFrame([Row(g=True, v=1.0), Row(g=False, v=2.0)])
    out = welch_t_test(df, "g", "v").collect()[0]
    assert out.t_stat is None and out.df is None  # n < 2 per group
    # identical constant groups: zero variance -> NULL, never a crash
    df2 = spark.createDataFrame(
        [Row(g=True, v=5.0)] * 3 + [Row(g=False, v=5.0)] * 3
    )
    out2 = welch_t_test(df2, "g", "v").collect()[0]
    assert out2.t_stat is None and out2.mean_a == 5.0


def test_anova_f_matches_numpy(spark):
    rng = np.random.RandomState(15)
    groups = {
        "a": np.round(rng.normal(100, 10, 300), 2),
        "b": np.round(rng.normal(103, 12, 250), 2),
        "c": np.round(rng.normal(98, 9, 350), 2),
    }
    rows = [Row(g=g, v=float(v)) for g, xs in groups.items() for v in xs]
    out = anova_f_oneway(spark.createDataFrame(rows), "g", "v").collect()[0]
    qs = {g: np.round(xs * 100) for g, xs in groups.items()}
    allv = np.concatenate(list(qs.values()))
    gm = allv.mean()
    ssb = sum(len(x) * (x.mean() - gm) ** 2 for x in qs.values())
    ssw = sum(((x - x.mean()) ** 2).sum() for x in qs.values())
    k, n = len(qs), len(allv)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert (out.k, out.n, out.df1, out.df2) == (3, n, 2, n - 3)
    assert out.ss_between == pytest.approx(ssb, rel=1e-6)
    assert out.ss_within == pytest.approx(ssw, rel=1e-6)
    assert out.f_stat == pytest.approx(f_ref, rel=1e-6)


def test_anova_single_group_null(spark):
    df = spark.createDataFrame([Row(g="x", v=float(i)) for i in range(5)])
    out = anova_f_oneway(df, "g", "v").collect()[0]
    assert out.k == 1 and out.f_stat is None


def test_jarque_bera_matches_numpy(spark):
    rng = np.random.RandomState(16)
    x = np.round(rng.lognormal(4.0, 0.6, 800))  # clearly non-normal
    out = jarque_bera_test(
        spark.createDataFrame([Row(v=float(v)) for v in x]), "v"
    ).collect()[0]
    n = len(x)
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    m4 = ((x - mu) ** 4).mean()
    skew = m3 / m2**1.5
    kurt = m4 / m2**2
    jb = n * (skew**2 / 6 + (kurt - 3) ** 2 / 24)
    assert out.n == n
    assert out.skewness == pytest.approx(skew, rel=1e-6)
    assert out.kurtosis == pytest.approx(kurt, rel=1e-6)
    assert out.jb_stat == pytest.approx(jb, rel=1e-6)
    assert out.jb_stat > 50  # lognormal: decisively non-normal


def test_jarque_bera_constant_null(spark):
    df = spark.createDataFrame([Row(v=7.0)] * 10)
    out = jarque_bera_test(df, "v").collect()[0]
    assert out.n == 10 and out.jb_stat is None


def test_bartlett_matches_numpy(spark):
    rng = np.random.RandomState(17)
    groups = {
        "a": np.round(rng.normal(0, 10, 200), 2),
        "b": np.round(rng.normal(0, 15, 260), 2),
        "c": np.round(rng.normal(0, 12, 240), 2),
    }
    rows = [Row(g=g, v=float(v)) for g, xs in groups.items() for v in xs]
    out = bartlett_test(spark.createDataFrame(rows), "g", "v").collect()[0]
    qs = [np.round(xs * 100) for xs in groups.values()]
    k = len(qs)
    n = sum(len(x) for x in qs)
    vars_ = [x.var(ddof=1) for x in qs]
    sp2 = sum((len(x) - 1) * v for x, v in zip(qs, vars_)) / (n - k)
    num = (n - k) * np.log(sp2) - sum(
        (len(x) - 1) * np.log(v) for x, v in zip(qs, vars_)
    )
    c = 1 + (sum(1 / (len(x) - 1) for x in qs) - 1 / (n - k)) / (3 * (k - 1))
    assert (out.k, out.n, out.df) == (3, n, 2)
    assert out.bartlett_stat == pytest.approx(num / c, abs=1e-4)
    assert out.bartlett_stat > 10  # sd 10 vs 15: clearly heterogeneous


def test_cochrans_q_matches_hand_example(spark):
    """Classic 3-treatment layout, hand-computed Q."""
    rows = [
        (1, 1, 1), (1, 1, 1), (1, 0, 1), (0, 1, 1), (1, 0, 0),
        (0, 0, 1), (1, 1, 0), (0, 0, 0), (1, 1, 1), (0, 1, 1),
    ]
    df = spark.createDataFrame(
        [Row(f0=bool(a), f1=bool(b), f2=bool(c)) for a, b, c in rows]
    )
    out = cochrans_q_test(df, ["f0", "f1", "f2"]).collect()[0]
    x = np.array(rows)
    cj = x.sum(axis=0)
    ri = x.sum(axis=1)
    k = 3
    q_ref = (k - 1) * (k * (cj**2).sum() - ri.sum() ** 2) / (
        k * ri.sum() - (ri**2).sum()
    )
    assert (out.n, out.k, out.df) == (10, 3, 2)
    assert out.q_stat == pytest.approx(q_ref, abs=1e-9)  # round(·, 9) readout


def test_cochrans_q_requires_two_cols_and_handles_degenerate(spark):
    with pytest.raises(ValueError, match="flag columns"):
        cochrans_q_test(spark.range(1), ["id"])
    # all-ones rows: denominator 0 -> NULL
    df = spark.createDataFrame([Row(a=True, b=True)] * 4)
    out = cochrans_q_test(df, ["a", "b"]).collect()[0]
    assert out.q_stat is None


def test_cramers_v_matches_numpy(spark):
    rng = np.random.RandomState(18)
    a = rng.choice(["x", "y", "z"], 900, p=[0.5, 0.3, 0.2])
    b = np.where(
        (a == "x") & (rng.random(900) < 0.6), "p",
        rng.choice(["p", "q"], 900),
    )
    df = spark.createDataFrame([Row(a=str(u), b=str(v)) for u, v in zip(a, b)])
    out = cramers_v(df, "a", "b").collect()[0]
    la, lb = np.unique(a), np.unique(b)
    obs = np.array([[np.sum((a == u) & (b == v)) for v in lb] for u in la])
    n = obs.sum()
    e = np.outer(obs.sum(1), obs.sum(0)) / n
    chi2 = ((obs - e) ** 2 / e).sum()
    v_ref = np.sqrt(chi2 / (n * (min(len(la), len(lb)) - 1)))
    assert (out.n, out.r, out.c) == (900, len(la), len(lb))
    assert out.chi2 == pytest.approx(chi2, abs=1e-5)
    assert out.cramers_v == pytest.approx(v_ref, abs=1e-6)


def test_cramers_v_single_level_null(spark):
    df = spark.createDataFrame([Row(a="x", b="p"), Row(a="x", b="q")])
    out = cramers_v(df, "a", "b").collect()[0]
    assert out.cramers_v is None and out.r == 1
