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


# --------------------------------------------------------------------------
# wave C: timeseries diagnostics (durbin-watson, ljung-box, runs, MASE)
# --------------------------------------------------------------------------


def _daily_rows(values, start="2024-01-01"):
    import datetime

    d0 = datetime.date.fromisoformat(start)
    return [
        Row(ts=datetime.datetime.combine(
            d0 + datetime.timedelta(days=i), datetime.time(12)
        ), v=float(v))
        for i, v in enumerate(values)
    ]


def test_durbin_watson_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import durbin_watson

    rng = np.random.RandomState(19)
    # AR(1)-ish residuals around a trend: DW should sit well below 2
    e = np.zeros(120)
    for i in range(1, 120):
        e[i] = 0.6 * e[i - 1] + rng.normal(0, 5)
    y = np.round(100 + 2.5 * np.arange(120) + e, 2)
    df = spark.createDataFrame(_daily_rows(y))
    out = durbin_watson(df, ts_col="ts", value_col="v").collect()[0]
    q = np.round(y * 100)
    x = np.arange(120)
    b, a = np.polyfit(x, q, 1)
    res = q - (a + b * x)
    dw_ref = np.sum(np.diff(res) ** 2) / np.sum(res**2)
    assert out.n_days == 120
    assert out.dw_stat == pytest.approx(dw_ref, abs=1e-6)
    assert out.dw_stat < 1.5  # positive autocorrelation detected
    assert out.rho_hat == pytest.approx(1 - dw_ref / 2, abs=1e-6)


def test_durbin_watson_short_series_null(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import durbin_watson

    df = spark.createDataFrame(_daily_rows([10.0, 12.0]))
    out = durbin_watson(df, ts_col="ts", value_col="v").collect()[0]
    assert out.n_days == 2 and out.dw_stat is None


def test_ljung_box_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import ljung_box

    rng = np.random.RandomState(20)
    y = np.round(rng.normal(1000, 50, 90) + 80 * np.sin(np.arange(90) * 2 * np.pi / 7), 2)
    df = spark.createDataFrame(_daily_rows(y))
    out = ljung_box(df, ts_col="ts", value_col="v").collect()[0]
    q = np.round(y * 100).astype(np.int64)
    n = len(q)
    mu = q.mean()
    den = np.sum((q - mu) ** 2)
    acf = [round(np.sum((q[:-l] - mu) * (q[l:] - mu)) / den, 9) for l in range(1, 8)]
    q_ref = n * (n + 2) * sum(r**2 / (n - l) for l, r in enumerate(acf, 1))
    assert (out.n_days, out.h) == (90, 7)
    assert out.q_stat == pytest.approx(q_ref, abs=1e-5)
    assert out.q_stat > 20  # weekly cycle: decisively non-white


def test_runs_test_matches_reference(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import runs_test

    # deterministic alternating series: maximal runs, z > 0
    y = [100 + (5 if i % 2 else -5) for i in range(40)]
    df = spark.createDataFrame(_daily_rows(y))
    out = runs_test(df, ts_col="ts", value_col="v").collect()[0]
    # 39 nonzero diffs alternate sign -> 39 runs
    assert (out.n_plus + out.n_minus, out.n_runs) == (39, 39)
    p, q, r = out.n_plus, out.n_minus, out.n_runs
    mu = 2 * p * q / (p + q) + 1
    var = 2 * p * q * (2 * p * q - p - q) / ((p + q) ** 2 * (p + q - 1))
    assert out.z == pytest.approx((r - mu) / np.sqrt(var), abs=1e-9)
    assert out.z > 3  # oscillation detected


def test_runs_test_zero_diffs_dropped(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import runs_test

    y = [10.0, 10.0, 12.0, 12.0, 11.0, 11.0, 13.0]
    df = spark.createDataFrame(_daily_rows(y))
    out = runs_test(df, ts_col="ts", value_col="v").collect()[0]
    # nonzero diffs: +2, -1, +2 -> 2 plus-runs + 1 minus-run
    assert (out.n_plus, out.n_minus, out.n_runs) == (2, 1, 3)


def test_mase_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import mase_seasonal_naive

    rng = np.random.RandomState(21)
    base = 1000 + 200 * np.sin(np.arange(70) * 2 * np.pi / 7)
    y = np.round(base + rng.normal(0, 10, 70), 2)
    df = spark.createDataFrame(_daily_rows(y))
    out = mase_seasonal_naive(df, ts_col="ts", value_col="v").collect()[0]
    q = np.round(y * 100)
    mae_s = np.mean(np.abs(q[7:] - q[:-7])) / 100
    mae_n = np.mean(np.abs(q[1:] - q[:-1])) / 100
    assert (out.n_seasonal_pairs, out.n_naive_pairs) == (63, 69)
    assert out.mae_seasonal == pytest.approx(mae_s, abs=1e-9)
    assert out.mae_naive == pytest.approx(mae_n, abs=1e-9)
    assert out.mase == pytest.approx(mae_s / mae_n, abs=1e-9)
    assert out.mase < 0.5  # strong weekly seasonality: seasonal-naive wins


def test_mase_gap_days_simply_do_not_pair(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import mase_seasonal_naive

    rows = _daily_rows([10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0, 18.0])
    rows = [r for i, r in enumerate(rows) if i != 1]  # knock out day 1
    out = mase_seasonal_naive(
        spark.createDataFrame(rows), ts_col="ts", value_col="v"
    ).collect()[0]
    assert out.n_seasonal_pairs == 1  # only day 8 pairs with day 1... gone -> day7+
    assert out.n_naive_pairs == 6


# --------------------------------------------------------------------------
# wave B/D/E: rank tests, inequality/concentration, text spectrum
# --------------------------------------------------------------------------


def test_somers_d_matches_pair_loop(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import somers_d

    rng = np.random.RandomState(22)
    x = rng.randint(1, 8, 300)
    y = np.round((x * 0.03 + rng.random(300) * 0.1), 2)
    df = spark.createDataFrame(
        [Row(x=float(a), y=float(b)) for a, b in zip(x, y)]
    )
    out = somers_d(df, "x", "y", x_scale=1, y_scale=100).collect()[0]
    qx, qy = x, np.round(y * 100)
    c = d = tx = ty = 0
    n = len(qx)
    for i in range(n):
        for j in range(i + 1, n):
            if qx[i] == qx[j]:
                tx += 1
                continue
            if qy[i] == qy[j]:
                ty += 1
                continue
            if (qx[i] - qx[j]) * (qy[i] - qy[j]) > 0:
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) / 2
    # pair-loop ties: tx counts pairs tied on x (regardless of y), the
    # formula's n1; ty here = tied-on-y-only, so n2 = ty + both-tied
    both = sum(
        1 for i in range(n) for j in range(i + 1, n)
        if qx[i] == qx[j] and qy[i] == qy[j]
    )
    n1 = tx
    n2 = ty + both
    assert out.n == n and out.concordant == c and out.discordant == d
    assert out.d_yx == pytest.approx((c - d) / (n0 - n1), abs=1e-9)
    assert out.d_xy == pytest.approx((c - d) / (n0 - n2), abs=1e-9)


def test_wilcoxon_signed_rank_matches_midrank_reference(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import wilcoxon_signed_rank

    rng = np.random.RandomState(23)
    a = np.round(rng.normal(100, 10, 250), 2)
    b = np.round(a - 0.8 + rng.normal(0, 3, 250), 2)  # a shifted up
    df = spark.createDataFrame(
        [Row(a=float(u), b=float(v)) for u, v in zip(a, b)]
    )
    out = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    d = np.round(a * 100) - np.round(b * 100)
    d = d[d != 0]
    ad = np.abs(d)
    order = np.argsort(ad, kind="mergesort")
    ranks = np.empty(len(ad))
    sv = ad[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    w_plus = ranks[d > 0].sum()
    n = len(d)
    _, counts = np.unique(ad, return_counts=True)
    ties = float(np.sum(counts.astype(float) ** 3 - counts))
    var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    z_ref = (w_plus - n * (n + 1) / 4.0) / np.sqrt(var)
    assert out.n == n
    assert out.w_plus == pytest.approx(w_plus, abs=1e-9)
    assert out.z == pytest.approx(z_ref, abs=1e-9)
    assert out.z > 2  # the planted +0.8 shift is detected


def test_wilcoxon_all_zero_diffs(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import wilcoxon_signed_rank

    df = spark.createDataFrame([Row(a=5.0, b=5.0)] * 4)
    out = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert out.n == 0 and out.w_plus is None and out.z is None


def test_theil_index_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import theil_index

    rng = np.random.RandomState(24)
    x = np.round(rng.lognormal(3, 1, 500), 2)
    out = theil_index(
        spark.createDataFrame([Row(v=float(v)) for v in x]), "v"
    ).collect()[0]
    q = np.round(x * 100)
    mu = q.mean()
    t_ref = np.mean((q / mu) * np.log(q / mu))
    assert out.n == 500
    assert out.mean == pytest.approx(x.mean(), abs=1e-6)
    assert out.theil == pytest.approx(t_ref, abs=1e-6)
    assert out.theil > 0.3  # lognormal sigma=1: clearly unequal


def test_theil_equal_values_zero_and_negative_raises(spark):
    from pyspark.errors import PySparkException

    from dlp_rdb_bq_import_spark.operators.profiling import theil_index

    out = theil_index(
        spark.createDataFrame([Row(v=10.0)] * 6), "v"
    ).collect()[0]
    assert out.theil == 0.0
    with pytest.raises(PySparkException, match="negative"):
        theil_index(
            spark.createDataFrame([Row(v=-1.0), Row(v=2.0)]), "v"
        ).collect()


def test_concentration_report_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import concentration_report

    rng = np.random.RandomState(25)
    vals = np.round(rng.pareto(1.2, 40) * 100 + 1, 2)
    rows = [Row(item=i, v=float(v)) for i, v in enumerate(vals)]
    out = concentration_report(
        spark.createDataFrame(rows), ["item"], "v"
    ).collect()[0]
    s = vals / vals.sum()
    top = np.sort(vals)[::-1]
    assert out.n_items == 40
    assert out.total == pytest.approx(vals.sum(), abs=1e-6)
    assert out.hhi == pytest.approx((s**2).sum(), abs=1e-9)
    assert out.cr_a == pytest.approx(top[:4].sum() / vals.sum(), abs=1e-9)
    assert out.cr_b == pytest.approx(top[:8].sum() / vals.sum(), abs=1e-9)
    with pytest.raises(ValueError, match="k_a"):
        concentration_report(spark.createDataFrame(rows), ["item"], "v", top_k=(8, 4))


def test_friedman_matches_reference(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import friedman_test

    rng = np.random.RandomState(26)
    n_blocks, k = 25, 4
    effects = np.array([0.0, 0.5, 1.0, 0.2])
    rows = []
    data = np.zeros((n_blocks, k))
    for b in range(n_blocks):
        base = rng.normal(10, 2)
        for j in range(k):
            data[b, j] = round(base + effects[j] + rng.normal(0, 0.5), 2)
            rows.append(Row(b=f"b{b}", t=f"t{j}", v=float(data[b, j])))
    out = friedman_test(
        spark.createDataFrame(rows), "b", "t", "v"
    ).collect()[0]
    q = np.round(data * 100)
    ranks = np.zeros_like(q)
    for b in range(n_blocks):
        row = q[b]
        order = np.argsort(row, kind="mergesort")
        rr = np.empty(k)
        sv = row[order]
        i = 0
        while i < k:
            j = i
            while j < k and sv[j] == sv[i]:
                j += 1
            rr[order[i:j]] = (i + j + 1) / 2.0
            i = j
        ranks[b] = rr
    rj = ranks.sum(axis=0)
    a_stat = (ranks**2).sum()
    c_stat = n_blocks * k * (k + 1) ** 2 / 4.0
    num = ((rj - n_blocks * (k + 1) / 2.0) ** 2).sum()
    chi2_ref = (k - 1) * num / (a_stat - c_stat)
    assert (out.n_blocks, out.k, out.df, out.n_dropped) == (25, 4, 3, 0)
    assert out.chi2 == pytest.approx(chi2_ref, abs=1e-9)
    assert out.chi2 > 7.8  # planted treatment effect detected


def test_friedman_incomplete_blocks_dropped(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import friedman_test

    rows = [
        Row(b="b0", t="x", v=1.0), Row(b="b0", t="y", v=2.0),
        Row(b="b1", t="x", v=2.0), Row(b="b1", t="y", v=1.0),
        Row(b="b2", t="x", v=3.0),  # incomplete: y missing
    ]
    out = friedman_test(
        spark.createDataFrame(rows), "b", "t", "v"
    ).collect()[0]
    assert (out.n_blocks, out.n_dropped, out.k) == (2, 1, 2)


def test_readability_panel_hand_example(spark):
    from dlp_rdb_bq_import_spark.operators.text import readability_panel

    text = "The cat sat on the mat. It purred!"
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = readability_panel(df).collect()[0]
    # letters: thecatsatonthemat itpurred -> 17 + 8 = 25; words 8; sentences 2
    assert (out.n_letters, out.n_words, out.n_sentences) == (25, 8, 2)
    cli = 0.0588 * (25 / 8 * 100) - 0.296 * (2 / 8 * 100) - 15.8
    ari = 4.71 * (25 / 8) + 0.5 * (8 / 2) - 21.43
    assert out.coleman_liau == pytest.approx(cli, abs=1e-9)
    assert out.ari == pytest.approx(ari, abs=1e-9)
    # empty text: counts zero, scores NULL
    empty = readability_panel(
        spark.createDataFrame([Row(doc_id=2, text="")])
    ).collect()[0]
    assert empty.n_words == 0 and empty.coleman_liau is None


def test_honore_sichel_hand_example(spark):
    from dlp_rdb_bq_import_spark.operators.text import honore_sichel

    # tokens: a a a b b c d -> N=7 V=4 V1(c,d)=2 V2(b)=1
    df = spark.createDataFrame([Row(text="a a a b b c d")])
    out = honore_sichel(df).collect()[0]
    assert (out.n_tokens, out.vocab, out.hapax, out.dis) == (7, 4, 2, 1)
    assert out.honore_r == pytest.approx(100 * np.log(7) / (1 - 2 / 4), abs=1e-9)
    assert out.sichel_s == pytest.approx(0.25, abs=1e-12)
    # all-hapax corpus: R diverges -> NULL
    out2 = honore_sichel(spark.createDataFrame([Row(text="x y z")])).collect()[0]
    assert out2.honore_r is None and out2.sichel_s == 0.0


def test_fleiss_kappa_matches_reference(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import fleiss_kappa

    rng = np.random.RandomState(27)
    n_items, r, k = 60, 4, 3
    cats = ["a", "b", "c"]
    rows = []
    table = np.zeros((n_items, k), dtype=int)
    for i in range(n_items):
        bias = rng.randint(0, k)
        for _ in range(r):
            c = bias if rng.random() < 0.7 else rng.randint(0, k)
            table[i, c] += 1
            rows.append(Row(i=f"i{i}", r=cats[c]))
    out = fleiss_kappa(spark.createDataFrame(rows), "i", "r").collect()[0]
    p_i = ((table**2).sum(axis=1) - r) / (r * (r - 1))
    p_bar = p_i.mean()
    p_j = table.sum(axis=0) / (n_items * r)
    p_e = (p_j**2).sum()
    kappa_ref = (p_bar - p_e) / (1 - p_e)
    assert (out.n, out.r, out.k, out.n_dropped) == (60, 4, 3, 0)
    assert out.p_bar == pytest.approx(p_bar, abs=1e-9)
    assert out.p_e == pytest.approx(p_e, abs=1e-9)
    assert out.kappa == pytest.approx(kappa_ref, abs=1e-9)
    assert out.kappa > 0.2  # the 70% bias shows as real agreement


def test_fleiss_kappa_drops_off_modal_items(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import fleiss_kappa

    rows = (
        [Row(i=f"i{j}", r=v) for j in range(5) for v in ("a", "b")]
        + [Row(i="odd", r="a")]  # 1 assignment: off-modal, dropped
    )
    out = fleiss_kappa(spark.createDataFrame(rows), "i", "r").collect()[0]
    assert (out.n, out.r, out.n_dropped) == (5, 2, 1)


def test_theils_u_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import theils_u

    rng = np.random.RandomState(28)
    x = rng.choice(["p", "q", "s"], 800, p=[0.5, 0.3, 0.2])
    y = np.where(
        (x == "p") & (rng.random(800) < 0.7), "m",
        rng.choice(["m", "n"], 800),
    )
    df = spark.createDataFrame([Row(x=str(a), y=str(b)) for a, b in zip(x, y)])
    out = theils_u(df, "x", "y").collect()[0]

    def h(arr):
        _, c = np.unique(arr, return_counts=True)
        p = c / len(arr)
        return -(p * np.log(p)).sum()

    hx, hy = h(x), h(y)
    hxy = h(np.array([a + "\x1f" + b for a, b in zip(x, y)]))
    mi = hx + hy - hxy
    assert out.n == 800
    assert out.h_x == pytest.approx(hx, abs=1e-6)
    assert out.h_y == pytest.approx(hy, abs=1e-6)
    assert out.mi == pytest.approx(mi, abs=1e-6)
    assert out.u_yx == pytest.approx(mi / hy, abs=1e-6)
    assert out.u_xy == pytest.approx(mi / hx, abs=1e-6)
    assert 0 < out.u_yx < 1 and out.u_yx != out.u_xy  # asymmetric


def test_theils_u_single_category_null(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import theils_u

    df = spark.createDataFrame([Row(x="a", y="m"), Row(x="b", y="m")])
    out = theils_u(df, "x", "y").collect()[0]
    assert out.h_y == 0.0 and out.u_yx is None and out.u_xy == 0.0


def test_partial_correlation_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import partial_correlation

    rng = np.random.RandomState(29)
    z = np.round(rng.normal(50, 10, 400), 2)
    x = np.round(z * 0.5 + rng.normal(0, 5, 400), 2)
    y = np.round(z * 0.8 + rng.normal(0, 5, 400), 2)  # x-y linked via z
    df = spark.createDataFrame(
        [Row(x=float(a), y=float(b), z=float(c)) for a, b, c in zip(x, y, z)]
    )
    out = partial_correlation(df, "x", "y", "z").collect()[0]
    qx, qy, qz = np.round(x * 100), np.round(y * 100), np.round(z * 100)
    r_xy = np.corrcoef(qx, qy)[0, 1]
    r_xz = np.corrcoef(qx, qz)[0, 1]
    r_yz = np.corrcoef(qy, qz)[0, 1]
    ref = (r_xy - r_xz * r_yz) / np.sqrt((1 - r_xz**2) * (1 - r_yz**2))
    assert out.n == 400
    assert out.r_xy == pytest.approx(r_xy, abs=1e-6)
    assert out.r_xy_given_z == pytest.approx(ref, abs=1e-6)
    # the raw correlation is strong but vanishes given z
    assert abs(out.r_xy) > 0.4 and abs(out.r_xy_given_z) < 0.15


def test_partial_correlation_constant_z_null(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import partial_correlation

    df = spark.createDataFrame(
        [Row(x=float(i), y=float(i * 2), z=5.0) for i in range(10)]
    )
    out = partial_correlation(df, "x", "y", "z").collect()[0]
    assert out.r_xy_given_z is None


@pytest.mark.parametrize("n_slices", [1, 3])
def test_streaming_mase_equals_batch(spark, n_slices):
    from dlp_rdb_bq_import_spark.operators.timeseries import mase_seasonal_naive
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_mase

    rng = np.random.RandomState(30)
    vals = [
        float(round(1000 + 150 * np.sin(d * 2 * np.pi / 7) + float(v), 2))
        for d, v in enumerate(rng.normal(0, 20, 24))
    ]
    rows = []
    for d, v in enumerate(vals):
        for h in (4, 16):  # two events per day: slices can split a day
            rows.append(Row(ts=f"2024-02-{d + 1:02d} {h:02d}:00:00", value=v / 2))
    df = spark.createDataFrame(rows)
    batch = mase_seasonal_naive(df, ts_col="ts", value_col="value").collect()[0]
    stream = streaming_mase(spark, df, n_slices=n_slices).collect()[0]
    assert stream.asDict() == batch.asDict()
    assert stream.mase is not None


def test_weighted_kappa_matches_reference(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import weighted_kappa

    rng = np.random.RandomState(31)
    cats = ["low", "mid", "high"]
    true = rng.randint(0, 3, 300)
    pred = np.clip(true + rng.choice([-1, 0, 0, 0, 1], 300), 0, 2)
    df = spark.createDataFrame(
        [Row(ra=cats[a], rb=cats[b]) for a, b in zip(true, pred)]
    )
    out = weighted_kappa(df, "ra", "rb", cats).collect()[0]
    k = 3
    obs = np.zeros((k, k))
    for a, b in zip(true, pred):
        obs[a, b] += 1
    w = np.array([[(i - j) ** 2 for j in range(k)] for i in range(k)])
    n = obs.sum()
    e = np.outer(obs.sum(1), obs.sum(0)) / n
    ref = 1 - (w * obs).sum() / (w * e).sum()
    assert out.n == 300
    assert out.kappa_w == pytest.approx(ref, abs=1e-9)
    assert out.kappa_w > 0.5  # mostly-on-diagonal: strong agreement
    # linear weights differ from quadratic on the same data
    lin = weighted_kappa(df, "ra", "rb", cats, weights="linear").collect()[0]
    wl = np.array([[abs(i - j) for j in range(k)] for i in range(k)])
    ref_l = 1 - (wl * obs).sum() / (wl * e).sum()
    assert lin.kappa_w == pytest.approx(ref_l, abs=1e-9)
    with pytest.raises(ValueError, match="linear"):
        weighted_kappa(df, "ra", "rb", cats, weights="cubic")
    with pytest.raises(ValueError, match="distinct"):
        weighted_kappa(df, "ra", "rb", ["low", "low"])


def test_cohens_h_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cohens_h

    rows = (
        [Row(g=True, y=bool(i < 30)) for i in range(100)]
        + [Row(g=False, y=bool(i < 15)) for i in range(120)]
    )
    out = cohens_h(spark.createDataFrame(rows), "g", "y").collect()[0]
    ref = 2 * np.arcsin(np.sqrt(0.3)) - 2 * np.arcsin(np.sqrt(15 / 120))
    assert (out.n_a, out.n_b) == (100, 120)
    assert out.p_a == pytest.approx(0.3, abs=1e-12)
    assert out.cohens_h == pytest.approx(ref, abs=1e-9)
    # empty group: NULL
    out2 = cohens_h(
        spark.createDataFrame([Row(g=True, y=True)]), "g", "y"
    ).collect()[0]
    assert out2.cohens_h is None


def test_risk_ratio_matches_reference(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import risk_ratio_ci

    rows = (
        [Row(e=True, y=True)] * 40 + [Row(e=True, y=False)] * 60
        + [Row(e=False, y=True)] * 20 + [Row(e=False, y=False)] * 80
    )
    out = risk_ratio_ci(spark.createDataFrame(rows), "e", "y").collect()[0]
    rr = (40 / 100) / (20 / 100)
    se = np.sqrt(1 / 40 - 1 / 100 + 1 / 20 - 1 / 100)
    assert out.risk_ratio == pytest.approx(rr, abs=1e-9)
    assert out.ci_low == pytest.approx(np.exp(np.log(rr) - 1.959963985 * se), abs=1e-6)
    assert out.ci_high == pytest.approx(np.exp(np.log(rr) + 1.959963985 * se), abs=1e-6)
    # zero positive cell: NULL (log undefined)
    out2 = risk_ratio_ci(
        spark.createDataFrame(
            [Row(e=True, y=False)] * 5 + [Row(e=False, y=True)] * 5
        ),
        "e", "y",
    ).collect()[0]
    assert out2.risk_ratio is None


def test_diversity_profile_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import diversity_profile

    rng = np.random.RandomState(32)
    cats = rng.choice(["a", "b", "c", "d"], 600, p=[0.4, 0.3, 0.2, 0.1])
    out = diversity_profile(
        spark.createDataFrame([Row(c=str(v)) for v in cats]), "c"
    ).collect()[0]
    _, counts = np.unique(cats, return_counts=True)
    n = counts.sum()
    p = counts / n
    shannon = -(p * np.log(p)).sum()
    simpson = (counts * (counts - 1)).sum() / (n * (n - 1))
    assert (out.n, out.k) == (600, 4)
    assert out.shannon == pytest.approx(shannon, abs=1e-6)
    assert out.evenness == pytest.approx(shannon / np.log(4), abs=1e-6)
    assert out.simpson == pytest.approx(simpson, abs=1e-9)
    assert out.inv_simpson == pytest.approx(1 / simpson, abs=1e-6)
    # single category: evenness NULL, simpson 1
    out2 = diversity_profile(
        spark.createDataFrame([Row(c="only")] * 5), "c"
    ).collect()[0]
    assert out2.k == 1 and out2.evenness is None and out2.simpson == 1.0
