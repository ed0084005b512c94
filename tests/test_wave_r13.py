"""Unit tests for the round-13 operator wave: effect size, odds ratio,
Cronbach's α, Hosmer–Lemeshow, Brown–Forsythe, Kendall τ-b, max
drawdown, OLS trend, local clustering, k-fold target encoding, feature
scalers, lexical richness, MRR/MAP. Each test pins the operator to an
independent reference (hand arithmetic or numpy), not to itself."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
import pyspark.sql.functions as F


# ----------------------------------------------------------- effect size


def test_cohens_d_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cohens_d_effect_size

    rng = np.random.RandomState(7)
    a = np.round(rng.normal(10, 2, 400), 2)
    b = np.round(rng.normal(9, 2, 300), 2)
    rows = [Row(g=True, v=float(x)) for x in a] + [
        Row(g=False, v=float(x)) for x in b
    ]
    out = cohens_d_effect_size(spark.createDataFrame(rows), "g", "v").collect()[0]
    ai = np.round(a * 100)
    bi = np.round(b * 100)
    pooled = (
        (len(ai) - 1) * ai.var(ddof=1) + (len(bi) - 1) * bi.var(ddof=1)
    ) / (len(ai) + len(bi) - 2)
    d = (ai.mean() - bi.mean()) / math.sqrt(pooled)
    g = d * (1 - 3 / (4 * (len(ai) + len(bi)) - 9))
    assert out["n_a"] == 400 and out["n_b"] == 300
    assert abs(out["cohens_d"] - d) < 1e-7
    assert abs(out["hedges_g"] - g) < 1e-7


def test_cohens_d_degenerate_null(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cohens_d_effect_size

    df = spark.createDataFrame([Row(g=True, v=1.0), Row(g=False, v=2.0)])
    out = cohens_d_effect_size(df, "g", "v").collect()[0]
    assert out["cohens_d"] is None  # n < 2 per group


# ------------------------------------------------------------ odds ratio


def test_odds_ratio_hand_2x2(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import odds_ratio_ci

    rows = (
        [Row(e=True, y=True)] * 30
        + [Row(e=True, y=False)] * 10
        + [Row(e=False, y=True)] * 15
        + [Row(e=False, y=False)] * 45
    )
    out = odds_ratio_ci(spark.createDataFrame(rows), "e", "y").collect()[0]
    orr = (30 * 45) / (10 * 15)
    se = math.sqrt(1 / 30 + 1 / 10 + 1 / 15 + 1 / 45)
    assert out["odds_ratio"] == round(orr, 9)
    assert abs(out["ci_low"] - orr * math.exp(-1.959963985 * se)) < 1e-6
    assert abs(out["ci_high"] - orr * math.exp(1.959963985 * se)) < 1e-6


def test_odds_ratio_zero_cell_null(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import odds_ratio_ci

    rows = [Row(e=True, y=True)] * 5 + [Row(e=False, y=False)] * 5
    out = odds_ratio_ci(spark.createDataFrame(rows), "e", "y").collect()[0]
    assert out["odds_ratio"] is None and out["ci_low"] is None


# --------------------------------------------------------------- cronbach


def test_cronbach_parallel_vs_independent_items(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cronbach_alpha

    rng = np.random.RandomState(3)
    base = rng.normal(50, 10, 500)
    # parallel items: same construct + small noise → α near 1
    par = spark.createDataFrame(
        [
            Row(
                a=float(round(x + rng.normal(0, 1), 2)),
                b=float(round(x + rng.normal(0, 1), 2)),
                c=float(round(x + rng.normal(0, 1), 2)),
            )
            for x in base
        ]
    )
    hi = cronbach_alpha(par, ["a", "b", "c"]).collect()[0]
    assert hi["alpha"] > 0.95 and hi["k"] == 3
    # independent items → α near 0
    ind = spark.createDataFrame(
        [
            Row(
                a=float(round(rng.normal(0, 10), 2)),
                b=float(round(rng.normal(0, 10), 2)),
                c=float(round(rng.normal(0, 10), 2)),
            )
            for _ in range(500)
        ]
    )
    lo = cronbach_alpha(ind, ["a", "b", "c"]).collect()[0]
    assert abs(lo["alpha"]) < 0.25
    with pytest.raises(ValueError):
        cronbach_alpha(par, ["a"])


# -------------------------------------------------------- hosmer-lemeshow


def test_hosmer_lemeshow_calibrated_vs_shifted(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import hosmer_lemeshow_test

    rng = np.random.RandomState(11)
    p = rng.uniform(0.05, 0.95, 4000)
    y_cal = rng.uniform(size=4000) < p  # labels drawn AT the stated prob
    cal = spark.createDataFrame(
        [Row(s=float(round(pi, 4)), y=bool(yi)) for pi, yi in zip(p, y_cal)]
    )
    out_cal = hosmer_lemeshow_test(cal, "s", "y").collect()[0]
    # χ²(8) 99th percentile ≈ 20.1 — a calibrated scorer sits far below
    assert out_cal["chi2"] < 30 and out_cal["dof"] == out_cal["n_bins"] - 2
    y_shift = rng.uniform(size=4000) < np.clip(p + 0.25, 0, 1)
    shift = spark.createDataFrame(
        [Row(s=float(round(pi, 4)), y=bool(yi)) for pi, yi in zip(p, y_shift)]
    )
    out_shift = hosmer_lemeshow_test(shift, "s", "y").collect()[0]
    assert out_shift["chi2"] > 100  # gross miscalibration flagged


# --------------------------------------------------------- brown-forsythe


def test_brown_forsythe_equal_vs_inflated_spread(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import brown_forsythe_test

    rng = np.random.RandomState(5)
    rows = [
        Row(g="a", v=float(round(x, 2)))
        for x in rng.normal(100, 5, 800)
    ] + [Row(g="b", v=float(round(x, 2))) for x in rng.normal(50, 5, 800)]
    same = brown_forsythe_test(spark.createDataFrame(rows), "g", "v").collect()[0]
    assert same["f_stat"] < 4  # equal spreads (means differ — irrelevant)
    rows2 = [
        Row(g="a", v=float(round(x, 2)))
        for x in rng.normal(100, 5, 800)
    ] + [Row(g="b", v=float(round(x, 2))) for x in rng.normal(100, 25, 800)]
    diff = brown_forsythe_test(spark.createDataFrame(rows2), "g", "v").collect()[0]
    assert diff["f_stat"] > 100
    assert diff["dof1"] == 1 and diff["dof2"] == 1598


# ------------------------------------------------------------ kendall tau


def _tau_b_reference(x, y):
    """O(n²) textbook τ-b (the scipy convention)."""
    n = len(x)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (x[i] - x[j]) * (y[i] - y[j])
            if s > 0:
                c += 1
            elif s < 0:
                d += 1
    n0 = n * (n - 1) // 2
    from collections import Counter

    n1 = sum(t * (t - 1) // 2 for t in Counter(x).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y).values())
    return (c - d) / math.sqrt((n0 - n1) * (n0 - n2))


def test_kendall_tau_b_matches_reference(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import kendall_tau_b

    rng = np.random.RandomState(9)
    x = rng.randint(1, 8, 300)
    y = (x + rng.randint(0, 5, 300)).astype(int)  # positive + ties
    df = spark.createDataFrame(
        [Row(x=float(a), y=float(b)) for a, b in zip(x, y)]
    )
    out = kendall_tau_b(df, "x", "y", x_scale=1, y_scale=1).collect()[0]
    assert abs(out["tau_b"] - _tau_b_reference(list(x), list(y))) < 1e-9
    assert out["concordant"] + out["discordant"] <= 300 * 299 / 2


def test_kendall_tau_perfect_orders(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import kendall_tau_b

    up = spark.createDataFrame([Row(x=float(i), y=float(i * 2)) for i in range(50)])
    assert kendall_tau_b(up, "x", "y", x_scale=1, y_scale=1).collect()[0]["tau_b"] == 1.0
    dn = spark.createDataFrame([Row(x=float(i), y=float(-i)) for i in range(50)])
    assert kendall_tau_b(dn, "x", "y", x_scale=1, y_scale=1).collect()[0]["tau_b"] == -1.0


# ------------------------------------------------------------ max drawdown


def test_max_drawdown_planted_slump(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import max_drawdown

    # 30 days at 100/day, except days 10-14 at 40/day: the demeaned
    # cumulative bottoms at day 14 with drawdown 5*(100-40+mean-shift)…
    # compute the reference directly
    vals = [100.0] * 30
    for i in range(10, 15):
        vals[i] = 40.0
    rows = [
        Row(ts=f"2024-01-{d + 1:02d} 12:00:00", v=vals[d]) for d in range(30)
    ]
    out = max_drawdown(
        spark.createDataFrame(rows), ts_col="ts", value_col="v"
    ).collect()[0]
    mean = sum(vals) / 30
    cum, peak, mdd, trough = 0.0, 0.0, 0.0, None
    for d in range(30):
        cum += vals[d] - mean
        peak = max(peak, cum)
        if peak - cum > mdd:
            mdd, trough = peak - cum, d + 1
    assert out["n_days"] == 30
    assert abs(out["max_drawdown"] - mdd) < 1e-9
    assert out["trough_day"].day == trough


def test_max_drawdown_flat_series_zero(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import max_drawdown

    rows = [Row(ts=f"2024-02-{d + 1:02d}", v=10.0) for d in range(9)]
    out = max_drawdown(
        spark.createDataFrame(rows), ts_col="ts", value_col="v"
    ).collect()[0]
    assert out["max_drawdown"] == 0.0 and out["trough_day"] is None


# --------------------------------------------------------------- ols trend


def test_ols_trend_exact_line(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import ols_trend

    rows = [
        Row(ts=f"2024-03-{d + 1:02d}", v=float(5 + 3 * d)) for d in range(20)
    ]
    out = ols_trend(spark.createDataFrame(rows), ts_col="ts", value_col="v").collect()[0]
    assert out["slope"] == 3.0 and out["intercept"] == 5.0
    assert out["r2"] == 1.0 and out["se_slope"] is None  # zero residual


def test_ols_trend_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import ols_trend

    rng = np.random.RandomState(2)
    y = np.round(100 + 2.5 * np.arange(40) + rng.normal(0, 5, 40), 2)
    rows = [Row(ts=f"2024-01-{d + 1:02d}" if d < 31 else f"2024-02-{d - 30:02d}", v=float(y[d])) for d in range(40)]
    out = ols_trend(spark.createDataFrame(rows), ts_col="ts", value_col="v").collect()[0]
    x = np.arange(40)
    yi = np.round(y * 100)  # the operator's cents quantization
    b, a = np.polyfit(x, yi, 1)
    sse = float(((yi - (a + b * x)) ** 2).sum())
    se_b = math.sqrt(sse / 38 / float(((x - x.mean()) ** 2).sum()))
    assert abs(out["slope"] - b / 100) < 1e-6
    assert abs(out["se_slope"] - se_b / 100) < 1e-6
    assert abs(out["t_stat"] - b / se_b) < 1e-4


# ----------------------------------------------------------- clustering


def test_local_clustering_triangle_path_star(spark):
    from dlp_rdb_bq_import_spark.operators.graph import local_clustering

    edges = spark.createDataFrame(
        [  # triangle 1-2-3; path 4-5-6; star 7-(8,9,10)
            Row(src=1, dst=2), Row(src=2, dst=3), Row(src=1, dst=3),
            Row(src=4, dst=5), Row(src=5, dst=6),
            Row(src=7, dst=8), Row(src=7, dst=9), Row(src=7, dst=10),
        ]
    )
    got = {r.node: (r.degree, r.triangles, r.clustering) for r in local_clustering(edges).collect()}
    assert got[1] == (2, 1, 1.0) and got[2] == (2, 1, 1.0) and got[3] == (2, 1, 1.0)
    assert got[5] == (2, 0, 0.0)  # path center: neighbors unconnected
    assert got[4][2] is None and got[6][2] is None  # degree 1: undefined
    assert got[7] == (3, 0, 0.0)  # star center


# --------------------------------------------------- kfold target encoding


def test_kfold_target_encoding_is_leakage_safe(spark):
    from dlp_rdb_bq_import_spark.operators.features import kfold_target_encode
    from dlp_rdb_bq_import_spark.operators.sampling import hash_uniform

    # one poisoned row: category "x" has label 1000 in exactly one row;
    # the encoding for THAT row's fold must not contain it
    rows = [Row(id=i, cat="x", y=10.0) for i in range(100)]
    rows.append(Row(id=999, cat="x", y=1000.0))
    rows += [Row(id=2000 + i, cat="z", y=20.0) for i in range(100)]
    df = spark.createDataFrame(rows)
    enc = {
        (r["category"], r["fold"]): r["enc"]
        for r in kfold_target_encode(
            df, "cat", "y", "id", k=5, smoothing=0
        ).collect()
    }
    poisoned_fold = df.where(F.col("id") == 999).select(
        F.floor(hash_uniform(F.col("id")) * 5).cast("long").alias("f")
    ).collect()[0]["f"]
    # out-of-fold mean for the poisoned row's fold excludes the 1000
    assert abs(enc[("x", poisoned_fold)] - 10.0) < 0.5
    # any OTHER fold's encoding includes it (mean pulled up)
    other = next(
        f for (cat, f) in enc if cat == "x" and f != poisoned_fold
    )
    assert enc[("x", other)] > 15.0


def test_kfold_guards(spark):
    from dlp_rdb_bq_import_spark.operators.features import kfold_target_encode

    df = spark.createDataFrame([Row(id=1, cat="a", y=1.0)])
    with pytest.raises(ValueError):
        kfold_target_encode(df, "cat", "y", "id", k=1)


# ------------------------------------------------------------- scalers


def test_scale_features_known_vector(spark):
    from dlp_rdb_bq_import_spark.operators.features import scale_features

    vals = [10.0, 20.0, 30.0, 40.0, 50.0]
    df = spark.createDataFrame([Row(id=i, v=v) for i, v in enumerate(vals)])
    got = {r.id: r for r in scale_features(df, "id", "v").collect()}
    assert got[0]["minmax"] == 0.0 and got[4]["minmax"] == 1.0
    assert got[2]["minmax"] == 0.5 and got[2]["zscore"] == 0.0
    cents = np.array(vals) * 100
    z = (cents - cents.mean()) / cents.std(ddof=1)
    assert abs(got[4]["zscore"] - round(float(z[4]), 9)) < 1e-9
    # robust: med 3000, IQR = q3 − q1 = 4000 − 2000 = 2000 (R-7)
    assert got[4]["robust"] == 1.0 and got[0]["robust"] == -1.0


# --------------------------------------------------------- lexical richness


def test_lexical_richness_hand_spectrum(spark):
    from dlp_rdb_bq_import_spark.operators.text import lexical_richness

    # tokens: a a a b b c → N=6, V=3, Σc² = 9+4+1 = 14
    df = spark.createDataFrame([Row(text="a a a b b c")])
    out = lexical_richness(df).collect()[0]
    assert (out["n_tokens"], out["vocab"], out["hapax"]) == (6, 3, 1)
    assert out["yules_k"] == round(1e4 * (14 - 6) / 36, 9)
    assert out["herdan_c"] == round(math.log(3) / math.log(6), 9)
    assert out["hapax_ratio"] == round(1 / 3, 9)


def test_lexical_richness_template_spam_high_k(spark):
    from dlp_rdb_bq_import_spark.operators.text import lexical_richness

    spam = spark.createDataFrame([Row(text="buy now " * 500)])
    diverse = spark.createDataFrame(
        [Row(text=" ".join(f"w{i}" for i in range(1000)))]
    )
    k_spam = lexical_richness(spam).collect()[0]["yules_k"]
    k_div = lexical_richness(diverse).collect()[0]["yules_k"]
    assert k_spam > 100 * max(k_div, 1e-9)


# ----------------------------------------------------------------- mrr/map


def test_rank_eval_hand_run(spark):
    from dlp_rdb_bq_import_spark.operators.retrieval import rank_eval_at_k

    # q1: relevant docs {2, 5, 9}; run ranks docs 1..10 as-is →
    # hits at ranks 2, 5, 9: AP = (1/2 + 2/5 + 3/9)/3; RR = 1/2
    run = spark.createDataFrame(
        [Row(query_id="q1", doc_id=i, rank=i) for i in range(1, 11)]
    )
    qrels = spark.createDataFrame(
        [Row(query_id="q1", doc_id=d, gain=1) for d in (2, 5, 9)]
        + [Row(query_id="q1", doc_id=1, gain=0)]
    )
    out = rank_eval_at_k(run, qrels, k=10).collect()[0]
    ap = (1 / 2 + 2 / 5 + 3 / 9) / 3
    assert out["n_queries"] == 1
    assert abs(out["mrr"] - 0.5) < 1e-9
    assert abs(out["map_at_k"] - ap) < 1e-9


def test_rank_eval_missing_relevant_counts_zero(spark):
    from dlp_rdb_bq_import_spark.operators.retrieval import rank_eval_at_k

    run = spark.createDataFrame(
        [Row(query_id="q1", doc_id=i, rank=i) for i in range(1, 6)]
    )
    qrels = spark.createDataFrame(
        [
            Row(query_id="q1", doc_id=3, gain=1),
            Row(query_id="q2", doc_id=77, gain=1),  # never retrieved
        ]
    )
    out = rank_eval_at_k(run, qrels, k=5).collect()[0]
    assert out["n_queries"] == 2
    assert abs(out["mrr"] - (1 / 3) / 2) < 1e-9
    assert abs(out["map_at_k"] - (1 / 3) / 2) < 1e-9
