"""Property tests for wave H: weighted median vs a direct numpy scan,
Kaplan-Meier vs an independent product-limit computation (with the
censoring-bias demonstration), and CUPED vs the closed-form numpy
adjustment (with the variance-actually-drops property)."""

from __future__ import annotations

import numpy as np
import pytest


def test_weighted_median_matches_reference(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import weighted_median

    rng = np.random.RandomState(2)
    v = np.round(rng.gamma(3, 20, 300), 2)
    w = rng.randint(1, 9, 300)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(v, w)], "v double, w long"
    )
    r = weighted_median(df, "v", "w").collect()[0]
    order = np.argsort(v, kind="mergesort")
    cw = np.cumsum(w[order])
    ref = v[order][np.searchsorted(2 * cw, w.sum(), side="left")]
    assert r.wmedian == pytest.approx(ref)
    assert r.total_w == int(w.sum())
    # uniform weights reduce to the lower median of values
    ones = spark.createDataFrame(
        [(float(a), 1) for a in [1.0, 2.0, 3.0, 4.0]], "v double, w long"
    )
    assert weighted_median(ones, "v", "w").collect()[0].wmedian == 2.0
    # one dominant weight owns the median; zero/negative weights drop
    dom = spark.createDataFrame(
        [(1.0, 1), (2.0, 100), (3.0, 1), (9.0, 0), (9.5, -4)],
        "v double, w long",
    )
    r = weighted_median(dom, "v", "w").collect()[0]
    assert r.wmedian == 2.0 and r.total_w == 102
    e = spark.createDataFrame([], "v double, w long")
    assert weighted_median(e, "v", "w").collect()[0].wmedian is None


def _km_ref(durations, events):
    import collections

    per = collections.defaultdict(lambda: [0, 0])
    for t, ev in zip(durations, events):
        per[t][0 if ev else 1] += 1
    total = len(durations)
    out = {}
    seen = 0
    lmicro = 0
    dead = False
    for t in sorted(per):
        d, c = per[t]
        n_risk = total - seen
        if d == n_risk and d > 0:
            dead = True
        elif d > 0:
            lmicro += round(np.log((n_risk - d) / n_risk) * 1e6)
        out[t] = (n_risk, d, c, 0.0 if dead else round(np.exp(lmicro / 1e6), 9))
        seen += d + c
    return out


def test_kaplan_meier_matches_reference_and_censoring_matters(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import kaplan_meier

    rng = np.random.RandomState(11)
    dur = rng.randint(0, 40, 400)
    ev = rng.rand(400) < 0.6  # 40% right-censored
    df = spark.createDataFrame(
        [(int(t), bool(e)) for t, e in zip(dur, ev)], "t long, ev boolean"
    )
    rows = {r.t: r for r in kaplan_meier(df, duration_col="t", event_col="ev").collect()}
    ref = _km_ref(dur, ev)
    assert set(rows) == set(ref)
    for t, (n_risk, d, c, s) in ref.items():
        r = rows[t]
        assert (r.n_risk, r.d, r.c) == (n_risk, d, c), t
        assert r.survival == pytest.approx(s, abs=1e-9), t
    # survival is non-increasing and in [0, 1]
    ordered = [rows[t].survival for t in sorted(rows)]
    assert all(1 >= a >= b >= 0 for a, b in zip(ordered, ordered[1:]))
    # censoring-aware beats the naive estimate: treating censored as
    # events pushes the curve DOWN everywhere events remain
    naive = _km_ref(dur, np.ones_like(ev, dtype=bool))
    t_mid = sorted(ref)[len(ref) // 2]
    assert naive[t_mid][3] < ref[t_mid][3]
    # everyone-fails-at-once terminates at exactly 0
    allfail = spark.createDataFrame([(5, True)] * 10, "t long, ev boolean")
    r = kaplan_meier(allfail, duration_col="t", event_col="ev").collect()[0]
    assert r.survival == 0.0 and r.n_risk == 10


def test_cuped_matches_closed_form_and_reduces_variance(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cuped_adjustment

    rng = np.random.RandomState(23)
    n = 600
    x = np.round(rng.gamma(4, 25, n), 2)  # sticky pre-period covariate
    lift = np.where(np.arange(n) % 2 == 0, 5.0, 0.0)
    y = np.round(0.8 * x + rng.normal(0, 8, n) + lift, 2)
    df = spark.createDataFrame(
        [(str(i % 2), float(yy), float(xx)) for i, (yy, xx) in enumerate(zip(y, x))],
        "variant string, y double, x double",
    )
    rows = {r.variant: r for r in cuped_adjustment(df, "variant", "y", "x").collect()}
    xq = np.round(x * 100).astype(np.int64)
    yq = np.round(y * 100).astype(np.int64)
    covn = float(n * (xq * yq).sum() - xq.sum() * yq.sum())
    varxn = float(n * (xq * xq).sum() - xq.sum() ** 2)
    varyn = float(n * (yq * yq).sum() - yq.sum() ** 2)
    theta = covn / varxn
    xbar = xq.sum() / n / 100
    for g in ("0", "1"):
        mask = (np.arange(n) % 2) == int(g)
        my = yq[mask].sum() / mask.sum() / 100
        mx = xq[mask].sum() / mask.sum() / 100
        assert rows[g].mean_y == pytest.approx(my, abs=1e-9)
        assert rows[g].mean_adj == pytest.approx(my - theta * (mx - xbar), abs=1e-6)
        assert rows[g].theta == pytest.approx(theta, abs=1e-9)
        assert rows[g].var_reduction == pytest.approx(
            covn * covn / (varxn * varyn), abs=1e-9
        )
    # the adjusted lift matches the raw lift (unbiased)...
    raw_lift = rows["0"].mean_y - rows["1"].mean_y
    adj_lift = rows["0"].mean_adj - rows["1"].mean_adj
    assert adj_lift == pytest.approx(5.0, abs=1.5)
    assert raw_lift == pytest.approx(adj_lift, abs=3.0)
    # ...and the adjustment genuinely removes variance (corr² is large
    # by construction: y ≈ 0.8x + noise)
    assert rows["0"].var_reduction > 0.5
    # zero-variance covariate -> NULL theta/adjusted
    flat = spark.createDataFrame(
        [("0", 1.0, 7.0), ("1", 2.0, 7.0)], "variant string, y double, x double"
    )
    r = cuped_adjustment(flat, "variant", "y", "x").collect()[0]
    assert r.theta is None and r.mean_adj is None
