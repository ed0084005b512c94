"""Property tests for the round-11 wave-3 series operators: CUSUM's
scan form pinned to the textbook max(0, S+dev) recursion, ACF pinned
to a direct numpy formula, and the seasonal decomposition recovering a
planted weekly cycle (and returning additive parts that re-sum)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from dlp_rdb_bq_import_spark.operators.timeseries import (
    autocorrelation,
    cusum_changepoints,
    seasonal_decompose,
)


def _series_df(spark, values, start="2023-01-01"):
    d0 = dt.date.fromisoformat(start)
    rows = [
        (dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time(12)), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "ts timestamp, v double")


def test_cusum_matches_recursion_and_flags_shift(spark):
    rng = np.random.RandomState(2)
    pre = rng.normal(100.0, 5.0, 60)
    post = rng.normal(130.0, 5.0, 60)  # +30 level shift at day 60
    x = np.round(np.concatenate([pre, post]), 2)
    df = _series_df(spark, x)
    slack, thr = 10_00, 100_00  # $10 slack, $100 threshold (cents)
    out = (
        cusum_changepoints(
            df, ts_col="ts", value_col="v", unit_scale=100,
            slack_units=slack, threshold_units=thr,
        )
        .orderBy("day")
        .collect()
    )
    # textbook recursion reference (exact rational via integers)
    cents = np.round(x * 100).astype(np.int64)
    n, total = len(cents), cents.sum()
    su = sd = 0
    for i, r in enumerate(out):
        du = n * int(cents[i]) - total - n * slack
        dd = n * int(cents[i]) - total + n * slack
        su = max(0, su + du)
        sd = max(0, sd - dd)
        assert r.s_up == pytest.approx(su / (n * 100), abs=1e-9), i
        assert r.s_dn == pytest.approx(sd / (n * 100), abs=1e-9), i
        assert r.alarm_up == (su > n * thr) and r.alarm_dn == (sd > n * thr)
    # the shift is caught: upper alarm in the post regime, and the
    # below-mean pre regime drives the lower chart
    assert any(r.alarm_up for r in out[60:])
    assert not any(r.alarm_up for r in out[:30])


def test_cusum_validation(spark):
    df = _series_df(spark, [1.0, 2.0])
    with pytest.raises(ValueError, match="slack_units/threshold_units"):
        cusum_changepoints(
            df, ts_col="ts", value_col="v", slack_units=-1, threshold_units=5
        )
    with pytest.raises(ValueError, match="unit_scale"):
        cusum_changepoints(
            df, ts_col="ts", value_col="v", unit_scale=0, threshold_units=5
        )


def test_acf_matches_numpy_and_lag_spike(spark):
    rng = np.random.RandomState(4)
    n = 200
    weekly = np.tile([0, 0, 0, 50, 0, 0, 0], n // 7 + 1)[:n]
    x = np.round(rng.normal(100, 3, n) + weekly, 2)
    df = _series_df(spark, x)
    out = {
        r.lag: r
        for r in autocorrelation(
            df, ts_col="ts", value_col="v", max_lag=8, unit_scale=100
        ).collect()
    }
    cents = np.round(x * 100).astype(np.int64)
    mu = cents.mean()
    den = np.sum((cents - mu) ** 2)
    for lag in range(1, 9):
        ref = np.sum((cents[:-lag] - mu) * (cents[lag:] - mu)) / den
        assert out[lag].n_pairs == n - lag
        assert out[lag].acf == pytest.approx(ref, abs=1e-9), lag
    assert out[7].acf > 0.5  # the planted weekly cycle spikes at lag 7
    assert abs(out[1].acf) < out[7].acf
    with pytest.raises(ValueError, match="max_lag"):
        autocorrelation(df, ts_col="ts", value_col="v", max_lag=0)


def test_seasonal_decompose_recovers_planted_cycle(spark):
    rng = np.random.RandomState(6)
    n = 140
    base = rng.normal(100, 1, n)
    d0 = dt.date.fromisoformat("2023-01-01")
    dows = np.array([(d0 + dt.timedelta(days=i)).isoweekday() % 7 + 1
                     for i in range(n)])  # Spark: 1=Sunday
    x = np.round(base + np.where(dows == 2, 30.0, 0.0), 2)  # Monday bump
    df = _series_df(spark, x)
    rows = (
        seasonal_decompose(df, ts_col="ts", value_col="v", unit_scale=100)
        .orderBy("day")
        .collect()
    )
    assert len(rows) == n
    interior = [r for r in rows if r.trend is not None]
    assert len(interior) == n - 6  # 3 edge days each end lack neighbors
    by_dow = {r.dow: r.seasonal for r in rows}
    assert by_dow[2] > 20  # Monday seasonal recovered
    assert all(v < 5 for d, v in by_dow.items() if d != 2)
    # additive identity: x == trend + seasonal + resid on the interior
    for r in interior:
        assert r.x == pytest.approx(r.trend + r.seasonal + r.resid, abs=2e-8)
    # edges: trend and resid NULL, x/dow/seasonal still present
    for r in rows[:3] + rows[-3:]:
        assert r.trend is None and r.resid is None and r.seasonal is not None


def test_seasonal_decompose_gap_masks_neighborhood(spark):
    # remove one day: its 7-day neighborhood (7 surrounding days) loses
    # the full-window trend; the day itself is absent from the output
    vals = [float(100 + i % 5) for i in range(60)]
    df = _series_df(spark, vals)
    df_gap = df.where(F_day_not(df, "2023-01-20"))
    rows = (
        seasonal_decompose(df_gap, ts_col="ts", value_col="v")
        .orderBy("day")
        .collect()
    )
    days = {r.day.isoformat(): r for r in rows}
    assert "2023-01-20" not in days
    for d in ("2023-01-17", "2023-01-18", "2023-01-19",
              "2023-01-21", "2023-01-22", "2023-01-23"):
        assert days[d].trend is None, d
    assert days["2023-01-10"].trend is not None


def F_day_not(df, day_iso):
    from pyspark.sql import functions as F

    return F.to_date("ts") != F.lit(day_iso).cast("date")
