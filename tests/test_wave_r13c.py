"""Round-13 third wave: PACF (Durbin–Levinson over the sample ACF) and
streaming max drawdown (stream ≡ batch across slicings)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row


def _series_df(spark, values, start_day=1):
    rows = []
    for d, v in enumerate(values):
        m, day = divmod(d + start_day - 1, 28)
        rows.append(
            Row(ts=f"2024-{m + 1:02d}-{day + 1:02d} 12:00:00", value=float(v))
        )
    return spark.createDataFrame(rows)


def _pacf_reference(acf, k):
    """Independent Durbin–Levinson (textbook indexing)."""
    out = []
    phi = {}
    for m in range(1, k + 1):
        if m == 1:
            phi[(1, 1)] = acf[1]
        else:
            num = acf[m] - sum(phi[(m - 1, j)] * acf[m - j] for j in range(1, m))
            den = 1 - sum(phi[(m - 1, j)] * acf[j] for j in range(1, m))
            phi[(m, m)] = num / den
            for j in range(1, m):
                phi[(m, j)] = phi[(m - 1, j)] - phi[(m, m)] * phi[(m - 1, m - j)]
        out.append(phi[(m, m)])
    return out


def test_pacf_matches_independent_durbin_levinson(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import autocorrelation, pacf

    rng = np.random.RandomState(8)
    # AR(2)-ish daily series
    x = [50.0, 52.0]
    for _ in range(80):
        x.append(0.6 * x[-1] - 0.3 * x[-2] + 40 + rng.normal(0, 2))
    df = _series_df(spark, [round(v, 2) for v in x])
    acf_rows = autocorrelation(
        df, ts_col="ts", value_col="value", max_lag=5
    ).collect()
    acf = {0: 1.0}
    acf.update({int(r["lag"]): float(r["acf"]) for r in acf_rows})
    want = _pacf_reference(acf, 5)
    got = {
        int(r["lag"]): r["pacf"]
        for r in pacf(df, ts_col="ts", value_col="value", max_lag=5).collect()
    }
    for lag in range(1, 6):
        assert abs(got[lag] - want[lag - 1]) < 1e-9, lag
    # AR(1) signature: pacf(1) ≈ acf(1), pacf(>=2) near zero relative to lag 1
    y = [100.0]
    for _ in range(200):
        y.append(0.7 * y[-1] + 30 + rng.normal(0, 1))
    dfy = _series_df(spark, [round(v, 2) for v in y])
    g = {
        int(r["lag"]): r["pacf"]
        for r in pacf(dfy, ts_col="ts", value_col="value", max_lag=4).collect()
    }
    assert g[1] > 0.5 and abs(g[2]) < g[1] / 2


def test_pacf_constant_series_null(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import pacf

    df = _series_df(spark, [10.0] * 20)
    got = pacf(df, ts_col="ts", value_col="value", max_lag=3).collect()
    assert len(got) == 3 and all(r["pacf"] is None for r in got)
    with pytest.raises(ValueError):
        pacf(df, ts_col="ts", value_col="value", max_lag=0)


@pytest.mark.parametrize("n_slices", [1, 3])
def test_streaming_drawdown_equals_batch(spark, n_slices):
    from dlp_rdb_bq_import_spark.operators.timeseries import max_drawdown
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_max_drawdown

    rng = np.random.RandomState(12)
    vals = [round(100 + float(v), 2) for v in rng.normal(0, 30, 26)]
    rows = []
    for d, v in enumerate(vals):
        for h in (3, 15):  # two events per day: slices can split a day
            rows.append(Row(ts=f"2024-01-{d + 1:02d} {h:02d}:00:00", value=v / 2))
    df = spark.createDataFrame(rows)
    batch = max_drawdown(df, ts_col="ts", value_col="value").collect()[0]
    stream = streaming_max_drawdown(spark, df, n_slices=n_slices).collect()[0]
    assert stream.asDict() == batch.asDict()
