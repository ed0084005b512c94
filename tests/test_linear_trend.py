"""Unit tests for profiling.grouped_linear_trend: numpy polyfit
agreement, degenerate-group NULLs, and quantization rescale."""

from __future__ import annotations

import numpy as np

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.profiling import grouped_linear_trend


def test_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(11)
    rows = []
    data = {}
    for g in range(3):
        x = np.arange(20, dtype=float)
        y = ((g + 1) * 2.5 * x + 7.0 + rng.normal(0, 1, 20)).round(2)
        data[g] = (x, y)
        rows += [Row(g=g, x=float(a), y=float(b)) for a, b in zip(x, y)]
    out = grouped_linear_trend(
        spark.createDataFrame(rows),
        group_cols=["g"],
        x_col="x",
        y_col="y",
        scale_x=1,
        scale_y=100,
    ).collect()
    got = {r["g"]: (r["slope"], r["intercept"], r["n"]) for r in out}
    for g, (x, y) in data.items():
        slope, intercept = np.polyfit(x, y, 1)
        assert got[g][2] == 20
        assert abs(got[g][0] - slope) < 1e-9
        assert abs(got[g][1] - intercept) < 1e-7


def test_degenerate_groups_null(spark):
    rows = [
        Row(g=1, x=5.0, y=3.0),          # n = 1
        Row(g=2, x=4.0, y=1.0),          # all x equal
        Row(g=2, x=4.0, y=9.0),
    ]
    out = {r["g"]: r for r in grouped_linear_trend(
        spark.createDataFrame(rows), group_cols=["g"], x_col="x", y_col="y"
    ).collect()}
    assert out[1]["slope"] is None and out[1]["intercept"] is None
    assert out[2]["slope"] is None and out[2]["intercept"] is None


def test_perfect_line_is_exact(spark):
    rows = [Row(g=0, x=float(i), y=3.0 * i + 2.0) for i in range(10)]
    out = grouped_linear_trend(
        spark.createDataFrame(rows), group_cols=["g"], x_col="x", y_col="y",
        scale_x=10, scale_y=10,
    ).collect()[0]
    assert abs(out["slope"] - 3.0) < 1e-12
    assert abs(out["intercept"] - 2.0) < 1e-12


def test_single_aggregation_plan(spark):
    rows = [Row(g=0, x=float(i), y=float(i)) for i in range(5)]
    out = grouped_linear_trend(
        spark.createDataFrame(rows), group_cols=["g"], x_col="x", y_col="y"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_null_rows_pairwise_excluded(spark):
    # a NULL x row must not contribute to n: fit over the complete rows
    # (1,1),(2,2) is exactly slope 1, intercept 0.
    rows = [(0, 1.0, 1.0), (0, 2.0, 2.0), (0, None, 9.0)]
    out = grouped_linear_trend(
        spark.createDataFrame(rows, "g int, x double, y double"),
        group_cols=["g"], x_col="x", y_col="y", scale_x=1, scale_y=1,
    ).collect()[0]
    assert out["n"] == 2
    assert abs(out["slope"] - 1.0) < 1e-12
    assert abs(out["intercept"]) < 1e-12


def test_all_null_group_omitted(spark):
    rows = [(0, None, 1.0), (1, 1.0, 1.0), (1, 2.0, 3.0)]
    out = grouped_linear_trend(
        spark.createDataFrame(rows, "g int, x double, y double"),
        group_cols=["g"], x_col="x", y_col="y", scale_x=1, scale_y=1,
    ).collect()
    assert [r["g"] for r in out] == [1]
