"""Unit tests for profiling.correlation_matrix: agreement with numpy,
zero-variance NULLs, pair coverage, and the single-aggregation plan."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.profiling import correlation_matrix


def test_matches_numpy_within_quantization(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(10, 3, 400).round(2)
    b = (a * 1.7 + rng.normal(0, 1, 400)).round(2)
    c = rng.uniform(0, 5, 400).round(2)
    df = spark.createDataFrame(
        [Row(a=float(x), b=float(y), c=float(z)) for x, y, z in zip(a, b, c)]
    )
    out = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(df, ["a", "b", "c"], scale=100).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (x, y), got in out.items():
        arr = {"a": a, "b": b, "c": c}
        want = np.corrcoef(arr[x], arr[y])[0, 1]
        # quantization at scale=100 on 2-dp data is exact -> tight
        assert abs(got - want) < 1e-9, (x, y, got, want)


def test_zero_variance_gives_null(spark):
    df = spark.createDataFrame([Row(a=1.0, b=float(i)) for i in range(10)])
    rows = correlation_matrix(df, ["a", "b"]).collect()
    assert len(rows) == 1 and rows[0]["corr"] is None


def test_needs_two_columns(spark):
    df = spark.createDataFrame([Row(a=1.0)])
    with pytest.raises(ValueError, match="two columns"):
        correlation_matrix(df, ["a"])


def test_single_aggregation_no_join(spark):
    df = spark.createDataFrame([Row(a=float(i), b=float(i * i)) for i in range(20)])
    out = correlation_matrix(df, ["a", "b"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one scan, no self-joins or per-pair passes
    assert "Join" not in plan
    assert plan.count("HashAggregate") <= 4  # partial+final, AQE stages


def test_null_rows_listwise_deleted(spark):
    # NULL in b on the middle row: listwise deletion leaves (1,2),(3,6)
    # -> perfect correlation; mixing count(*)=3 with 2-row sums would
    # produce a silently wrong number.
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, None), (3.0, 6.0)], "a double, b double"
    )
    out = correlation_matrix(df, ["a", "b"]).collect()[0]
    assert out["corr"] == 1.0


def test_heavy_hitters_exact_vs_groupby(spark):
    """Bounded-memory two-pass heavy hitters must equal the plain
    exact groupBy answer even when distinct values vastly exceed the
    counter capacity, and even when the heavy mass is concentrated in
    one partition."""
    from pyspark.sql import functions as F

    from dlp_rdb_bq_import_spark.operators.profiling import heavy_hitters

    # 3 heavy values (1200/900/600 of ~14700 rows) drowned in 12000
    # distinct singletons; capacity default ceil(2/phi)=40 << 12003
    rows = (
        [("hot_a",)] * 1200 + [("hot_b",)] * 900 + [("hot_c",)] * 600
        + [(f"noise_{i}",) for i in range(12000)]
    )
    df = spark.createDataFrame(rows, ["v"]).repartition(8)
    phi = 0.03
    got = {
        (r.value, r.n, r.share)
        for r in heavy_hitters(df, "v", phi=phi).collect()
    }
    n_total = len(rows)
    exact = {
        (r.v, r.c, round(r.c / n_total, 9))
        for r in df.groupBy("v").agg(F.count("*").alias("c")).collect()
        if r.c >= phi * n_total
    }
    assert got == exact and {v for v, _, _ in got} == {"hot_a", "hot_b", "hot_c"}

    # skewed layout: all heavy rows in one partition, noise in others
    skewed = spark.createDataFrame(
        [(("hot" if i < 2000 else f"n{i}"), i < 2000) for i in range(6000)],
        ["v", "is_hot"],
    ).repartition(6, "is_hot")
    out = heavy_hitters(skewed.select("v"), "v", phi=0.25).collect()
    assert [(r.value, r.n) for r in out] == [("hot", 2000)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        heavy_hitters(df, "v", phi=0.0)
    # a capacity below ceil(1/phi) would silently break exactness —
    # it must be rejected, not accepted approximately
    with _pytest.raises(ValueError, match="exactness"):
        heavy_hitters(df, "v", phi=0.02, capacity=10)
