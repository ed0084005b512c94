"""Round-13 second wave: streaming OLS trend (stream ≡ batch across
slicings) and the Jonckheere–Terpstra ordered-trend test."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row


# ------------------------------------------------------ streaming ols ≡ batch


@pytest.mark.parametrize("n_slices", [1, 3])
def test_streaming_ols_equals_batch(spark, n_slices):
    """Day totals merge associatively even when a day spans batches;
    the streaming readout must equal the batch operator exactly."""
    from dlp_rdb_bq_import_spark.operators.timeseries import ols_trend
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_ols_trend

    rows = []
    for d in range(25):
        # several events per day so slice cuts can split a day
        for h in (1, 9, 17):
            rows.append(
                Row(
                    ts=f"2024-01-{d + 1:02d} {h:02d}:00:00",
                    value=float(round(50 + 2.0 * d + h * 0.1, 2)),
                )
            )
    df = spark.createDataFrame(rows)
    batch = ols_trend(df, ts_col="ts", value_col="value").collect()[0]
    stream = streaming_ols_trend(spark, df, n_slices=n_slices).collect()[0]
    assert stream.asDict() == batch.asDict()


# -------------------------------------------------------- jonckheere-terpstra


def _jt_reference(groups):
    """O(n²) textbook JT + tie-corrected z (Hollander & Wolfe §6.2)."""
    from collections import Counter

    jt = 0.0
    k = len(groups)
    for i in range(k):
        for j in range(i + 1, k):
            for a in groups[i]:
                for b in groups[j]:
                    if a < b:
                        jt += 1
                    elif a == b:
                        jt += 0.5
    ns = [len(g) for g in groups]
    N = sum(ns)
    e = (N * N - sum(n * n for n in ns)) / 4
    ties = Counter(x for g in groups for x in g)
    t1 = (
        N * (N - 1) * (2 * N + 5)
        - sum(n * (n - 1) * (2 * n + 5) for n in ns)
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    ) / 72
    t2 = (
        sum(n * (n - 1) * (n - 2) for n in ns)
        * sum(t * (t - 1) * (t - 2) for t in ties.values())
    ) / (36 * N * (N - 1) * (N - 2))
    t3 = (
        sum(n * (n - 1) for n in ns)
        * sum(t * (t - 1) for t in ties.values())
    ) / (8 * N * (N - 1))
    var = t1 + t2 + t3
    return jt, e, (jt - e) / math.sqrt(var) if var > 0 else None


def test_jonckheere_matches_reference_with_ties(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import jonckheere_terpstra

    rng = np.random.RandomState(4)
    groups = [
        list(rng.randint(0, 8, 60)),
        list(rng.randint(2, 10, 70)),
        list(rng.randint(4, 12, 50)),
    ]
    rows = [
        Row(g=name, v=float(x))
        for name, vals in zip(["lo", "mid", "hi"], groups)
        for x in vals
    ]
    out = jonckheere_terpstra(
        spark.createDataFrame(rows), "g", "v", ["lo", "mid", "hi"], unit_scale=1
    ).collect()[0]
    jt, e, z = _jt_reference(groups)
    assert out["n"] == 180 and out["k"] == 3
    assert out["jt_stat"] == round(jt, 9)
    assert out["e_jt"] == round(e, 9)
    assert abs(out["z"] - z) < 1e-9


def test_jonckheere_detects_monotone_trend(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import jonckheere_terpstra

    rng = np.random.RandomState(6)
    rows = (
        [Row(g="a", v=float(x)) for x in rng.normal(10, 2, 200).round(1)]
        + [Row(g="b", v=float(x)) for x in rng.normal(12, 2, 200).round(1)]
        + [Row(g="c", v=float(x)) for x in rng.normal(14, 2, 200).round(1)]
    )
    up = jonckheere_terpstra(
        spark.createDataFrame(rows), "g", "v", ["a", "b", "c"], unit_scale=10
    ).collect()[0]
    assert up["z"] > 10  # strong increasing trend
    down = jonckheere_terpstra(
        spark.createDataFrame(rows), "g", "v", ["c", "b", "a"], unit_scale=10
    ).collect()[0]
    assert down["z"] < -10  # reversed order flips the sign
    with pytest.raises(ValueError):
        jonckheere_terpstra(spark.createDataFrame(rows), "g", "v", ["a"])
