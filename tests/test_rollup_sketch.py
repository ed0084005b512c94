"""Tests for rollup.approx_distinct_rollup: cascade ≡ direct-sketch
equality (HLL registers are slot maxima, so merging finer sketches is
lossless), relative-error bound vs exact distincts, and guards."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from dlp_rdb_bq_import_spark.operators.rollup import approx_distinct_rollup

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=T0 + dt.timedelta(hours=h)) for u, h in rows]
    )


def _fixture(spark):
    # 3 weeks; user u active on day (u % 21): overlapping daily sets
    rows = [(u, 24 * (u % 21) + (u % 7)) for u in range(200)]
    rows += [(u, 24 * ((u + 3) % 21)) for u in range(0, 200, 2)]
    return _events(spark, rows)


def test_cascaded_week_equals_direct_week_sketch(spark):
    ev = _fixture(spark)
    out = approx_distinct_rollup(ev, "ts", "user_id", ["1 day", "7 days"])
    cascaded = {
        r["bucket_start"]: r["approx_distinct"]
        for r in out["7 days"].collect()
    }
    direct = {
        r["bucket_start"]: r["approx_distinct"]
        for r in (
            ev.groupBy(F.window(F.col("ts").cast("timestamp"), "7 days").alias("w"))
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg(F.col("user_id"), F.lit(12))
                ).alias("approx_distinct")
            )
            .select(F.col("w.start").alias("bucket_start"), "approx_distinct")
            .collect()
        )
    }
    assert cascaded == direct


def test_estimates_within_relative_error_of_exact(spark):
    ev = _fixture(spark)
    out = approx_distinct_rollup(ev, "ts", "user_id", ["1 day", "7 days"])
    for lvl, grain in (("1 day", "1 day"), ("7 days", "7 days")):
        exact = {
            r["bucket_start"]: r["exact"]
            for r in (
                ev.groupBy(F.window(F.col("ts").cast("timestamp"), grain).alias("w"))
                .agg(F.countDistinct("user_id").alias("exact"))
                .select(F.col("w.start").alias("bucket_start"), "exact")
                .collect()
            )
        }
        got = {r["bucket_start"]: r["approx_distinct"] for r in out[lvl].collect()}
        assert set(got) == set(exact)
        for b, est in got.items():
            assert abs(est - exact[b]) <= max(2, 0.05 * exact[b]), (lvl, b)


def test_week_counts_multi_day_user_once(spark):
    # one user active three consecutive days inside ONE epoch-aligned
    # 7-day window (they start on Thursdays; 2024-01-01 is a Monday, so
    # Mon-Wed share a bucket): weekly distinct is 1, not 3
    ev = _events(spark, [(42, 24 * d) for d in range(3)])
    out = approx_distinct_rollup(ev, "ts", "user_id", ["1 day", "7 days"])
    assert [r["approx_distinct"] for r in out["7 days"].collect()] == [1]
    assert [r["approx_distinct"] for r in out["1 day"].collect()] == [1, 1, 1]


def test_empty_levels_raises(spark):
    with pytest.raises(ValueError, match="levels"):
        approx_distinct_rollup(_events(spark, [(1, 0)]), "ts", "user_id", [])
