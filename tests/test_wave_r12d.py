"""Round-12 wave 5: log-rank test, RFM segmentation, inter-arrival
burstiness — inline pure-Python references."""

from __future__ import annotations

import collections
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# logrank_test
# ---------------------------------------------------------------------------


def _logrank_reference(units):
    """units: (group_a(bool), duration(int), event(bool))"""
    times = sorted({t for _, t, e in units if e})
    o = sum(1 for g, _, e in units if g and e)
    e_a = v = 0.0
    for t in times:
        n = sum(1 for _, d, _ in units if d >= t)
        n1 = sum(1 for g, d, _ in units if g and d >= t)
        d = sum(1 for _, dd, e in units if dd == t and e)
        d1 = sum(1 for g, dd, e in units if g and dd == t and e)
        e_a += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    chi2 = (o - e_a) ** 2 / v if v > 0 else None
    return o, e_a, v, chi2


def test_logrank_matches_reference_with_censoring(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import logrank_test

    units = [
        (True, 2, True), (True, 3, True), (True, 5, False), (True, 7, True),
        (False, 1, True), (False, 2, True), (False, 2, False),
        (False, 4, True), (False, 9, False),
    ]
    df = spark.createDataFrame(units, "g boolean, t long, ev boolean")
    r = logrank_test(df, group_col="g", duration_col="t", event_col="ev").collect()[0]
    o, e_a, v, chi2 = _logrank_reference(units)
    assert (r.n_a, r.n_b, r.o_a) == (4, 5, o)
    assert abs(r.e_a - e_a) < 1e-5
    assert abs(r.v - v) < 1e-5
    assert abs(r.chi2 - chi2) < 1e-4


def test_logrank_identical_groups_near_zero(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import logrank_test

    units = [(i % 2 == 0, (i * 13) % 20 + 1, True) for i in range(200)]
    df = spark.createDataFrame(units, "g boolean, t long, ev boolean")
    r = logrank_test(df, group_col="g", duration_col="t", event_col="ev").collect()[0]
    o, e_a, v, chi2 = _logrank_reference(units)
    assert abs(r.chi2 - chi2) < 1e-4


def test_logrank_separated_groups_large_chi2(spark):
    """Group A all churns early, group B all survives long: huge χ²."""
    from dlp_rdb_bq_import_spark.operators.timeseries import logrank_test

    units = [(True, 1 + i % 3, True) for i in range(50)] + [
        (False, 50 + i % 3, True) for i in range(50)
    ]
    df = spark.createDataFrame(units, "g boolean, t long, ev boolean")
    r = logrank_test(df, group_col="g", duration_col="t", event_col="ev").collect()[0]
    assert r.chi2 > 50.0


def test_logrank_no_events_null(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import logrank_test

    df = spark.createDataFrame(
        [(True, 5, False), (False, 3, False)], "g boolean, t long, ev boolean"
    )
    r = logrank_test(df, group_col="g", duration_col="t", event_col="ev").collect()[0]
    assert r.chi2 is None and r.o_a == 0


# ---------------------------------------------------------------------------
# rfm_segmentation
# ---------------------------------------------------------------------------


def test_rfm_codes_and_inversion(spark):
    from dlp_rdb_bq_import_spark.operators.features import rfm_segmentation

    # 10 users: user i has i+1 events of value 10*(i+1), last event at
    # day i (user 9 most recent -> highest r code)
    rows = []
    for u in range(10):
        for j in range(u + 1):
            rows.append((u, f"2024-01-{u + 1:02d} 00:00:00", 10.0 * (u + 1)))
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.to_timestamp("ts").alias("ts"), "value"
    )
    out = {
        r.user: r
        for r in rfm_segmentation(
            df, user_col="user_id", ts_col="ts", amount_col="value"
        ).collect()
    }
    assert len(out) == 10
    # user 9: most recent (recency 0), most frequent, highest spend
    assert out[9].rfm == "555" and out[9].recency_days == 0
    # user 0: least recent, least frequent, least spend
    assert out[0].rfm == "111" and out[0].recency_days == 9
    # monotone codes along the construction
    rs = [out[u].r for u in range(10)]
    assert rs == sorted(rs)
    assert [out[u].f for u in range(10)] == sorted(out[u].f for u in range(10))
    assert all(out[u].rfm == f"{out[u].r}{out[u].f}{out[u].m}" for u in out)


def test_rfm_n_bins_validation(spark):
    from dlp_rdb_bq_import_spark.operators.features import rfm_segmentation

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "user_id long, ts string, value double"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")
    with pytest.raises(ValueError, match="n_bins"):
        rfm_segmentation(
            df, user_col="user_id", ts_col="ts", amount_col="value", n_bins=1
        )


# ---------------------------------------------------------------------------
# interarrival_burstiness
# ---------------------------------------------------------------------------


def test_burstiness_clockwork_and_bursty(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    rows = []
    # clockwork: exactly 60 s apart -> sigma 0 -> B = -1, cv = 0
    for i in range(20):
        rows.append(("tick", f"2024-01-01 00:{i:02d}:00", i))
    # bursty: 9 gaps of 1 s then one of ~1 hour
    for i in range(10):
        rows.append(("burst", f"2024-01-01 00:00:{i:02d}", 100 + i))
    rows.append(("burst", "2024-01-01 01:00:00", 200))
    df = spark.createDataFrame(rows, "k string, ts string, id long").select(
        "k", F.to_timestamp("ts").alias("ts"), "id"
    )
    got = {
        r.key: r
        for r in interarrival_burstiness(
            df, key_col="k", ts_col="ts", id_col="id"
        ).collect()
    }
    assert got["tick"].burstiness == -1.0 and got["tick"].cv == 0.0
    assert got["tick"].mean_gap_s == 60.0
    assert got["burst"].burstiness > 0.5  # strongly bursty
    # numpy reference for the bursty key
    gaps = [1.0] * 9 + [3600.0 - 9.0]
    mean, std = np.mean(gaps), np.std(gaps, ddof=1)
    assert abs(got["burst"].cv - std / mean) < 1e-6
    assert abs(got["burst"].burstiness - (std - mean) / (std + mean)) < 1e-6


def test_burstiness_single_event_keys_excluded(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    df = spark.createDataFrame(
        [("solo", "2024-01-01 00:00:00", 1)], "k string, ts string, id long"
    ).select("k", F.to_timestamp("ts").alias("ts"), "id")
    assert (
        interarrival_burstiness(df, key_col="k", ts_col="ts", id_col="id").count()
        == 0
    )
