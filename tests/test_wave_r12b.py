"""Round-12 wave 2: WOE/IV, rare-category grouping, Flesch reading
ease, per-key TWAP, and MAD robust outliers — pinned against inline
pure-Python references."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# woe_iv
# ---------------------------------------------------------------------------


def test_woe_iv_manual_reference(spark):
    from dlp_rdb_bq_import_spark.operators.features import woe_iv

    rows = (
        [("a", True)] * 8
        + [("a", False)] * 2
        + [("b", True)] * 3
        + [("b", False)] * 7
        + [("c", True)] * 5
        + [("c", False)] * 5
    )
    df = spark.createDataFrame(rows, "c string, y boolean")
    got = {r.category: r for r in woe_iv(df, "c", "y").collect()}
    G, B, k = 16, 14, 3
    iv = 0.0
    for cat, (g, b) in {"a": (8, 2), "b": (3, 7), "c": (5, 5)}.items():
        ps = (2 * g + 1) / (2 * G + k)
        ns = (2 * b + 1) / (2 * B + k)
        woe = math.log(ps / ns)
        iv += round((ps - ns) * woe * 1e9) / 1e9
        r = got[cat]
        assert (r.n_pos, r.n_neg) == (g, b)
        assert abs(r.woe - woe) < 1e-8
    assert abs(got["a"].iv - iv) < 1e-8
    assert got["a"].n_categories == 3


def test_woe_iv_one_sided_category_finite(spark):
    """A category with zero positives (or negatives) must stay finite
    under the add-0.5 smoothing."""
    from dlp_rdb_bq_import_spark.operators.features import woe_iv

    rows = [("only_neg", False)] * 5 + [("mixed", True)] * 3 + [("mixed", False)] * 2
    df = spark.createDataFrame(rows, "c string, y boolean")
    got = {r.category: r for r in woe_iv(df, "c", "y").collect()}
    assert got["only_neg"].woe is not None and math.isfinite(got["only_neg"].woe)
    assert got["only_neg"].woe < 0  # all-negative category: strong negative WOE


# ---------------------------------------------------------------------------
# group_rare_categories
# ---------------------------------------------------------------------------


def test_group_rare_categories_threshold_and_nulls(spark):
    from dlp_rdb_bq_import_spark.operators.features import group_rare_categories

    rows = [("x",)] * 5 + [("y",)] * 2 + [("z",)] * 1 + [(None,)] * 2
    df = spark.createDataFrame(rows, "c string")
    out = group_rare_categories(df, "c", min_count=3).collect()
    labels = [r.c_grouped for r in out]
    assert labels.count("x") == 5
    assert labels.count("__other__") == 3  # y(2) + z(1)
    assert labels.count(None) == 2  # NULL passes through, never __other__


def test_group_rare_categories_guards(spark):
    from dlp_rdb_bq_import_spark.operators.features import group_rare_categories

    df = spark.createDataFrame([("x", "v")], "c string, c_grouped string")
    with pytest.raises(ValueError, match="already exists"):
        group_rare_categories(df, "c", min_count=1)
    with pytest.raises(ValueError, match="min_count"):
        group_rare_categories(df.drop("c_grouped"), "c", min_count=0)


# ---------------------------------------------------------------------------
# flesch_reading_ease
# ---------------------------------------------------------------------------


def test_flesch_manual_counts(spark):
    from dlp_rdb_bq_import_spark.operators.text import flesch_reading_ease

    df = spark.createDataFrame(
        [
            (1, "the cat sat. the dog ran!"),
            (2, "no terminators here"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in flesch_reading_ease(df).collect()}
    # doc 1: words = [the cat sat. the dog ran!] -> 6; sentences 2;
    # syllables: the=1 cat=1 sat.=1 the=1 dog=1 ran!=1 -> 6
    r = got[1]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    want = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r.flesch - want) < 1e-8
    assert got[2].n_sentences == 1  # floored — no terminator
    assert got[3].flesch is None and got[3].n_words == 0
    assert got[4].flesch is None


def test_flesch_syllable_heuristic(spark):
    from dlp_rdb_bq_import_spark.operators.text import flesch_reading_ease

    # banana = 3 vowel groups, queue = 2 ([ueue] is one group? q-ueue:
    # 'ueue' is one contiguous [aeiouy]+ run -> 1), brr = 0 floored to 1
    df = spark.createDataFrame(
        [(1, "banana queue brr")], "doc_id long, text string"
    )
    r = flesch_reading_ease(df).collect()[0]
    assert r.n_syllables == 3 + 1 + 1


# ---------------------------------------------------------------------------
# time_weighted_avg
# ---------------------------------------------------------------------------


def test_twap_manual(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import time_weighted_avg

    rows = [
        ("u1", "2024-01-01 00:00:00", 10.0),  # holds 60 s
        ("u1", "2024-01-01 00:01:00", 20.0),  # holds 120 s
        ("u1", "2024-01-01 00:03:00", 99.0),  # last: no duration
        ("u2", "2024-01-01 00:00:00", 5.0),  # single event: NULL twap
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "v"
    )
    got = {
        r.key: r
        for r in time_weighted_avg(
            df, key_col="k", ts_col="ts", value_col="v"
        ).collect()
    }
    r = got["u1"]
    assert (r.n_events, r.span_seconds) == (3, 180)
    assert abs(r.twap - (10 * 60 + 20 * 120) / 180) < 1e-9
    assert got["u2"].twap is None and got["u2"].span_seconds == 0


def test_twap_vs_row_mean_on_irregular_series(spark):
    """The point of TWAP: a burst of identical readings must not move
    the time-weighted mean the way it moves the row mean."""
    from dlp_rdb_bq_import_spark.operators.timeseries import time_weighted_avg

    rows = [("u", f"2024-01-01 00:00:{s:02d}", 100.0) for s in range(10)] + [
        ("u", "2024-01-01 01:00:00", 0.0),
        ("u", "2024-01-01 02:00:00", 0.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "v"
    )
    r = time_weighted_avg(df, key_col="k", ts_col="ts", value_col="v").collect()[0]
    # value 100 holds only the first ~hour; 0 holds the second hour
    assert r.twap < 52.0  # row mean would be 100*10/12 = 83.3


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_planted(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import modified_zscore_outliers

    vals = [float(v) for v in range(100, 121)] + [500.0, -300.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    got = {r.id: r for r in modified_zscore_outliers(df, "id", "v").collect()}
    assert set(got) == {21, 22}  # the two planted extremes
    med = float(np.median(vals))
    madv = float(np.median(np.abs(np.array(vals) - med)))
    assert abs(got[21].robust_z - 0.6745 * (500.0 - med) / madv) < 1e-6
    assert got[22].robust_z < -3.5


def test_mad_outliers_zero_mad_emits_nothing(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import modified_zscore_outliers

    df = spark.createDataFrame(
        [(i, 7.0) for i in range(10)] + [(99, 1e9)], "id long, v double"
    )
    # > 50% identical values -> MAD 0 -> modified z undefined -> empty
    assert modified_zscore_outliers(df, "id", "v").count() == 0


def test_mad_outliers_threshold_validation(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import modified_zscore_outliers

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="threshold"):
        modified_zscore_outliers(df, "id", "v", threshold=0.0)


# ---------------------------------------------------------------------------
# streaming_twap ≡ batch time_weighted_avg
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_slices", [1, 3, 5])
def test_streaming_twap_equals_batch(spark, n_slices):
    """The per-key fold must reproduce the batch operator EXACTLY for
    any micro-batch slicing — including slice boundaries that split a
    key's events (the carried last-observation state)."""
    from dlp_rdb_bq_import_spark.operators.timeseries import time_weighted_avg
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_twap

    rows = []
    eid = 0
    for k in ("a", "b", "c"):
        for m in range(8):
            rows.append((k, f"2024-01-01 00:{m * 7:02d}:00", eid, float((eid * 37) % 90)))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id string, ts string, event_id long, value double"
    ).select(
        "user_id", F.to_timestamp("ts").alias("ts"), "event_id", "value"
    )
    want = {
        r.key: (r.n_events, r.span_seconds, r.twap)
        for r in time_weighted_avg(
            df, key_col="user_id", ts_col="ts", value_col="value"
        ).collect()
    }
    got = {
        r.key: (r.n_events, r.span_seconds, r.twap)
        for r in streaming_twap(spark, df, n_slices=n_slices).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# progressive JPEG in the multimodal mix
# ---------------------------------------------------------------------------


def test_progressive_container_features_identical_to_baseline(spark):
    """jpeg and jpeg_progressive share one quantization stage, so the
    decoded features must be EXACTLY equal per document."""
    from dlp_rdb_bq_import_spark.operators.multimodal import (
        attach_media,
        extract_features,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    base = {
        r.doc_id: (r.width, r.height, r.mean_px)
        for r in extract_features(attach_media(docs, container="jpeg")).collect()
    }
    prog = {
        r.doc_id: (r.width, r.height, r.mean_px)
        for r in extract_features(
            attach_media(docs, container="jpeg_progressive")
        ).collect()
    }
    assert base == prog and len(base) == 12
