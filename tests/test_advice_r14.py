"""Regression tests for the round-13 ADVICE.md findings fixed in
round 14 (the snapshot-layer findings live in test_snapshots.py; the
PNG probe one in test_png_palette_adam7.py)."""

from __future__ import annotations

import pytest

from dlp_rdb_bq_import_spark.operators.profiling import benjamini_hochberg


def _bh(spark, rows):
    df = spark.createDataFrame(rows, "test_id string, p double")
    return benjamini_hochberg(df, "test_id", "p", q=0.05)


def test_bh_out_of_range_p_raises_not_silently_drops(spark):
    """ADVICE r13: p outside [0,1] shrank m and loosened every
    critical value with no signal; now it raises at execution."""
    from pyspark.errors import PySparkException

    with pytest.raises(PySparkException, match="outside \\[0, 1\\]"):
        _bh(spark, [("a", 0.01), ("b", 1.5)]).collect()
    with pytest.raises(PySparkException, match="outside \\[0, 1\\]"):
        _bh(spark, [("a", -0.2), ("b", 0.5)]).collect()
    with pytest.raises(PySparkException, match="outside \\[0, 1\\]"):
        _bh(spark, [("a", float("nan"))]).collect()


def test_bh_null_p_still_skipped_and_m_correct(spark):
    """NULL p = "test didn't run" — skipped by convention, and m
    counts only the tests that ran."""
    out = {r.test_id: r for r in _bh(
        spark, [("a", 0.001), ("b", None), ("c", 0.9)]
    ).collect()}
    assert set(out) == {"a", "c"}
    assert out["a"].m == 2 and out["a"].rejected
    assert not out["c"].rejected


def test_bh_valid_inputs_unchanged(spark):
    """The happy path is byte-identical to the r13 behavior."""
    rows = [(f"t{i}", p) for i, p in enumerate(
        [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216]
    )]
    out = sorted(_bh(spark, rows).collect(), key=lambda r: r.rank)
    # classic BH example (q=0.05): k_max = 2 -> first two rejected
    assert [r.rejected for r in out] == [True, True] + [False] * 8
    assert all(r.m == 10 for r in out)
