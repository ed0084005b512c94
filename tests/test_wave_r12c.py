"""Round-12 wave 3: McNemar's paired test, Brier decomposition, and
cumulative gains — pinned against inline references."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# mcnemar_test
# ---------------------------------------------------------------------------


def test_mcnemar_manual_cells_and_statistic(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mcnemar_test

    # (pred_a, pred_b, label): 3 both-right, 1 both-wrong, 4 only-a, 1 only-b
    rows = (
        [("x", "x", "x")] * 3
        + [("y", "z", "x")] * 1
        + [("x", "y", "x")] * 4
        + [("y", "x", "x")] * 1
    )
    df = spark.createDataFrame(rows, "pa string, pb string, label string")
    r = mcnemar_test(df, "pa", "pb", "label").collect()[0]
    assert (r.n, r.both_correct, r.both_wrong, r.only_a, r.only_b) == (9, 3, 1, 4, 1)
    want = (abs(4 - 1) - 1) ** 2 / (4 + 1)
    assert abs(r.chi2 - want) < 1e-9


def test_mcnemar_no_discordant_pairs_null(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mcnemar_test

    df = spark.createDataFrame(
        [("x", "x", "x"), ("y", "y", "x")], "pa string, pb string, label string"
    )
    r = mcnemar_test(df, "pa", "pb", "label").collect()[0]
    assert r.chi2 is None and (r.both_correct, r.both_wrong) == (1, 1)


# ---------------------------------------------------------------------------
# brier_decomposition
# ---------------------------------------------------------------------------


def _brier_reference(scores, labels):
    """Murphy decomposition with bins = distinct scores."""
    import collections

    n = len(scores)
    bins = collections.defaultdict(lambda: [0, 0])
    for s, y in zip(scores, labels):
        bins[s][0] += 1
        bins[s][1] += y
    pbar = sum(labels) / n
    rel = sum(nk * (f - pk / nk) ** 2 for f, (nk, pk) in bins.items()) / n
    res = sum(nk * (pk / nk - pbar) ** 2 for (nk, pk) in bins.values()) / n
    unc = pbar * (1 - pbar)
    return rel, res, unc


def test_brier_decomposition_identity_and_reference(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import brier_decomposition

    rng = np.random.default_rng(3)
    scores = [round(float(s), 2) for s in rng.uniform(0, 1, 400)]
    labels = [int(rng.uniform() < s) for s in scores]  # calibrated-ish
    df = spark.createDataFrame(
        list(zip(scores, labels)), "score double, y int"
    ).select("score", F.col("y").cast("boolean").alias("y"))
    r = brier_decomposition(df, "score", "y", score_round=2).collect()[0]
    rel, res, unc = _brier_reference(scores, labels)
    assert r.n == 400
    assert abs(r.reliability - rel) < 1e-5
    assert abs(r.resolution - res) < 1e-5
    assert abs(r.uncertainty - unc) < 1e-9
    # the additive identity AND the raw mean-squared-error definition
    bs_raw = float(np.mean([(s - y) ** 2 for s, y in zip(scores, labels)]))
    assert abs(r.brier - bs_raw) < 1e-5


def test_brier_perfect_forecaster(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import brier_decomposition

    rows = [(1.0, True)] * 30 + [(0.0, False)] * 70
    df = spark.createDataFrame(rows, "score double, y boolean")
    r = brier_decomposition(df, "score", "y").collect()[0]
    assert r.brier == 0.0 and r.reliability == 0.0
    assert abs(r.resolution - r.uncertainty) < 1e-9  # perfect discrimination


# ---------------------------------------------------------------------------
# cumulative_gains
# ---------------------------------------------------------------------------


def test_cumulative_gains_separating_scorer(spark):
    """A perfectly separating score: the top bins capture all the
    positives, gain hits 1.0 early, top-bin lift = 1/base_rate."""
    from dlp_rdb_bq_import_spark.operators.profiling import cumulative_gains

    rows = [(0.9 + i * 1e-4, True) for i in range(100)] + [
        (0.1 + i * 1e-4, False) for i in range(900)
    ]
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = {r.bin: r for r in cumulative_gains(df, "score", "y", n_bins=10).collect()}
    top = out[min(out)]
    assert top.positives == top.n  # the best bin is all positives
    assert abs(top.lift - (top.positives / top.n) / 0.1) < 1e-6
    last = out[max(out)]
    assert last.cum_n == 1000 and last.cum_positives == 100
    assert abs(last.gain - 1.0) < 1e-9 and abs(last.lift - 1.0) < 1e-9


def test_cumulative_gains_counts_conserved(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cumulative_gains

    rng = np.random.default_rng(11)
    rows = [
        (round(float(rng.uniform()), 4), bool(rng.uniform() < 0.3))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = sorted(
        cumulative_gains(df, "score", "y").collect(), key=lambda r: r.bin
    )
    assert sum(r.n for r in out) == 500
    assert out[-1].cum_n == 500
    assert out[-1].cum_positives == sum(r.positives for r in out)
    # cumulative columns are consistent prefix sums
    acc_n = acc_p = 0
    for r in out:
        acc_n += r.n
        acc_p += r.positives
        assert (r.cum_n, r.cum_positives) == (acc_n, acc_p)


def test_cumulative_gains_n_bins_validation(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cumulative_gains

    df = spark.createDataFrame([(0.5, True)], "score double, y boolean")
    with pytest.raises(ValueError, match="n_bins"):
        cumulative_gains(df, "score", "y", n_bins=1)
