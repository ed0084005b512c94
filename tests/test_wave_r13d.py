"""Round-13 fourth wave: Benjamini–Hochberg FDR and the
Mantel–Haenszel pooled odds ratio."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row


def test_bh_textbook_example(spark):
    """The classic worked example: m=10 p-values, q=0.25 — the step-up
    rejects the largest k with p_(k) <= k/10 * 0.25, INCLUDING an
    earlier p that sits above its own line (the step-up property a
    naive per-row threshold misses)."""
    from dlp_rdb_bq_import_spark.operators.profiling import benjamini_hochberg

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216]
    df = spark.createDataFrame(
        [Row(t=f"t{i:02d}", p=float(p)) for i, p in enumerate(ps)]
    )
    out = {r["test_id"]: r for r in benjamini_hochberg(df, "t", "p", q=0.05).collect()}
    # q=0.05 lines k/10·0.05: only p_(1)=0.001 <= 0.005 and
    # p_(2)=0.008 <= 0.01 pass; every later p sits above its line,
    # so kmax=2 and exactly the first two reject
    rejected = {t for t, r in out.items() if r["rejected"]}
    assert rejected == {"t00", "t01"}
    assert out["t01"]["rank"] == 2 and out["t01"]["m"] == 10
    assert out["t01"]["bh_critical"] == 0.01
    with pytest.raises(ValueError):
        benjamini_hochberg(df, "t", "p", q=1.5)


def test_bh_step_up_rejects_above_line_prefix(spark):
    """The defining step-up property: p-values ABOVE their own line
    still reject when a LATER rank passes — a naive per-row threshold
    gets this wrong."""
    from dlp_rdb_bq_import_spark.operators.profiling import benjamini_hochberg

    # m=3, q=0.05: lines 0.0167/0.0333/0.05. p1 and p2 are above their
    # lines; p3 = 0.05 passes its line exactly → kmax=3, ALL reject.
    df = spark.createDataFrame(
        [Row(t="a", p=0.02), Row(t="b", p=0.049), Row(t="c", p=0.05)]
    )
    out = benjamini_hochberg(df, "t", "p", q=0.05)
    assert out.where("rejected").count() == 3


def test_bh_uniform_nulls_reject_almost_nothing(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import benjamini_hochberg

    # deterministic pseudo-uniform p-values: no planted signal
    rows = [Row(t=str(i), p=((i * 2654435761) % 1000003) / 1000003.0) for i in range(2000)]
    out = benjamini_hochberg(spark.createDataFrame(rows), "t", "p", q=0.05)
    assert out.where("rejected").count() <= 2  # FDR holds under the null


def test_bh_planted_signal_recovered(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import benjamini_hochberg

    rows = [Row(t=f"sig{i}", p=1e-8 * (i + 1)) for i in range(50)]
    rows += [Row(t=f"null{i}", p=0.2 + 0.7 * (i / 1000)) for i in range(950)]
    out = {r["test_id"]: r["rejected"] for r in benjamini_hochberg(
        spark.createDataFrame(rows), "t", "p", q=0.05
    ).collect()}
    assert all(out[f"sig{i}"] for i in range(50))
    assert not any(out[f"null{i}"] for i in range(0, 950, 100))


def test_mantel_haenszel_pools_through_simpson_reversal(spark):
    """Two strata where exposure helps WITHIN each stratum but the
    collapsed 2×2 reverses: MH must report the within-stratum truth."""
    from dlp_rdb_bq_import_spark.operators.profiling import (
        mantel_haenszel_or,
        odds_ratio_ci,
    )

    rows = []
    # stratum A: exposure common, outcome common; OR_A = (80*20)/(20*30)
    rows += [Row(s="A", e=True, y=True)] * 80 + [Row(s="A", e=True, y=False)] * 20
    rows += [Row(s="A", e=False, y=True)] * 30 + [Row(s="A", e=False, y=False)] * 20
    # stratum B: exposure rare, outcome rare; OR_B = (10*200)/(40*10)
    rows += [Row(s="B", e=True, y=True)] * 10 + [Row(s="B", e=True, y=False)] * 40
    rows += [Row(s="B", e=False, y=True)] * 10 + [Row(s="B", e=False, y=False)] * 200
    df = spark.createDataFrame(rows)
    mh = mantel_haenszel_or(df, "s", "e", "y").collect()[0]
    # hand fold: r = Σ a_i d_i / n_i, s = Σ b_i c_i / n_i (micro-rounded)
    r = round(80 * 20 / 150 * 1e6) + round(10 * 200 / 260 * 1e6)
    sx = round(20 * 30 / 150 * 1e6) + round(40 * 10 / 260 * 1e6)
    assert mh["or_mh"] == round((r / 1e6) / (sx / 1e6), 9)
    assert mh["k"] == 2 and mh["n"] == 410
    assert mh["or_mh"] > 1.5  # within-stratum: exposure raises odds
    assert mh["ci_low"] < mh["or_mh"] < mh["ci_high"]
    # both per-stratum ORs exceed 1 while MH pools between them
    or_a = (80 * 20) / (20 * 30)
    or_b = (10 * 200) / (40 * 10)
    assert min(or_a, or_b) * 0.8 < mh["or_mh"] < max(or_a, or_b) * 1.2


def test_mantel_haenszel_empty_pool_null(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mantel_haenszel_or

    rows = [Row(s="A", e=True, y=True)] * 5 + [Row(s="A", e=False, y=True)] * 5
    out = mantel_haenszel_or(spark.createDataFrame(rows), "s", "e", "y").collect()[0]
    assert out["or_mh"] is None  # d = 0 and c·b = 0 → both sums zero
