"""Mergeable quantile digest (rollup.quantile_digest / digest_query /
digest_merge): build exactness vs numpy, query rank-error bounds, and
the merge ≡ summarize-the-union property that makes digests foldable
across partitions/days without raw data."""

from __future__ import annotations

import numpy as np
import pytest

from dlp_rdb_bq_import_spark.operators.rollup import (
    digest_merge,
    digest_query,
    quantile_digest,
)


def _rank_of(sorted_vals: np.ndarray, v: float) -> float:
    """Fractional rank of v in the population (midpoint convention)."""
    lo = np.searchsorted(sorted_vals, v, side="left")
    hi = np.searchsorted(sorted_vals, v, side="right")
    n = len(sorted_vals)
    return ((lo + hi) / 2) / max(n - 1, 1)


def test_digest_points_equal_numpy_percentiles(spark):
    rng = np.random.RandomState(5)
    vals = rng.gamma(2.0, 10.0, 500)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    k = 8
    got = {
        round(r.rank_frac, 12): r.value
        for r in quantile_digest(df, "v", k=k).collect()
    }
    assert len(got) == k + 1
    for i in range(k + 1):
        q = i / k
        want = float(np.percentile(vals, 100 * q))  # linear interp = R-7
        assert got[round(q, 12)] == pytest.approx(want, abs=1e-9), q
    n = quantile_digest(df, "v", k=k).first().n
    assert n == 500


def test_digest_query_rank_error_bound(spark):
    rng = np.random.RandomState(11)
    vals = np.sort(rng.lognormal(0, 1.5, 2000))
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    k = 32
    d = quantile_digest(df, "v", k=k)
    qs = [0.01, 0.1, 0.25, 0.5, 0.77, 0.9, 0.99]
    got = {round(r.q, 12): r.value for r in digest_query(d, qs).collect()}
    for q in qs:
        rank = _rank_of(vals, got[round(q, 12)])
        assert abs(rank - q) <= 1.0 / k, (q, rank)


def test_digest_grouped_and_validation(spark):
    rows = [("a", float(i)) for i in range(101)] + [
        ("b", float(1000 + i)) for i in range(11)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    d = quantile_digest(df, "v", k=4, group_cols=["g"])
    got = {(r.g, round(r.rank_frac, 12)): (r.value, r.n) for r in d.collect()}
    assert got[("a", 0.5)] == (50.0, 101)
    assert got[("b", 1.0)] == (1010.0, 11)
    with pytest.raises(ValueError, match="k must be"):
        quantile_digest(df, "v", k=1)
    with pytest.raises(ValueError, match="quantile"):
        digest_query(d, [1.5])


def test_merge_matches_union_within_bound(spark):
    rng = np.random.RandomState(23)
    a = rng.normal(0, 1, 1500)
    b = rng.normal(4, 2, 500)  # different size AND distribution
    da = quantile_digest(
        spark.createDataFrame([(float(v),) for v in a], "v double"), "v", k=32
    )
    db = quantile_digest(
        spark.createDataFrame([(float(v),) for v in b], "v double"), "v", k=32
    )
    merged = digest_merge(da, db)
    union = np.sort(np.concatenate([a, b]))
    rows = merged.collect()
    assert len(rows) == 33 and all(r.n == 2000 for r in rows)
    for r in rows:
        rank = _rank_of(union, r.value)
        # input bound 1/(2k) each + resample 1/(2k) ⟹ comfortably ≤ 2/k
        assert abs(rank - r.rank_frac) <= 2.0 / 32, (r.rank_frac, rank)
    # exact extremes survive the merge
    vals = {round(r.rank_frac, 12): r.value for r in rows}
    assert vals[0.0] == pytest.approx(union[0], abs=1e-9)
    assert vals[1.0] == pytest.approx(union[-1], abs=1e-9)


def test_merge_identical_digests_is_fixpoint(spark):
    vals = [float(i) for i in range(65)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    d = quantile_digest(df, "v", k=8)
    m = digest_merge(d, d)
    got = {round(r.rank_frac, 12): (r.value, r.n) for r in m.collect()}
    for i in range(9):
        q = i / 8
        assert got[round(q, 12)][0] == pytest.approx(q * 64, abs=1e-9)
        assert got[round(q, 12)][1] == 130  # counts add; points unchanged


def test_merge_grouped_one_sided_group(spark):
    rows_a = [("x", float(i)) for i in range(51)]
    rows_b = [("x", float(i + 100)) for i in range(51)] + [
        ("only_b", float(i)) for i in range(21)
    ]
    da = quantile_digest(
        spark.createDataFrame(rows_a, "g string, v double"), "v", k=4,
        group_cols=["g"],
    )
    db = quantile_digest(
        spark.createDataFrame(rows_b, "g string, v double"), "v", k=4,
        group_cols=["g"],
    )
    m = digest_merge(da, db, group_cols=["g"])
    got = {(r.g, round(r.rank_frac, 12)): (r.value, r.n) for r in m.collect()}
    # group on one side only passes through (re-sampled, counts kept)
    assert got[("only_b", 0.5)] == (10.0, 21)
    assert got[("x", 0.0)][0] == 0.0 and got[("x", 1.0)][0] == 150.0
    assert got[("x", 0.5)][1] == 102


def test_streaming_digest_fold_tracks_batch_build(spark):
    """The standing digest after a 4-slice stream fold answers ranks
    within 2/k of the batch digest built over everything seen — the
    bounded-state streaming quantile contract."""
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_quantile_digest

    rng = np.random.RandomState(7)
    vals = rng.lognormal(0, 1.2, 3000)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    k = 32
    out = streaming_quantile_digest(spark, df, "v", k=k, n_slices=4)
    rows = out.collect()
    assert len(rows) == k + 1 and all(r.n == 3000 for r in rows)
    sv = np.sort(vals)
    for r in rows:
        rank = _rank_of(sv, r.value)
        assert abs(rank - r.rank_frac) <= 2.0 / k, (r.rank_frac, rank)
    # exact extremes survive every fold
    vals_by_rank = {round(r.rank_frac, 12): r.value for r in rows}
    assert vals_by_rank[0.0] == pytest.approx(sv[0], abs=1e-9)
    assert vals_by_rank[1.0] == pytest.approx(sv[-1], abs=1e-9)
