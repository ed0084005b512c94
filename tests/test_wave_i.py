"""Property tests for wave I: the Poisson bootstrap's determinism,
weight distribution, and SE accuracy against the analytic s/√n on a
known population; Wilson intervals vs an independent closed form and
their small-n/extreme-rate sanity."""

from __future__ import annotations

import math

import numpy as np
import pytest


def test_poisson_bootstrap_se_accuracy_and_determinism(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import (
        poisson_bootstrap_se,
    )

    rng = np.random.RandomState(3)
    vals = np.round(rng.normal(500, 40, 2000), 2)
    df = spark.createDataFrame(
        [(f"u{i}", float(v)) for i, v in enumerate(vals)],
        "unit string, m double",
    )
    rows = poisson_bootstrap_se(df, "unit", "m", n_replicates=32).collect()
    assert len(rows) == 32
    se = rows[0].se_boot
    est = rows[0].est_mean
    assert all(r.se_boot == se and r.est_mean == est for r in rows)
    assert est == pytest.approx(vals.mean(), abs=1e-6)
    analytic = vals.std(ddof=1) / math.sqrt(len(vals))
    assert se == pytest.approx(analytic, rel=0.5)  # 32 replicates ≈ ±25%
    # deterministic: same seed -> identical replicate means
    again = poisson_bootstrap_se(df, "unit", "m", n_replicates=32).collect()
    assert {(r.replicate, r.mean_b) for r in again} == {
        (r.replicate, r.mean_b) for r in rows
    }
    # new seed -> different draw
    other = poisson_bootstrap_se(
        df, "unit", "m", n_replicates=32, seed="other"
    ).collect()
    assert {r.mean_b for r in other} != {r.mean_b for r in rows}
    # Poisson(1) weights: n_eff concentrates near n
    assert all(abs(r.n_eff - 2000) < 250 for r in rows)
    with pytest.raises(ValueError, match="n_replicates"):
        poisson_bootstrap_se(df, "unit", "m", n_replicates=1)


def test_wilson_interval_matches_closed_form(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import wilson_interval

    z = 1.959963984540054

    def ref(n, k):
        p = k / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        return center - half, center + half

    rows = []
    for variant, n, k in (("a", 200, 37), ("b", 50, 1), ("c", 8, 8), ("d", 5, 0)):
        rows += [(variant, True)] * k + [(variant, False)] * (n - k)
    df = spark.createDataFrame(rows, "variant string, s boolean")
    got = {r.variant: r for r in wilson_interval(df, "variant", "s").collect()}
    for variant, n, k in (("a", 200, 37), ("b", 50, 1), ("c", 8, 8), ("d", 5, 0)):
        lo, hi = ref(n, k)
        r = got[variant]
        assert (r.n, r.conv) == (n, k)
        assert r.ci_lo == pytest.approx(lo, abs=1e-9)
        assert r.ci_hi == pytest.approx(hi, abs=1e-9)
        # Wilson stays strictly inside [0, 1] even at the extremes
        assert 0 <= r.ci_lo <= r.p_hat <= r.ci_hi <= 1
    # at p̂ = 1 the upper bound is EXACTLY 1 (p(1−p) = 0 makes
    # center + half telescope to 1) and the LOWER bound carries the
    # information; symmetrically at p̂ = 0
    assert got["c"].ci_hi == 1.0 and 0.5 < got["c"].ci_lo < 1.0
    assert got["d"].ci_lo == 0.0 and 0.0 < got["d"].ci_hi < 0.5
    with pytest.raises(ValueError, match="z must be"):
        wilson_interval(df, "variant", "s", z=0)
