"""Property tests for the round-11 operator wave: Jaro-Winkler pinned
to DuckDB on a full pair grid, deterministic-DP release properties,
Holt smoothing vs an independent reference fold, join-size prediction
vs the actual join, and the CUBE grains vs direct aggregations."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Jaro-Winkler ≡ DuckDB on a pair grid (the oracle-parity contract)
# ---------------------------------------------------------------------------


def test_jaro_winkler_matches_duckdb_grid():
    import duckdb

    from dlp_rdb_bq_import_spark.operators.linkage import jaro_winkler

    names = [
        "MARTHA", "MARHTA", "DIXON", "DICKSONX", "DWAYNE", "DUANE",
        "JELLYFISH", "SMELLYFISH", "CRATE", "TRACE", "apple", "appel",
        "", "a", "ab", "ba", "aaaa", "aaab", "x" * 9,
        "Customer#000000042", "Customer#000000420", "ABCVWXYZ", "CABVWXYZ",
    ]
    con = duckdb.connect()
    for a, b in itertools.product(names, repeat=2):
        mine = jaro_winkler(a, b)
        duck = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert mine == pytest.approx(duck, abs=1e-12), (a, b)
    assert jaro_winkler(None, "x") is None and jaro_winkler("x", None) is None
    # textbook values survive (Winkler 1990 worked examples)
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611111111, abs=1e-9)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133333333, abs=1e-9)


# ---------------------------------------------------------------------------
# deterministic DP release
# ---------------------------------------------------------------------------


def test_dp_noisy_counts_deterministic_and_scales_with_epsilon(spark):
    from dlp_rdb_bq_import_spark.operators.privacy import dp_noisy_counts

    rows = [(f"g{i % 7}",) for i in range(700)]
    df = spark.createDataFrame(rows, "g string")
    r1 = {r.g: r.noisy_n for r in dp_noisy_counts(df, ["g"], 1.0, "s1").collect()}
    r2 = {r.g: r.noisy_n for r in dp_noisy_counts(df, ["g"], 1.0, "s1").collect()}
    assert r1 == r2  # same seed ⟹ same release (retry-idempotent)
    r3 = {r.g: r.noisy_n for r in dp_noisy_counts(df, ["g"], 1.0, "s2").collect()}
    assert r1 != r3  # new seed ⟹ new draw
    # noise magnitude scales like 1/ε: ε=0.1 noise is 10x the ε=1 noise
    n_eps01 = {
        r.g: r.noisy_n for r in dp_noisy_counts(df, ["g"], 0.1, "s1").collect()
    }
    for g in r1:
        noise_1 = r1[g] - 100.0
        noise_01 = n_eps01[g] - 100.0
        assert noise_01 == pytest.approx(10.0 * noise_1, rel=1e-6, abs=1e-6)
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["g"], 0.0)


def test_dp_noise_distribution_is_laplace_shaped(spark):
    """Across many groups the deterministic draws behave like Laplace
    (1/ε) samples: symmetric, mean ≈ 0, |noise| mean ≈ 1/ε."""
    from dlp_rdb_bq_import_spark.operators.privacy import dp_noisy_counts

    rows = [(f"g{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string")  # every group count = 1
    eps = 0.5
    noise = np.array(
        [r.noisy_n - 1.0 for r in dp_noisy_counts(df, ["g"], eps, "nz").collect()]
    )
    assert abs(float(np.mean(noise))) < 0.25  # symmetric around 0
    assert float(np.mean(np.abs(noise))) == pytest.approx(1.0 / eps, rel=0.15)


# ---------------------------------------------------------------------------
# Holt linear ≡ independent reference fold
# ---------------------------------------------------------------------------


def test_holt_linear_matches_reference_fold(spark):
    from dlp_rdb_bq_import_spark.operators.timeseries import holt_linear

    rng = np.random.RandomState(3)
    rows = []
    series = {}
    for k in ("a", "b"):
        vals = list(np.cumsum(rng.randn(40)) + 50.0)
        series[k] = vals
        for i, v in enumerate(vals):
            rows.append((k, i, float(v)))
    df = spark.createDataFrame(rows, "k string, i long, v double").select(
        "k", F.timestamp_micros(F.col("i") * 1000000).alias("ts"), "i", "v"
    )
    a, g = 0.35, 0.2
    got = {
        (r.k, r.i): (r.level, r.trend, r.forecast_next)
        for r in holt_linear(df, "ts", "v", ["k"], "i", alpha=a, beta=g).collect()
    }
    for k, vals in series.items():
        level, trend = vals[0], 0.0
        for i, y in enumerate(vals):
            if i > 0:
                nl = a * y + (1.0 - a) * (level + trend)
                trend = g * (nl - level) + (1.0 - g) * trend
                level = nl
            assert got[(k, i)][0] == pytest.approx(level, abs=1e-9)
            assert got[(k, i)][1] == pytest.approx(trend, abs=1e-9)
            assert got[(k, i)][2] == pytest.approx(level + trend, abs=1e-9)


def test_holt_tracks_linear_trend_ewma_lags(spark):
    """On a pure linear ramp Holt's forecast converges to the truth
    while a plain EWMA lags by a constant — the reason the operator
    exists."""
    from dlp_rdb_bq_import_spark.operators.timeseries import holt_linear

    n = 200
    rows = [("k", i, float(10 + 2 * i)) for i in range(n)]
    df = spark.createDataFrame(rows, "k string, i long, v double").select(
        "k", F.timestamp_micros(F.col("i") * 1000000).alias("ts"), "i", "v"
    )
    out = {r.i: r for r in holt_linear(df, "ts", "v", ["k"], "i").collect()}
    last = out[n - 1]
    assert last.trend == pytest.approx(2.0, abs=1e-3)  # learned the slope
    assert last.forecast_next == pytest.approx(10 + 2 * n, abs=0.05)


# ---------------------------------------------------------------------------
# join-size prediction is exact
# ---------------------------------------------------------------------------


def test_join_size_report_exact_vs_actual_join(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import join_size_report

    rng = np.random.RandomState(9)
    left = spark.createDataFrame(
        [(int(rng.zipf(1.7) % 50),) for _ in range(3000)], "k int"
    )
    right = spark.createDataFrame(
        [(int(rng.zipf(1.7) % 80),) for _ in range(2000)], "k int"
    )
    rep = join_size_report(left, right, "k").first()
    actual = left.join(right, "k").count()
    assert rep.join_rows == actual
    hot = (
        left.groupBy("k").count().withColumnRenamed("count", "cl")
        .join(right.groupBy("k").count().withColumnRenamed("count", "cr"), "k")
        .select((F.col("cl") * F.col("cr")).alias("p"))
        .agg(F.max("p"))
        .first()[0]
    )
    assert rep.max_key_product == hot
    # NULL keys never match and never count
    left_n = left.unionByName(spark.createDataFrame([(None,)], "k int"))
    rep2 = join_size_report(left_n, right, "k").first()
    assert rep2.join_rows == actual and rep2.n_keys_left == rep.n_keys_left


def test_join_size_report_empty_intersection(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import join_size_report

    a = spark.createDataFrame([(1,), (2,)], "k int")
    b = spark.createDataFrame([(7,), (9,)], "k int")
    r = join_size_report(a, b, "k").first()
    assert (r.n_keys_matched, r.join_rows, r.max_key_product) == (0, 0, 0)
    assert r.hot_key is None


# ---------------------------------------------------------------------------
# CUBE grains ≡ direct aggregations
# ---------------------------------------------------------------------------


def test_cube_grains_match_direct_aggregations(spark, sf_dir):
    from dlp_rdb_bq_import_spark.harness import QUERIES

    rows = QUERIES["cube_rollup_revenue"](spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = o.count()
    # grand total row (both rolled up)
    gt = [r for r in rows if r.g_pri == 1 and r.g_st == 1]
    assert len(gt) == 1 and gt[0].n == total
    # per-priority subtotals match a direct groupBy
    direct = {
        r.o_orderpriority: r["count"]
        for r in o.groupBy("o_orderpriority").count().collect()
    }
    cube_pri = {
        r.o_orderpriority: r.n for r in rows if r.g_pri == 0 and r.g_st == 1
    }
    assert cube_pri == direct
    # all four grains present, detail rows sum to the total
    detail = [r for r in rows if r.g_pri == 0 and r.g_st == 0]
    assert sum(r.n for r in detail) == total


# ---------------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------------


def test_personalized_pagerank_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.graph import personalized_pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 3), (4, 4)]
    seeds = [0, 5]
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    d, iters = 0.85, 30
    got = {
        r.node: r.rank
        for r in personalized_pagerank(df, sdf, damping=d, iterations=iters).collect()
    }
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: [] for v in nodes}
    for s_, t_ in edges:
        out[s_].append(t_)
    e_vec = np.array([1.0 / len(seeds) if v in seeds else 0.0 for v in nodes])
    r = e_vec.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        dm = 0.0
        for v in nodes:
            if out[v]:
                share = r[idx[v]] / len(out[v])
                for w in out[v]:
                    contrib[idx[w]] += share
            else:
                dm += r[idx[v]]
        r = (1 - d) * e_vec + d * (contrib + dm * e_vec)
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], abs=1e-8), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_personalized_pagerank_unreachable_is_zero_and_guards(spark):
    from dlp_rdb_bq_import_spark.operators.graph import personalized_pagerank

    # component {0,1} seeded; component {10,11} unreachable from seeds
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.rank for r in personalized_pagerank(df, seeds).collect()}
    assert got[10] == 0.0 and got[11] == 0.0
    assert got[0] > got[1] > 0.0
    with pytest.raises(ValueError, match="empty seed"):
        personalized_pagerank(df, seeds.where(F.col("node") < 0))
    with pytest.raises(ValueError, match="not present"):
        personalized_pagerank(
            df, spark.createDataFrame([(999,)], "node long")
        )


# ---------------------------------------------------------------------------
# Cohen's kappa hand cases
# ---------------------------------------------------------------------------


def test_cohens_kappa_hand_cases(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cohens_kappa

    # perfect agreement over 2 classes -> kappa 1
    rows = [("k", "k")] * 6 + [("d", "d")] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").first()
    assert r.kappa == 1.0 and r.p_observed == 1.0

    # independent raters at 50/50 marginals -> kappa 0
    rows = [("k", "k"), ("k", "d"), ("d", "k"), ("d", "d")] * 5
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.kappa == pytest.approx(0.0, abs=1e-12)
    assert r.p_expected == pytest.approx(0.5, abs=1e-12)

    # single shared category: p_e = 1 -> NULL kappa (undefined)
    rows = [("k", "k")] * 5
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.kappa is None

    # NULL labels excluded
    rows = [("k", "k"), ("k", None), (None, "d"), ("d", "d")]
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.n_items == 2 and r.n_agree == 2


# ---------------------------------------------------------------------------
# edge-staging regimes (graph._stage_edges)
# ---------------------------------------------------------------------------


def test_stage_edges_large_regime_reuses_cache_partitioning(spark, monkeypatch):
    """Above the bound the staged cache carries HashPartitioning AND
    sort order: a rank-side SMJ consumes it with ZERO edge-side
    exchange and ZERO edge-side sort in the round plan."""
    from dlp_rdb_bq_import_spark.operators import graph

    monkeypatch.setattr(graph, "_EDGE_STAGE_BOUND", 100)
    e = spark.range(0, 20000).select(
        (F.col("id") % 500).alias("src"), (F.col("id") % 97).alias("dst")
    )
    staged = graph._stage_edges(e, "src")
    ranks = spark.range(0, 500).select(
        F.col("id").alias("node"), F.lit(1.0).alias("rank")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = staged.join(ranks, staged.src == ranks.node)
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        outer = final.split("InMemoryRelation")[0]  # above the cache
        assert "InMemoryTableScan" in outer
        assert "Exchange hashpartitioning(src" not in outer
        # the only Sort above the cache is the rank side's (on node)
        import re

        sorts = re.findall(r"Sort \[(\w+)", outer)
        assert all(s.startswith("node") for s in sorts), sorts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        staged.unpersist()


def test_stage_edges_small_regime_skips_cache(spark):
    """At or under the bound staging returns a plain checkpoint — no
    cache, no repartition job — because |V| <= 2|E| guarantees the
    broadcast regime downstream."""
    from dlp_rdb_bq_import_spark.operators import graph

    e = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("src"), (F.col("id") % 9).alias("dst")
    )
    staged = graph._stage_edges(e, "src")
    assert staged.count() == 1000
    assert staged.storageLevel.useMemory is False  # checkpoint, not cache


# ---------------------------------------------------------------------------
# eval family: classification report, mutual information, nDCG
# ---------------------------------------------------------------------------


def test_classification_report_hand_case(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import classification_report

    rows = (
        [("a", "a")] * 3          # 3 tp for a
        + [("a", "b")] * 2        # fn for a, fp for b
        + [("b", "b")] * 4
        + [("b", "c")]            # c predicted but never true
        + [(None, "a"), ("a", None)]  # excluded
    )
    df = spark.createDataFrame(rows, "y string, p string")
    got = {r.label: r for r in classification_report(df, "y", "p").collect()}
    a, b, c = got["a"], got["b"], got["c"]
    assert (a.n_true, a.n_pred, a.tp) == (5, 3, 3)
    assert a.precision == 1.0 and a.recall == 0.6
    assert a.f1 == pytest.approx(2 * 3 / (3 + 5), abs=1e-9)
    assert (b.n_true, b.n_pred, b.tp) == (5, 6, 4)
    assert (c.n_true, c.n_pred, c.tp) == (0, 1, 0)
    assert c.precision == 0.0 and c.recall is None and c.f1 is None


def test_mutual_information_identities(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mutual_information

    # independent uniform columns -> MI 0 (micro-exact)
    rows = [(str(i % 2), str(i % 3)) for i in range(60)]
    r = mutual_information(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.n == 60 and r.mi_micro == 0 and r.mi_nats == 0.0

    # identical columns -> MI = H(A) = ln 2 for a fair binary column
    rows = [(str(i % 2), str(i % 2)) for i in range(64)]
    r = mutual_information(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.mi_nats == pytest.approx(math.log(2), abs=2e-6)

    # NULLs excluded pairwise
    rows = [("x", "u"), ("x", None), (None, "v")]
    r = mutual_information(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.n == 1


def test_ndcg_hand_cases(spark):
    from dlp_rdb_bq_import_spark.operators.retrieval import ndcg_at_k

    run = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        "query_id string, doc_id string, rank int",
    )
    # perfect ordering -> ndcg 1
    qrels = spark.createDataFrame(
        [("q", "d1", 3), ("q", "d2", 2), ("q", "d3", 1)],
        "query_id string, doc_id string, gain int",
    )
    assert ndcg_at_k(run, qrels, k=3).first().ndcg == 1.0
    # reversed gains -> the textbook ratio, computed independently
    qrels_rev = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        "query_id string, doc_id string, gain int",
    )
    got = ndcg_at_k(run, qrels_rev, k=3).first()
    disc = [1.0 / math.log2(r + 1) for r in (1, 2, 3)]
    dcg = round(1 * disc[0] * 1e6) + round(2 * disc[1] * 1e6) + round(3 * disc[2] * 1e6)
    idcg = round(3 * disc[0] * 1e6) + round(2 * disc[1] * 1e6) + round(1 * disc[2] * 1e6)
    assert got.dcg_micro == dcg and got.idcg_micro == idcg
    assert got.ndcg == pytest.approx(dcg / idcg, abs=1e-9)
    # no positive qrels -> NULL ndcg, not zero
    empty_q = spark.createDataFrame(
        [("q", "d9", 0)], "query_id string, doc_id string, gain int"
    )
    assert ndcg_at_k(run, empty_q, k=3).first().ndcg is None
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(run, qrels, k=0)


# ---------------------------------------------------------------------------
# drift + independence monitors
# ---------------------------------------------------------------------------


def test_psi_identical_distributions_near_zero(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import (
        population_stability_index,
    )

    rng = np.random.RandomState(4)
    vals = rng.gamma(2.0, 50.0, 4000)
    ref = spark.createDataFrame([(float(v),) for v in vals[:2000]], "v double")
    cur = spark.createDataFrame([(float(v),) for v in vals[2000:]], "v double")
    rows = population_stability_index(ref, cur, "v", n_bins=10).collect()
    assert len(rows) == 10
    psi = rows[0].psi
    assert all(r.psi == psi for r in rows)
    assert psi < 0.05  # same distribution ⟹ comfortably 'stable'
    # a hard shift blows past the 0.25 drift gate
    shifted = spark.createDataFrame(
        [(float(v * 3 + 500),) for v in vals[2000:]], "v double"
    )
    psi2 = population_stability_index(ref, shifted, "v", n_bins=10).first().psi
    assert psi2 > 0.25
    with pytest.raises(ValueError, match="n_bins"):
        population_stability_index(ref, cur, "v", n_bins=1)


def test_psi_matches_reference_formula(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import (
        population_stability_index,
    )

    rng = np.random.RandomState(8)
    a = rng.normal(0, 1, 1000)
    b = rng.normal(0.5, 1.3, 800)
    ref = spark.createDataFrame([(float(v),) for v in a], "v double")
    cur = spark.createDataFrame([(float(v),) for v in b], "v double")
    k = 10
    rows = population_stability_index(ref, cur, "v", n_bins=k).collect()
    bounds = np.percentile(a, [100 * i / k for i in range(1, k)])
    rbin = np.array([1 + np.sum(v > bounds) for v in a])
    cbin = np.array([1 + np.sum(v > bounds) for v in b])
    expect = 0.0
    for i in range(1, k + 1):
        nr, nc = int(np.sum(rbin == i)), int(np.sum(cbin == i))
        p = (nr + 0.5) / (1000 + k * 0.5)
        q = (nc + 0.5) / (800 + k * 0.5)
        expect += round((q - p) * math.log(q / p) * 1e9) / 1e9
    got = rows[0].psi
    assert got == pytest.approx(expect, abs=1e-6)


def test_chi_square_identities(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import (
        chi_square_independence,
    )

    # perfectly independent 2x3 design -> chi2 exactly 0
    rows = [(str(i % 2), str(i % 3)) for i in range(60)]
    r = chi_square_independence(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.chi2 == 0.0 and r.dof == 2 and r.n == 60

    # perfect dependence on a 2x2 -> chi2 = n
    rows = [(str(i % 2), str(i % 2)) for i in range(40)]
    r = chi_square_independence(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.chi2 == pytest.approx(40.0, abs=1e-6) and r.dof == 1

    # single-category column -> dof 0, NULL chi2
    rows = [("x", str(i % 3)) for i in range(9)]
    r = chi_square_independence(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).first()
    assert r.dof == 0 and r.chi2 is None
