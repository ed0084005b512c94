"""Round-12 operator wave: Spearman ρ, Kruskal-Wallis H, Cliff's δ,
Chao1 richness, bigram repetition, degree assortativity, and
common-neighbors link prediction — each pinned against an independent
pure-Python reference computed inline (no shared code with the
operators)."""

from __future__ import annotations

import collections
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def _midranks(vals):
    c = collections.Counter(vals)
    out, cum = {}, 0
    for v in sorted(c):
        out[v] = cum + (c[v] + 1) / 2
        cum += c[v]
    return [out[v] for v in vals]


# ---------------------------------------------------------------------------
# spearman_correlation
# ---------------------------------------------------------------------------


def test_spearman_matches_midrank_pearson(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import spearman_correlation

    rows = [(1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0), (4.0, 5.0), (5.0, 5.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = spearman_correlation(df, "x", "y").collect()[0]
    rx = _midranks([r[0] for r in rows])
    ry = _midranks([r[1] for r in rows])
    want = np.corrcoef(rx, ry)[0, 1]
    assert got.n == 6 and abs(got.rho - want) < 1e-9


def test_spearman_perfect_monotone_and_constant(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import spearman_correlation

    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 30)], "x double, y double"
    )
    assert spearman_correlation(mono, "x", "y").collect()[0].rho == 1.0
    const = spark.createDataFrame(
        [(float(i), 7.0) for i in range(10)], "x double, y double"
    )
    assert spearman_correlation(const, "x", "y").collect()[0].rho is None


def test_spearman_null_listwise(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import spearman_correlation

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (None, 3.0), (4.0, 4.0), (5.0, 2.0)],
        "x double, y double",
    )
    got = spearman_correlation(df, "x", "y").collect()[0]
    rx, ry = _midranks([1.0, 4.0, 5.0]), _midranks([1.0, 4.0, 2.0])
    assert got.n == 3 and abs(got.rho - np.corrcoef(rx, ry)[0, 1]) < 1e-9


# ---------------------------------------------------------------------------
# kruskal_wallis_test
# ---------------------------------------------------------------------------


def _kw_reference(groups):
    allv = [v for g in groups.values() for v in g]
    ranks = dict(zip(allv, _midranks(allv)))  # wrong for dup values...
    # recompute properly: rank list aligned to allv
    rlist = _midranks(allv)
    n = len(allv)
    i = 0
    sums = {}
    for g, vals in groups.items():
        sums[g] = sum(rlist[i : i + len(vals)])
        i += len(vals)
    s = sum(rs * rs / len(groups[g]) for g, rs in sums.items())
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    c = collections.Counter(allv)
    t = sum(x**3 - x for x in c.values())
    corr = 1 - t / (n**3 - n)
    return h / corr, corr


def test_kruskal_wallis_matches_reference_with_ties(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import kruskal_wallis_test

    groups = {
        "a": [1.0, 2.0, 3.0],
        "b": [2.0, 4.0, 5.0],
        "c": [5.0, 6.0],
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.group: r for r in kruskal_wallis_test(df, "g", "v").collect()}
    want_h, want_c = _kw_reference(groups)
    r = out["a"]
    assert r.n_total == 8 and r.dof == 2
    assert abs(r.h - want_h) < 1e-6
    assert abs(r.tie_correction - want_c) < 1e-9
    # per-group mean ranks: a -> (1 + 2.5 + 4)/3
    assert abs(out["a"].mean_rank - 2.5) < 1e-9
    assert abs(out["c"].mean_rank - 7.25) < 1e-9


def test_kruskal_wallis_single_group_null_h(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import kruskal_wallis_test

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    r = kruskal_wallis_test(df, "g", "v").collect()[0]
    assert (r.dof, r.h) == (0, None)


def test_kruskal_wallis_all_tied_null(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import kruskal_wallis_test

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0)], "g string, v double"
    )
    r = kruskal_wallis_test(df, "g", "v").collect()[0]
    assert r.h is None  # tie correction hits 0 — H undefined


# ---------------------------------------------------------------------------
# cliffs_delta
# ---------------------------------------------------------------------------


def test_cliffs_delta_manual_pairs(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cliffs_delta

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = cliffs_delta(df, "g", "v", "a", "b").collect()[0]
    # pairs (a,b): a>b only (3,2); a<b: (1,2),(1,4),(2,4),(3,4); tie (2,2)
    assert (r.n_a, r.n_b, r.gt_pairs, r.lt_pairs) == (3, 2, 1, 4)
    assert abs(r.delta - (1 - 4) / 6) < 1e-9


def test_cliffs_delta_extremes_and_empty_group(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cliffs_delta

    sep = spark.createDataFrame(
        [("a", 10.0), ("a", 11.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    assert cliffs_delta(sep, "g", "v", "a", "b").collect()[0].delta == 1.0
    onesided = spark.createDataFrame([("a", 1.0)], "g string, v double")
    r = cliffs_delta(onesided, "g", "v", "a", "b").collect()[0]
    assert (r.n_b, r.delta) == (0, None)


def test_cliffs_delta_brute_force_random(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import cliffs_delta

    rng = np.random.default_rng(7)
    a = [round(float(x), 2) for x in rng.normal(0, 1, 80)]
    b = [round(float(x), 2) for x in rng.normal(0.4, 1, 60)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = cliffs_delta(df, "g", "v", "a", "b").collect()[0]
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    assert (r.gt_pairs, r.lt_pairs) == (gt, lt)
    assert abs(r.delta - (gt - lt) / (80 * 60)) < 1e-9


# ---------------------------------------------------------------------------
# chao1_richness
# ---------------------------------------------------------------------------


def test_chao1_manual(spark):
    from dlp_rdb_bq_import_spark.operators.text import chao1_richness

    df = spark.createDataFrame(
        [("a a b b c d e",), ("f f g",)], "text string"
    )
    r = chao1_richness(df).collect()[0]
    # counts: a2 b2 c1 d1 e1 f2 g1 -> vocab 7, f1=4, f2=3
    assert (r.n_tokens, r.vocab, r.f1, r.f2) == (10, 7, 4, 3)
    want = 7 + 4 * 3 / (2 * 4)
    assert abs(r.chao1 - want) < 1e-9
    assert abs(r.coverage - 7 / want) < 1e-9


def test_chao1_no_singletons_equals_vocab(spark):
    from dlp_rdb_bq_import_spark.operators.text import chao1_richness

    df = spark.createDataFrame([("x x y y",)], "text string")
    r = chao1_richness(df).collect()[0]
    assert r.chao1 == 2.0 and r.coverage == 1.0


# ---------------------------------------------------------------------------
# bigram_repetition_stats
# ---------------------------------------------------------------------------


def test_bigram_repetition_manual(spark):
    from dlp_rdb_bq_import_spark.operators.text import bigram_repetition_stats

    df = spark.createDataFrame(
        [
            (1, "the cat sat the cat ran"),  # bigrams: the-cat x2 of 5
            (2, "one two three"),  # all distinct
            (3, "go"),  # no bigrams
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_repetition_stats(df).collect()}
    assert got[1].n_bigrams == 5
    assert abs(got[1].dup_bigram_ratio - 2 / 5) < 1e-9
    assert abs(got[1].top_bigram_ratio - 2 / 5) < 1e-9
    assert got[2].n_bigrams == 2 and got[2].dup_bigram_ratio == 0.0
    assert got[3].n_bigrams == 0 and got[3].top_bigram_ratio == 0.0
    assert got[4].n_bigrams == 0  # NULL text still emits a row


def test_bigram_repetition_fully_templated(spark):
    from dlp_rdb_bq_import_spark.operators.text import bigram_repetition_stats

    df = spark.createDataFrame([(1, "ha ha ha ha ha")], "doc_id long, text string")
    r = bigram_repetition_stats(df).collect()[0]
    assert r.n_bigrams == 4 and r.dup_bigram_ratio == 1.0 and r.top_bigram_ratio == 1.0


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------


def test_assortativity_star_is_negative_one(spark):
    """A star graph is perfectly disassortative: every edge joins the
    hub (degree k) to a leaf (degree 1) — r = −1."""
    from dlp_rdb_bq_import_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = degree_assortativity(edges).collect()[0]
    assert (r.n_nodes, r.n_edges) == (6, 5)
    assert abs(r.assortativity - (-1.0)) < 1e-9


def test_assortativity_matches_numpy_reference(spark):
    from dlp_rdb_bq_import_spark.operators.graph import degree_assortativity

    raw = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (2, 6), (1, 1)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    canon = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    deg = collections.Counter()
    for a, b in canon:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in canon:  # symmetrized
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    want = np.corrcoef(xs, ys)[0, 1]
    r = degree_assortativity(edges).collect()[0]
    assert (r.n_nodes, r.n_edges) == (len(deg), len(canon))
    assert abs(r.assortativity - want) < 1e-9


def test_assortativity_regular_graph_null(spark):
    """A cycle is degree-constant — zero variance, NULL coefficient."""
    from dlp_rdb_bq_import_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    assert degree_assortativity(edges).collect()[0].assortativity is None


# ---------------------------------------------------------------------------
# common_neighbors_linkpred
# ---------------------------------------------------------------------------


def test_linkpred_manual_scores(spark):
    from dlp_rdb_bq_import_spark.operators.graph import common_neighbors_linkpred

    # path 1-2-3 plus 2-4: non-adjacent pairs through hub 2 (deg 3):
    # (1,3), (1,4), (3,4) each share exactly {2}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {
        (r.node_a, r.node_b): r
        for r in common_neighbors_linkpred(edges).collect()
    }
    assert set(got) == {(1, 3), (1, 4), (3, 4)}
    for r in got.values():
        assert r.common == 1
        assert abs(r.jaccard - 1.0) < 1e-9  # deg 1 + deg 1 - 1 = 1
        assert abs(r.adamic_adar - 1.0 / math.log(3.0)) < 1e-6


def test_linkpred_excludes_existing_edges(spark):
    from dlp_rdb_bq_import_spark.operators.graph import common_neighbors_linkpred

    # triangle + pendant: (1,2),(2,3),(1,3) adjacent; 4 hangs off 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {
        (r.node_a, r.node_b): r
        for r in common_neighbors_linkpred(edges).collect()
    }
    # adjacent pairs (1,2),(2,3),(1,3) never appear despite shared nbrs
    assert set(got) == {(1, 4), (2, 4)}
    r = got[(1, 4)]  # share {3}: deg(1)=2, deg(4)=1 -> jaccard 1/2
    assert r.common == 1 and abs(r.jaccard - 0.5) < 1e-9


def test_linkpred_min_common_validation(spark):
    from dlp_rdb_bq_import_spark.operators.graph import common_neighbors_linkpred

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="min_common"):
        common_neighbors_linkpred(edges, min_common=0)
