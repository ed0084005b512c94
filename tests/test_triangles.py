"""Unit tests for graph.triangle_count: known closed forms, brute-force
parity on a pseudo-random graph, input canonicalization, and guards."""

from __future__ import annotations

import itertools

import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.graph import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _brute(pairs):
    """Reference per-node triangle counts via itertools over the
    canonical undirected edge set."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({n for e in es for n in e})
    tri = {n: 0 for n in nodes}
    deg = {n: 0 for n in nodes}
    for u, v in es:
        deg[u] += 1
        deg[v] += 1
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (deg[n], tri[n]) for n in nodes}


def test_complete_k4(spark):
    pairs = list(itertools.combinations(range(4), 2))
    out = triangle_count(_edges(spark, pairs)).collect()
    assert len(out) == 4
    for r in out:
        assert r["degree"] == 3
        assert r["triangles"] == 3  # C(3,2) wedges at each node, all closed
    # total triangle incidences = 3 * (# triangles) = 3 * C(4,3)
    assert sum(r["triangles"] for r in out) == 3 * 4


def test_triangle_free_graph(spark):
    # star graph: hub 0 to leaves 1..5 — no triangles anywhere
    pairs = [(0, i) for i in range(1, 6)]
    out = {r["node"]: (r["degree"], r["triangles"])
           for r in triangle_count(_edges(spark, pairs)).collect()}
    assert out[0] == (5, 0)
    assert all(out[i] == (1, 0) for i in range(1, 6))


def test_matches_bruteforce_on_random_graph(spark):
    # deterministic pseudo-random graph on 20 nodes
    pairs = [((7 * i + 3) % 20, (11 * i + 5) % 20) for i in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {r["node"]: (r["degree"], r["triangles"])
           for r in triangle_count(_edges(spark, pairs)).collect()}
    assert got == _brute(pairs)


def test_canonicalization_direction_parallel_selfloops(spark):
    # triangle {1,2,3} expressed with reversed duplicates and self-loops
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (2, 2)]
    out = {r["node"]: (r["degree"], r["triangles"])
           for r in triangle_count(_edges(spark, pairs)).collect()}
    assert out == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


def test_reserved_name_guard(spark):
    df = spark.createDataFrame([Row(node=1, degree=2)])
    with pytest.raises(ValueError, match="reserved"):
        triangle_count(df, src_col="node", dst_col="degree")


# ---------------------------------------------------------------------------
# kcore
# ---------------------------------------------------------------------------

from dlp_rdb_bq_import_spark.operators.graph import kcore  # noqa: E402


def _brute_kcore(pairs, k):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        deg: dict[int, int] = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        es = {(u, v) for u, v in es if u not in drop and v not in drop}


def test_kcore_peels_tendril_off_clique(spark):
    # K4 clique (nodes 0-3) plus a path 3-4-5 hanging off it
    clique = list(itertools.combinations(range(4), 2))
    pairs = clique + [(3, 4), (4, 5)]
    out = {r["node"]: r["degree"] for r in kcore(_edges(spark, pairs), k=2).collect()}
    # path nodes peel away (degree 1 after the endpoint goes); clique stays
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_cascade_requires_iteration(spark):
    # chain 0-1-2-3: peeling endpoints cascades until nothing is left at k=2
    pairs = [(0, 1), (1, 2), (2, 3)]
    assert kcore(_edges(spark, pairs), k=2).count() == 0


def test_kcore_matches_bruteforce_random(spark):
    pairs = [((7 * i + 3) % 20, (11 * i + 5) % 20) for i in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    for k in (2, 3, 4):
        got = {r["node"]: r["degree"]
               for r in kcore(_edges(spark, pairs), k=k).collect()}
        assert got == _brute_kcore(pairs, k), k


def test_kcore_k_guard(spark):
    with pytest.raises(ValueError, match="k must be"):
        kcore(_edges(spark, [(1, 2)]), k=0)


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

from dlp_rdb_bq_import_spark.operators.graph import label_propagation  # noqa: E402


def test_label_prop_two_cliques_one_bridge(spark):
    # two K4 cliques {0..3} and {10..13} joined by a single bridge edge:
    # each clique converges to its own community
    c1 = list(itertools.combinations(range(4), 2))
    c2 = list(itertools.combinations(range(10, 14), 2))
    pairs = c1 + c2 + [(3, 10)]
    out = {r["node"]: r["community"]
           for r in label_propagation(_edges(spark, pairs)).collect()}
    assert len({out[i] for i in range(4)}) == 1
    assert len({out[i] for i in range(10, 14)}) == 1
    assert out[0] != out[12]


def test_label_prop_deterministic(spark):
    pairs = [((7 * i + 3) % 15, (11 * i + 5) % 15) for i in range(40)]
    pairs = [(a, b) for a, b in pairs if a != b]
    a = sorted(map(tuple, label_propagation(_edges(spark, pairs)).collect()))
    b = sorted(map(tuple, label_propagation(_edges(spark, pairs)).collect()))
    assert a == b


def test_label_prop_isolated_pair_is_own_community(spark):
    out = {r["node"]: r["community"]
           for r in label_propagation(_edges(spark, [(1, 2), (5, 6)])).collect()}
    assert out[1] == out[2]
    assert out[5] == out[6]
    assert out[1] != out[5]


# ---------------------------------------------------------------------------
# driver-visible fixture graph (harness kcore_supplier / communities_supplier)
# ---------------------------------------------------------------------------


def test_supplier_domestic_graph_queries_nondegenerate(spark):
    """The registered graph queries run on the domestic co-supply graph
    at sf0.01 and their cross-fixture invariants hold: communities are
    plural and each sits inside ONE nation (nation blocks are
    disconnected by construction); the 2-core is a proper nonempty
    subset with every in-core degree >= 2."""
    import os

    from dlp_rdb_bq_import_spark import harness

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf, "supplier.parquet")):
        pytest.skip("sf0.01 fixtures not present")
    nations = {
        r.s_suppkey: r.s_nationkey
        for r in harness.t(spark, sf, "supplier")
        .select("s_suppkey", "s_nationkey")
        .collect()
    }
    comm = harness.queries()["communities_supplier"](spark, sf).collect()
    assert len(comm) > 0
    by_comm = {}
    for r in comm:
        by_comm.setdefault(r.community, set()).add(nations[r.node])
    assert len(by_comm) > 1
    assert all(len(nats) == 1 for nats in by_comm.values())
    core = harness.queries()["kcore_supplier"](spark, sf).collect()
    assert 0 < len(core) < len(comm)  # proper nonempty subset of the nodes
    assert all(r.degree >= 2 for r in core)


# ---------------------------------------------------------------------------
# connected components (alternating star contraction)
# ---------------------------------------------------------------------------


def _uf_components(edges):
    nodes = sorted({n for e in edges for n in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in comp.values() for n in ms}


def test_connected_components_matches_union_find(spark):
    import numpy as np

    from dlp_rdb_bq_import_spark.operators.graph import connected_components

    rng = np.random.default_rng(3)
    edges = [
        (int(rng.integers(1, 300)), int(rng.integers(1, 300)))
        for _ in range(220)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _uf_components(edges)
    # partitioning invariance
    got7 = {
        r.node: r.component
        for r in connected_components(df.repartition(7)).collect()
    }
    assert got7 == got


def test_connected_components_deep_path_converges(spark):
    """A 1000-hop chain: label propagation at its default 20-round cap
    cannot label this; star contraction flattens it in O(log n)."""
    from dlp_rdb_bq_import_spark.operators.graph import connected_components

    path = [(i, i + 1) for i in range(1, 1001)]
    df = spark.createDataFrame(path, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert len(got) == 1001 and set(got.values()) == {1}


def test_connected_components_edges_and_validation(spark):
    from dlp_rdb_bq_import_spark.operators.graph import connected_components

    # self-loops and duplicate/reversed edges are canonicalized away
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 2), (3, 4), (4, 3)], "src long, dst long"
    )
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
    with pytest.raises(ValueError, match="reserved"):
        connected_components(
            df.withColumnRenamed("src", "node"), src_col="node"
        )
