"""Recall/containment tests for the approximate (no-oracle) LLM-data
operators — the pytest side of the correctness gate for queries the
DuckDB oracle cannot express:

- LSH kNN recall vs the exact ``brute_force_topk`` oracle,
- MinHash-LSH pair containment within exact n-gram Jaccard pairs,
- SimHash pair symmetry / Hamming bounds,
- approx_count_distinct relative error vs exact,
- winnowing fingerprints pinned against an independent reference
  implementation of the public algorithm (Schleimer et al., SIGMOD'03),
- multimodal feature extraction determinism.

A note on recall bounds: the ``embeddings`` fixture is isotropic random
data (max pairwise cosine ≈0.5 at 64 dims), where ANY sublinear
candidate scheme is information-theoretically weak — near-threshold
"signal" pairs are statistically indistinguishable from noise pairs.
LSH's operating regime is high-cosine near-duplicates, so recall is
asserted strictly on PLANTED near-dup clusters and loosely (plus exact
containment/precision) on the fixture.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dlp_rdb_bq_import_spark.operators import (
    dedup,
    sampling,
    similarity,
    text as text_ops,
)
from dlp_rdb_bq_import_spark.operators.multimodal import attach_payload
from dlp_rdb_bq_import_spark.harness import t as load_table


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted_embeddings(spark):
    """20 clusters × (1 base + 3 tiny perturbations) + 120 random
    vectors, dim 32. Intra-cluster cosine > 0.99 — the operating regime
    an embedding near-dup / ANN operator exists for."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _ in range(20):
        base = rng.normal(size=32)
        base /= np.linalg.norm(base)
        for _ in range(4):
            v = base + rng.normal(scale=0.01, size=32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(120):
        v = rng.normal(size=32)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema).cache()


# ---------------------------------------------------------------------------
# LSH kNN recall (makes similarity.lsh_topk's docstring claim true)
# ---------------------------------------------------------------------------


def test_lsh_topk_recall_planted(spark, planted_embeddings):
    """On clustered data, banded sign-LSH must recover almost all of the
    exact top-3 (cluster members dominate every top-3)."""
    e = planted_embeddings
    queries = e.where(F.col("vec_id") < 80)  # the clustered vectors
    exact = {
        (r["qid"], r["nid"])
        for r in similarity.brute_force_topk(queries, e, k=3).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in similarity.lsh_topk(queries, e, k=3, bands=16, bits_per_band=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"planted-cluster LSH recall {recall:.3f} < 0.9"


def test_ivf_topk_recall_planted(spark, planted_embeddings):
    """IVF with a healthy probe ratio must also recover the planted
    top-3: cluster members land in the same k-means cell as their base
    vector, so probing the query's nearest cells finds them."""
    e = planted_embeddings
    queries = e.where(F.col("vec_id") < 80)
    exact = {
        (r["qid"], r["nid"])
        for r in similarity.brute_force_topk(queries, e, k=3).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in similarity.ivf_topk(queries, e, k=3, n_cells=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"planted-cluster IVF recall {recall:.3f} < 0.9"


def test_ivf_deterministic_across_runs(spark, planted_embeddings):
    """The whole IVF path (sample → k-means → assign → rerank) must be
    a pure function of the data: two independent runs give identical
    rows."""
    e = planted_embeddings
    queries = e.where(F.col("vec_id") < 20)
    a = sorted(map(tuple, similarity.ivf_topk(queries, e, k=3, n_cells=16, nprobe=4).collect()))
    b = sorted(map(tuple, similarity.ivf_topk(queries, e, k=3, n_cells=16, nprobe=4).collect()))
    assert a == b



def test_lsh_topk_fixture_containment(spark, sf_dir):
    """On the (isotropic random) fixture: every LSH-reported cosine must
    equal the exact cosine for that pair — precision 1.0 by exact
    rerank — and recall is reported but only loosely bounded (see module
    docstring)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(queries, e, k=5)
    approx = similarity.lsh_topk(queries, e, k=5, bands=16, bits_per_band=8)
    ex = {(r["qid"], r["nid"]): r["cosine"] for r in exact.collect()}
    ap_all = similarity.cosine_pairs(queries, e).collect()
    true_cos = {(r["qid"], r["nid"]): r["cosine"] for r in ap_all}
    ap = {(r["qid"], r["nid"]): r["cosine"] for r in approx.collect()}
    for pair, cos in ap.items():
        assert true_cos[pair] == cos  # exact rerank ⇒ reported cosine is exact
    recall = len(set(ex) & set(ap)) / len(ex)
    assert recall >= 0.15, f"fixture LSH recall {recall:.3f} collapsed"


def test_embedding_neardup_lsh_contained_in_exact(spark, planted_embeddings):
    """LSH near-dup pairs are a subset of exact all-pairs near-dups with
    identical cosines (precision 1.0), and on clustered data recall of
    the high-cosine pairs is ~1."""
    e = planted_embeddings
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.embedding_neardup_pairs_exact(e, threshold=0.9).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.embedding_neardup_pairs(
            e, threshold=0.9, bands=16, bits_per_band=8
        ).collect()
    }
    assert set(approx) <= set(exact)
    for pair, cos in approx.items():
        assert exact[pair] == cos
    recall = len(approx) / len(exact)
    assert recall >= 0.95, f"planted near-dup recall {recall:.3f} < 0.95"


def test_sign_lsh_empty_input(spark):
    """Empty input must yield an empty result, not a driver crash
    (regression: dim used to be probed with .first() at plan time)."""
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    assert similarity.sign_lsh_bands(empty).count() == 0
    assert similarity.embedding_neardup_pairs(empty).count() == 0


# ---------------------------------------------------------------------------
# MinHash-LSH containment vs exact Jaccard
# ---------------------------------------------------------------------------


def test_minhash_pairs_contained_in_exact_jaccard(spark, sf_dir):
    """Char-unit MinHash-LSH output ⊆ exact char-n-gram Jaccard pairs at
    the same threshold, with identical jaccard values (the verification
    step computes the same exact metric on candidates)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            d, "text", "doc_id", n=5, threshold=0.35, max_doc_freq=None
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_dedup_pairs(
            d, "text", "doc_id", threshold=0.35, shingle_n=5, shingle_unit="char"
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert exact[pair] == j
    if exact:
        assert len(lsh) / len(exact) >= 0.5  # banding recall on real dups


def test_minhash_word_unit_finds_planted_dups(spark):
    """Two identical documents → jaccard 1.0 pair; unrelated word-soup
    must NOT flood the candidate set (background word-trigram overlap
    ≈ 0)."""
    words = [f"w{i}" for i in range(200)]
    rng = np.random.default_rng(3)
    docs = []
    for i in range(30):
        docs.append((i, " ".join(rng.choice(words, size=60))))
    docs.append((100, docs[0][1]))  # exact copy of doc 0
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = dedup.minhash_dedup_pairs(
        df, "text", "doc_id", threshold=0.8, shingle_n=3, shingle_unit="word"
    ).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert found.get((0, 100)) == 1.0
    assert len(found) <= 3  # no quadratic candidate soup from noise


def test_incremental_minhash_matches_full_corpus_lsh(spark, sf_dir):
    """Signatures depend only on the document itself, so new-vs-corpus
    incremental candidates must EQUAL the full-corpus LSH candidate set
    restricted to new×corpus pairs (same bands, same hash family), and
    the planted near-identical doc is found with est_jaccard ~1."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    corpus = d.where(F.col("doc_id") % 5 != 0)
    new = d.where(F.col("doc_id") % 5 == 0).unionByName(
        corpus.where(F.col("doc_id") == 1).withColumn("doc_id", F.lit(900))
    )
    kw = dict(num_hashes=64, shingle_n=3, shingle_unit="word")
    index = dedup.minhash_signatures(corpus, "text", "doc_id", **kw)
    inc = {
        (r.new_id, r.corpus_id): r.est_jaccard
        for r in dedup.incremental_minhash_pairs(
            new, index, "text", "doc_id",
            threshold=0.0, bands=16, shingle_n=3, shingle_unit="word",
        ).collect()
    }
    full_sigs = dedup.minhash_signatures(
        corpus.unionByName(new), "text", "doc_id", **kw
    )
    full = set(
        map(tuple, dedup.minhash_lsh_candidates(full_sigs, "doc_id", bands=16).collect())
    )
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    cross = {
        (a, b) if a in new_ids else (b, a)
        for a, b in full
        if (a in new_ids) != (b in new_ids)
        and (a in corpus_ids or b in corpus_ids)
    }
    assert set(inc) == cross
    assert inc[(900, 1)] == 1.0  # planted exact copy: all components agree


def test_incremental_minhash_index_roundtrips_through_warehouse(spark, tmp_path):
    """The signature index persists via the warehouse sink and the
    re-read index yields identical incremental pairs — the standing-
    corpus artifact a batch pipeline stores between ingests."""
    from dlp_rdb_bq_import_spark.sinks.warehouse import Warehouse

    words = [f"w{i}" for i in range(100)]
    rng = np.random.default_rng(7)
    corpus = spark.createDataFrame(
        [(i, " ".join(rng.choice(words, size=40))) for i in range(20)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(100, corpus.collect()[3].text), (101, "completely different words only")],
        ["doc_id", "text"],
    )
    index = dedup.minhash_signatures(
        corpus, "text", "doc_id", num_hashes=64, shingle_n=3, shingle_unit="word"
    )
    wh = Warehouse(str(tmp_path))
    assert wh.write(index, "DEDUP", "MINHASH_INDEX").status == "ok"
    reread = wh.read(spark, "DEDUP", "MINHASH_INDEX")
    kw = dict(threshold=0.5, bands=16, shingle_n=3, shingle_unit="word")
    direct = sorted(
        map(tuple, dedup.incremental_minhash_pairs(new, index, "text", "doc_id", **kw).collect())
    )
    persisted = sorted(
        map(tuple, dedup.incremental_minhash_pairs(new, reread, "text", "doc_id", **kw).collect())
    )
    assert direct == persisted
    assert [(p[0], p[1]) for p in persisted] == [(100, 3)]


def test_incremental_minhash_estimator_quality(spark):
    """The component-agreement estimate agree/k is the classic unbiased
    MinHash Jaccard estimator with std error sqrt(J(1-J)/k) — pin it:
    doc pairs with KNOWN true shingle-set Jaccard (computed exactly in
    the test from the same word 3-gram definition) must estimate within
    a 3-sigma band, and every pair with J >= 0.45 must surface as a
    banded candidate at bands=32 (r=2: candidate odds 1-(1-J^2)^32 >
    0.999)."""
    import math

    k = 64
    pairs = []  # (new_id, corpus_id, true_jaccard)
    corpus_rows, new_rows = [], []
    for j, keep in enumerate(range(20, 58, 4)):  # shared prefix length
        a_words = [f"p{j}a{i}" for i in range(60)]
        b_words = a_words[:keep] + [f"p{j}b{i}" for i in range(60 - keep)]
        ga = {" ".join(a_words[i : i + 3]) for i in range(len(a_words) - 2)}
        gb = {" ".join(b_words[i : i + 3]) for i in range(len(b_words) - 2)}
        true_j = len(ga & gb) / len(ga | gb)
        corpus_rows.append((j, " ".join(a_words)))
        new_rows.append((1000 + j, " ".join(b_words)))
        pairs.append((1000 + j, j, true_j))
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])
    index = dedup.minhash_signatures(
        corpus, "text", "doc_id", num_hashes=k, shingle_n=3, shingle_unit="word"
    )
    est = {
        (r.new_id, r.corpus_id): r.est_jaccard
        for r in dedup.incremental_minhash_pairs(
            new, index, "text", "doc_id",
            threshold=0.0, bands=32, shingle_n=3, shingle_unit="word",
        ).collect()
    }
    for new_id, corpus_id, true_j in pairs:
        if true_j < 0.45:
            continue  # banding may legitimately miss low-J pairs
        assert (new_id, corpus_id) in est, f"J={true_j:.2f} pair not a candidate"
        sigma = math.sqrt(true_j * (1 - true_j) / k)
        err = abs(est[(new_id, corpus_id)] - true_j)
        assert err <= 3 * sigma + 1 / (2 * k), (
            f"pair {(new_id, corpus_id)}: est {est[(new_id, corpus_id)]:.3f} "
            f"vs true {true_j:.3f} (3σ={3 * sigma:.3f})"
        )


def test_incremental_curation_per_stage_drops(spark, sf_dir):
    """The end-to-end composition drops exactly the planted doc at each
    stage: the verbatim corpus copy (exact), the appended-tail copy
    (MinHash vs the persisted index), the verbatim benchmark copy
    (decontamination) — and every organic new-batch doc that survives
    carries packing columns."""
    from dlp_rdb_bq_import_spark import harness

    # guard against fixture renumbering: the plants derive from docs
    # 1, 2, and 5 — if those ids vanish the drops below pass vacuously
    docs = load_table(spark, sf_dir, "documents")
    assert docs.where(F.col("doc_id").isin(1, 2, 5)).count() == 3

    out = harness.queries()["incremental_curation"](spark, sf_dir).collect()
    ids = {r.doc_id for r in out}
    assert 100001 not in ids  # exact stage: verbatim corpus doc 1
    assert 200002 not in ids  # minhash stage: corpus doc 2 + tail
    assert 300005 not in ids  # decontam stage: verbatim bench doc 5
    assert ids and all(i % 10 == 0 for i in ids)  # organic batch docs only
    for r in out:
        assert r.seq_id >= 0 and 0 <= r.seq_offset < 4096 and r.n_tokens > 0


def test_minhash_lsh_banding_curve(spark):
    """Candidate probability must follow the banding curve
    1-(1-J^r)^b (k=64, bands=16 ⇒ r=4): ~2% of J≈0.2 pairs and ~100%
    of J≈0.81 pairs band together. Discriminates the keyed family from
    the correlated one both ways — perfectly-correlated components
    give P(candidate)=J, i.e. ~12/60 low-J and ~49/60 high-J."""
    rows, expected_pairs = [], {"low": [], "high": []}
    for j, (label, keep) in enumerate(
        [("low", 21)] * 60 + [("high", 54)] * 60
    ):
        a_words = [f"q{j}a{i}" for i in range(60)]
        b_words = a_words[:keep] + [f"q{j}b{i}" for i in range(60 - keep)]
        rows += [(2 * j, " ".join(a_words)), (2 * j + 1, " ".join(b_words))]
        expected_pairs[label].append((2 * j, 2 * j + 1))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = dedup.minhash_signatures(
        df, "text", "doc_id", num_hashes=64, shingle_n=3, shingle_unit="word"
    )
    cands = set(
        map(tuple, dedup.minhash_lsh_candidates(sigs, "doc_id", bands=16).collect())
    )
    low = sum(1 for p in expected_pairs["low"] if p in cands or p[::-1] in cands)
    high = sum(1 for p in expected_pairs["high"] if p in cands or p[::-1] in cands)
    # J=19/97≈0.196 ⇒ P≈0.023, E≈1.4 of 60 (correlated family: E≈12)
    assert low <= 8, f"low-J candidate count {low} exceeds banding curve"
    # J=52/64≈0.8125 ⇒ P≈0.9999, E≈60 (correlated family: E≈49)
    assert high >= 55, f"high-J candidate count {high} below banding curve"


def test_contamination_spans_planted_leak(spark):
    """A train doc quoting a benchmark passage verbatim yields exactly
    the quoted span (1-based inclusive); clean docs yield nothing;
    sub-threshold quotes (< min_len chars) are ignored."""
    from dlp_rdb_bq_import_spark.operators.decontam import contamination_spans

    passage = "0123456789" * 5  # 50 chars of bench text
    train = spark.createDataFrame(
        [
            (1, "A" * 30 + passage + "B" * 20),   # leak at pos 31..80
            (2, "C" * 100),                        # clean
            (3, "D" * 40 + passage[:30] + "E" * 30),  # 30 < min_len: clean
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, "x " + passage + " y")], ["doc_id", "text"])
    got = sorted(
        map(tuple, contamination_spans(train, bench, "text", "doc_id", min_len=40).collect())
    )
    assert got == [(1, 31, 80)]


def test_merge_signature_index_and_cross_batch_catch(spark, sf_dir):
    """Index maintenance: merged index = old rows minus collisions plus
    new rows (new wins), k mismatch raises, and the two-batch harness
    query catches its planted near-dup against a BATCH-1 document that
    was never in the original corpus."""
    from dlp_rdb_bq_import_spark import harness

    a = spark.createDataFrame([(1, "x y z w q"), (2, "p q r s t")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "fresh words here now ok"), (3, "m n o p q")], ["doc_id", "text"])
    kw = dict(num_hashes=16, shingle_n=3, shingle_unit="word")
    ia = dedup.minhash_signatures(a, "text", "doc_id", **kw)
    ib = dedup.minhash_signatures(b, "text", "doc_id", **kw)
    merged = dedup.merge_signature_index(ia, ib)
    rows = {r.doc_id: tuple(r)[1:] for r in merged.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2] == {r.doc_id: tuple(r)[1:] for r in ib.collect()}[2]  # new wins
    with pytest.raises(ValueError, match="same mh_"):
        dedup.merge_signature_index(
            ia, dedup.minhash_signatures(b, "text", "doc_id", num_hashes=8)
        )

    flags = harness.queries()["dedup_incremental_two_batch"](spark, sf_dir).collect()
    cross = [r for r in flags if r.new_id == 500010]
    assert cross and any(r.corpus_id == 10 for r in cross)


def test_incremental_minhash_band_mismatch_raises(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    sigs = dedup.minhash_signatures(df, "text", "doc_id", num_hashes=64)
    with pytest.raises(ValueError, match="multiple of bands"):
        dedup.incremental_minhash_pairs(df, sigs, "text", "doc_id", bands=7)


# ---------------------------------------------------------------------------
# duplicate clustering (connected components) vs union-find reference
# ---------------------------------------------------------------------------


def _union_find_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Independent reference: classic union-find, min element as label."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("driver_threshold", [1_000_000, 0])
def test_duplicate_clusters_matches_union_find(spark, driver_threshold):
    """Chains, stars, disjoint components — transitive closure must
    match union-find even for pairs never directly emitted (a~b, b~c
    ⇒ a,c share a cluster). Both strategies checked: driver-side
    union-find (small pair sets) and distributed label propagation
    (threshold forced to 0)."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5),  # 5-chain: needs propagation depth
             (10, 11), (10, 12), (10, 13),    # star
             (20, 21)]                         # pair
    pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pdf, driver_threshold=driver_threshold).collect()
    }
    assert got == _union_find_clusters(pairs)


def test_duplicate_clusters_raises_on_non_convergence(spark):
    """Exhausting max_iterations with labels still moving must raise —
    silently returning partially-merged clusters would let two docs of
    one duplicate component both survive dedup."""
    chain = [(i, i + 1) for i in range(12)]
    pdf = spark.createDataFrame(chain, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(pdf, driver_threshold=0, max_iterations=2)


def test_dedup_keep_representative(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 10, 11, 50]], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"]
        for r in dedup.dedup_keep_representative(docs, pairs, "doc_id").collect()
    )
    # one representative (min id) per cluster; singleton 50 passes through
    assert kept == [1, 10, 50]


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


def test_deterministic_sample_stable_under_repartitioning(spark):
    """The same rows must be selected regardless of partitioning — the
    property seeded df.sample does NOT have, and the one that matters
    when a job moves between cluster sizes."""
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in sampling.deterministic_sample(df, "k", 0.3).collect())
    b = sorted(
        r["k"]
        for r in sampling.deterministic_sample(df.repartition(17), "k", 0.3).collect()
    )
    assert a == b
    assert 0.25 <= len(a) / 5000 <= 0.35  # fraction lands near target


def test_stratified_sample_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = sampling.stratified_sample(df, "k", "lang", {"en": 0.5, "de": 0.1}).collect()
    n_en = sum(1 for r in out if r["lang"] == "en")
    n_de = sum(1 for r in out if r["lang"] == "de")
    assert 0.4 <= n_en / 2000 <= 0.6
    assert 0.05 <= n_de / 2000 <= 0.16
    # dropped stratum: absent from fractions ⇒ absent from output
    out2 = sampling.stratified_sample(df, "k", "lang", {"en": 0.5}).collect()
    assert all(r["lang"] == "en" for r in out2)


def test_sample_fraction_edges(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    assert sampling.deterministic_sample(df, "k", 0.0).count() == 0
    assert sampling.deterministic_sample(df, "k", 1.0).count() >= 99  # top bucket quantization
    with pytest.raises(ValueError):
        sampling.deterministic_sample(df, "k", 1.5)


# ---------------------------------------------------------------------------
# SimHash properties
# ---------------------------------------------------------------------------


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon"),
         (3, "totally different words entirely here")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    pairs = dedup.simhash_neardup_pairs(df, "text", "doc_id", max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["hamming"] == 0


def test_simhash_pair_invariants(spark, sf_dir):
    """Every emitted pair obeys id_a < id_b (no mirror duplicates) and
    hamming ≤ bound; hamming equals the true popcount of the XOR."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(d, "text", "doc_id").collect()}
    assert len(sigs) == 300  # every doc gets a signature
    pairs = dedup.simhash_neardup_pairs(d, "text", "doc_id", max_hamming=3).collect()
    seen = set()
    for r in pairs:
        a, b, h = r["id_a"], r["id_b"], r["hamming"]
        assert a < b
        assert (a, b) not in seen
        seen.add((a, b))
        assert h <= 3
        assert h == bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")


def test_simhash_empty_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "hello world")], ["doc_id", "text"])
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, "text", "doc_id").collect()}
    assert sigs[1] == 0 and sigs[2] == 0
    assert sigs[3] != 0


# ---------------------------------------------------------------------------
# approx_count_distinct error bound
# ---------------------------------------------------------------------------


def test_hll_sketch_rollup_rel_error(spark, sf_dir):
    """Merged per-nation sketches must estimate the global distinct
    count within HLL's error envelope, and per-nation estimates must
    each be near their exact counts."""
    c = load_table(spark, sf_dir, "customer")
    exact = c.select(F.countDistinct("c_custkey").alias("n")).collect()[0]["n"]
    per_nation = c.groupBy("c_nationkey").agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    est = per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
    ).collect()[0]["n"]
    assert abs(est - exact) / exact <= 0.05
    nation_exact = {
        r["c_nationkey"]: r["n"]
        for r in c.groupBy("c_nationkey")
        .agg(F.countDistinct("c_custkey").alias("n"))
        .collect()
    }
    nation_est = {
        r["c_nationkey"]: r["n"]
        for r in per_nation.select(
            "c_nationkey", F.hll_sketch_estimate("sk").alias("n")
        ).collect()
    }
    for k, n in nation_exact.items():
        assert abs(nation_est[k] - n) / max(n, 1) <= 0.1


def test_approx_count_distinct_rel_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey").alias("n")).collect()[0]["n"]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) / exact <= 0.15  # 3× the configured rsd


# ---------------------------------------------------------------------------
# winnowing — independent reference implementation (public algorithm)
# ---------------------------------------------------------------------------


def _winnow_reference(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Direct (non-rolling) restatement of Schleimer et al.'s winnowing:
    hash every k-gram with the same polynomial (base 257 mod 2^64)
    computed from scratch with Python ints, take window minima over the
    UNSIGNED values, dedup consecutive, then convert to the signed
    int64 the operator emits."""
    B, M = 257, 1 << 64
    s = text.encode("utf-8")
    if len(s) < k:
        return []
    hashes = []
    for i in range(len(s) - k + 1):
        h = 0
        for ch in s[i : i + k]:
            h = (h * B + ch) % M
        hashes.append(h)
    picks: list[int] = []
    for w0 in range(0, max(1, len(hashes) - window + 1)):
        m = min(hashes[w0 : w0 + window])
        if not picks or picks[-1] != m:
            picks.append(m)
    return [p - (1 << 64) if p >= (1 << 63) else p for p in picks]


def test_winnow_matches_reference(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "abcdefghijklmnopqrstuvwxyz" * 3),
        (3, "aaaaaaaaaaaaaaaa"),  # degenerate: all k-grams equal
        (4, "short"),  # len < k → no fingerprints
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    rows = text_ops.winnowing_fingerprint_rows(df, "text", "doc_id").collect()
    got: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["pos"], r["fingerprint"]))
    for doc_id, text in texts:
        expected = _winnow_reference(text)
        if not expected:
            assert got[doc_id] == [(None, None)]  # outer-explode keeps the doc
        else:
            ordered = [fp for _, fp in sorted(got[doc_id])]
            assert ordered == expected, f"doc {doc_id} fingerprints diverge"


def test_winnow_rows_scalar_sortable(spark, sf_dir):
    """The harness-facing shape must be scalar columns only (the r01
    failure was an array column defeating canonical sorting)."""
    d = load_table(spark, sf_dir, "documents").limit(50)
    out = text_ops.winnowing_fingerprint_rows(d)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "bigint",
        "bigint",
    ]
    assert out.count() > 0


# ---------------------------------------------------------------------------
# multimodal feature extraction
# ---------------------------------------------------------------------------


def test_multimodal_features_deterministic(spark, sf_dir):
    from dlp_rdb_bq_import_spark.operators.multimodal import attach_media, extract_features

    d = attach_media(load_table(spark, sf_dir, "documents").limit(100))
    a = extract_features(d).select("doc_id", "byte_len", "mean_px").collect()
    b = extract_features(d).select("doc_id", "byte_len", "mean_px").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 100
    for r in a:
        assert 0.0 <= r["mean_px"] <= 255.0


# ---------------------------------------------------------------------------
# PII redaction (corpus-scale regexp_replace chain over the InfoType
# detector registry)
# ---------------------------------------------------------------------------


def test_redact_text_planted_pii(spark):
    from dlp_rdb_bq_import_spark.operators.text import redact_text

    rows = [
        (1, "call 415-555-0143 or mail bob@example.com today"),
        (2, "card 4111-1111-1111-1111 ssn 078-05-1120 host 10.0.0.1"),
        (3, "nothing sensitive here, just 42 words"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in redact_text(df).collect()}
    assert got[1] == "call [PHONE_NUMBER] or mail [EMAIL_ADDRESS] today"
    assert got[2] == "card [CREDIT_CARD_NUMBER] ssn [US_SOCIAL_SECURITY_NUMBER] host [IP_ADDRESS]"
    assert got[3] == "nothing sensitive here, just 42 words"  # untouched
    assert got[4] is None  # null propagates


def test_redact_text_plan_stays_jvm_side(spark):
    """The redaction chain must be pure regexp_replace expressions —
    no Python eval operator in the plan."""
    from dlp_rdb_bq_import_spark.operators.text import redact_text

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = redact_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sample_frames_counts_and_determinism(spark):
    """Real Y4M streams: synthesize_video(seed) has 2+seed%4 frames at
    4 fps → duration = n*250 ms, so every_ms=250 samples each frame
    exactly once; null payloads are skipped."""
    from dlp_rdb_bq_import_spark.operators import media_codecs as mc
    from dlp_rdb_bq_import_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, mc.synthesize_video(1)), (2, mc.synthesize_video(2)), (3, None)],
        "doc_id long, payload binary",
    )
    out = sample_frames(df, every_ms=250).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], r["src_frame"]))
    assert sorted(per_doc[1]) == [(i, i) for i in range(2 + 1 % 4)]
    assert sorted(per_doc[2]) == [(i, i) for i in range(2 + 2 % 4)]
    assert 3 not in per_doc  # null payload skipped
    # distinct frames → distinct digests within a doc
    digests = [r["frame_md5"] for r in out if r["doc_id"] == 2]
    assert len(set(digests)) == len(digests)
    again = sample_frames(df, every_ms=250).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pq_topk_recall_planted(spark, planted_embeddings):
    """PQ-ADC top-k on clustered data: quantization error is far below
    the cluster separation, so the planted top-3 survives compression
    to 8 bytes per vector."""
    e = planted_embeddings
    queries = e.where(F.col("vec_id") < 80)
    books = similarity.train_pq_codebooks(e, n_subspaces=8, n_centroids=32)
    codes = similarity.pq_encode(e, books)
    exact = {
        (r["qid"], r["nid"])
        for r in similarity.brute_force_topk(queries, e, k=3).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in similarity.pq_topk(queries, codes, books, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"planted-cluster PQ recall {recall:.3f} < 0.9"


def test_pq_codes_shape_and_determinism(spark, planted_embeddings):
    e = planted_embeddings
    books = similarity.train_pq_codebooks(e, n_subspaces=8, n_centroids=32)
    assert books.shape == (8, 32, 4)  # dim 32 → 4 dims per subspace
    a = sorted(map(tuple, similarity.pq_encode(e, books).collect()))
    b = sorted(map(tuple, similarity.pq_encode(e, books).collect()))
    assert a == b
    assert all(0 <= v < 32 for row in a for v in row[1:])


def test_decontaminate_drops_planted_contamination(spark):
    """A train doc that copies a benchmark doc's text must be removed;
    a disjoint-vocabulary doc must survive; a doc sharing fewer than
    min_hits n-grams must survive."""
    from dlp_rdb_bq_import_spark.operators.decontam import (
        contamination_pairs,
        decontaminate,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [
            (1, bench_text),  # verbatim copy → contaminated
            (2, "one two three four five six seven eight"),  # disjoint
            (3, "alpha beta gamma nine ten eleven twelve"),  # 1 shared 3-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")

    pairs = contamination_pairs(train, bench, "text", "doc_id", n=3, min_hits=3)
    got = {(r["train_id"], r["bench_id"]): r["overlap_ngrams"] for r in pairs.collect()}
    assert got == {(1, 100): 6}  # 8 words → 6 distinct 3-grams

    kept = sorted(
        r["doc_id"]
        for r in decontaminate(train, bench, "text", "doc_id", n=3, min_hits=3).collect()
    )
    assert kept == [2, 3]


def test_decontaminate_empty_bench_keeps_everything(spark):
    from dlp_rdb_bq_import_spark.operators.decontam import decontaminate

    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([], "doc_id long, text string")
    assert decontaminate(train, bench, "text", "doc_id").count() == 2


def test_semantic_dedup_pairs_subset_of_exact(spark, planted_embeddings):
    """Within-cell pairs are exactly verified, so every emitted pair
    must appear in the exact all-pairs set with the identical cosine."""
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.semantic_dedup_pairs(
            planted_embeddings, threshold=0.9, n_cells=8
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.embedding_neardup_pairs_exact(
            planted_embeddings, threshold=0.9
        ).collect()
    }
    assert set(got) <= set(exact)
    assert all(exact[k] == v for k, v in got.items())
    # operating regime: tight clusters land in one cell → near-full recall
    assert len(got) >= 0.9 * len(exact)


def test_semantic_dedup_collapses_planted_clusters(spark, planted_embeddings):
    """Each planted 4-member cluster keeps exactly its min-id member;
    the 120 isotropic random vectors all survive (no cosine-0.9 pairs
    among random 32-dim vectors)."""
    kept = sorted(
        r["vec_id"]
        for r in similarity.semantic_dedup(
            planted_embeddings, threshold=0.9, n_cells=8
        ).collect()
    )
    planted_keepers = [c * 4 for c in range(20)]
    randoms = list(range(80, 200))
    assert kept == planted_keepers + randoms


def test_pack_sequences_budget_boundaries(spark):
    """Docs pack contiguously per stream: a doc starting exactly at the
    budget boundary opens the next sequence; an over-budget doc spans
    (its start assignment is still the sequence it begins in)."""
    from dlp_rdb_bq_import_spark.operators.packing import pack_sequences

    rows = [
        (1, "s", 60),   # before=0   → seq 0, off 0
        (2, "s", 40),   # before=60  → seq 0, off 60
        (3, "s", 150),  # before=100 → seq 1, off 0 (exact boundary)
        (4, "s", 10),   # before=250 → seq 2, off 50 (after the spanner)
        (5, "t", 10),   # independent stream
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, toks long")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, "toks", budget=100).collect()
    }
    assert got == {1: (0, 0), 2: (0, 60), 3: (1, 0), 4: (2, 50), 5: (0, 0)}


def test_incremental_dedup_broadcast_and_empty_corpus(spark):
    from dlp_rdb_bq_import_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame([(1, "seen")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "seen"), (11, "fresh"), (12, "fresh"), (13, "other")],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in incremental_dedup(
            new, corpus, ["text"], "doc_id", broadcast_corpus=True
        ).collect()
    )
    assert kept == [11, 13]  # 10 seen already; 12 loses to 11 in-batch

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_dedup(new, empty, ["text"], "doc_id").count() == 3


def test_pii_profile_planted(spark):
    """One aggregation pass reports per-(column, info_type) hit counts;
    a row with two emails counts once in n_rows_matched, twice in
    n_matches."""
    df = spark.createDataFrame(
        [
            (1, "contact a@b.com or c@d.org", "555-123-4567"),
            (2, "no pii here", "also clean"),
            (3, "ip is 10.0.0.1", "x@y.io"),
        ],
        "id long, notes string, extra string",
    )
    prof = text_ops.pii_profile(
        df, ("notes", "extra"), ("EMAIL_ADDRESS", "PHONE_NUMBER", "IP_ADDRESS")
    )
    got = {
        (r["column"], r["info_type"]): (r["n_rows"], r["n_rows_matched"], r["n_matches"])
        for r in prof.collect()
    }
    assert got[("notes", "EMAIL_ADDRESS")] == (3, 1, 2)
    assert got[("notes", "IP_ADDRESS")] == (3, 1, 1)
    assert got[("notes", "PHONE_NUMBER")] == (3, 0, 0)
    assert got[("extra", "EMAIL_ADDRESS")] == (3, 1, 1)
    assert got[("extra", "PHONE_NUMBER")] == (3, 1, 1)
    assert len(got) == 6


def test_train_val_test_split_deterministic_and_disjoint(spark, sf_dir):
    """Every row gets exactly one label; labels are identical across
    repartitionings; fractions land near the targets."""
    d = load_table(spark, sf_dir, "documents")
    a = sampling.train_val_test_split(d, "doc_id", train=0.8, val=0.1)
    b = sampling.train_val_test_split(d.repartition(7), "doc_id", train=0.8, val=0.1)
    la = {r["doc_id"]: r["split"] for r in a.collect()}
    lb = {r["doc_id"]: r["split"] for r in b.collect()}
    assert la == lb
    from collections import Counter

    frac = Counter(la.values())
    n = len(la)
    assert 0.7 < frac["train"] / n < 0.9
    assert frac["train"] + frac["val"] + frac["test"] == n


def test_pack_sequences_invariants_random(spark):
    """On a random corpus: offsets stay inside the budget, the
    (seq_id, seq_offset) pair reconstructs the running token total
    exactly, and seq_id is nondecreasing in stream order."""
    from dlp_rdb_bq_import_spark.operators.packing import pack_sequences

    rng = np.random.default_rng(11)
    rows = [
        (i, f"s{rng.integers(0, 3)}", int(rng.integers(1, 400)))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, toks long")
    out = pack_sequences(df, "toks", budget=256).collect()
    by_stream: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        by_stream.setdefault(r["source"], []).append(r)
    assert sum(len(v) for v in by_stream.values()) == 500
    for stream_rows in by_stream.values():
        before = 0
        prev_seq = 0
        for r in stream_rows:
            assert 0 <= r["seq_offset"] < 256
            assert r["seq_id"] * 256 + r["seq_offset"] == before
            assert r["seq_id"] >= prev_seq
            prev_seq = r["seq_id"]
            before += r["n_tokens"]


def test_bin_pack_exact_small_case(spark):
    """Best-fit-decreasing on a hand case (budget 10, sizes
    6,5,4,3,2, one shard): sorted descending, 6 opens bin0 (rem 4),
    5 opens bin1 (rem 5), 4 best-fits bin0 exactly, 3 then 2 fill
    bin1 — two bins, zero waste, the textbook BFD trace. An oversized
    document (15 > budget) gets a bin of its own and never absorbs
    anyone."""
    from dlp_rdb_bq_import_spark.operators.packing import bin_pack_sequences

    df = spark.createDataFrame(
        [(1, 6), (2, 5), (3, 4), (4, 3), (5, 2), (6, 15)],
        "doc_id long, toks long",
    )
    out = {
        r.doc_id: r.bin_id
        for r in bin_pack_sequences(
            df, "toks", 10, key_col="doc_id", n_shards=1
        ).collect()
    }
    # oversized 15 sorts first -> bin 0 alone; 6+4 share; 5+3+2 share
    assert out[6] not in {out[k] for k in (1, 2, 3, 4, 5)}
    assert out[1] == out[3]
    assert out[2] == out[4] == out[5]
    assert out[1] != out[2]
    assert len({out[1], out[2], out[6]}) == 3


def test_bin_pack_waste_beats_contiguous_and_is_deterministic(spark):
    """On a deterministic 400-doc fixture: (a) BFD total padding is <=
    the contiguous-arrival baseline (one open bin, next doc that
    doesn't fit opens a new one — what a naive non-splitting packer
    does); (b) no bin exceeds the budget (oversized docs alone
    excepted); (c) the assignment is identical under a different input
    partitioning (hash-shard determinism)."""
    from dlp_rdb_bq_import_spark.operators.packing import bin_pack_sequences

    budget = 1024
    sizes = [(i, (i * 37) % 900 + 50) for i in range(400)]
    df = spark.createDataFrame(sizes, "doc_id long, toks long")
    rows = bin_pack_sequences(
        df, "toks", budget, key_col="doc_id", n_shards=4
    ).collect()
    assert len(rows) == 400

    fill: dict[int, int] = {}
    for r in rows:
        fill[r.bin_id] = fill.get(r.bin_id, 0) + r.n_tokens
    assert all(v <= budget for v in fill.values())  # no oversized here
    bfd_waste = sum(budget - v for v in fill.values())

    # contiguous-arrival (next-fit) baseline in doc_id order
    nf_bins, cur = 0, budget + 1
    for _, s in sizes:
        if cur + s > budget:
            nf_bins += 1
            cur = 0
        cur += s
    nf_waste = nf_bins * budget - sum(s for _, s in sizes)
    assert bfd_waste <= nf_waste

    again = {
        r.doc_id: r.bin_id
        for r in bin_pack_sequences(
            df.repartition(7), "toks", budget, key_col="doc_id", n_shards=4
        ).collect()
    }
    assert again == {r.doc_id: r.bin_id for r in rows}


def test_bin_pack_rejects_nonpositive_token_counts(spark):
    """A 0-token doc would open a full-capacity bin nothing can join
    and a negative size corrupts the sorted capacity list (ADVICE r9):
    both raise instead of silently skewing the packing."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from dlp_rdb_bq_import_spark.operators.packing import bin_pack_sequences

    for bad in (0, -3, None):
        df = spark.createDataFrame(
            [(1, 5), (2, bad)], "doc_id long, toks long"
        )
        with pytest.raises((Py4JJavaError, Exception)) as ei:
            bin_pack_sequences(
                df, "toks", 10, key_col="doc_id", n_shards=1
            ).collect()
        assert "non-positive or null token count" in str(ei.value)


def test_resize_images_deterministic_and_fixed_width(spark, sf_dir):
    """Resize output is partitioning-independent and fixed-width:
    n_bytes == out_w*out_h*3 for every row, and digests are stable
    across runs and repartitionings."""
    from dlp_rdb_bq_import_spark.operators.multimodal import attach_media, resize_images

    d = attach_media(load_table(spark, sf_dir, "documents"))
    a = {r["doc_id"]: r["content_md5"] for r in resize_images(d, 2, 3).collect()}
    b = {
        r["doc_id"]: r["content_md5"]
        for r in resize_images(d.repartition(5), 2, 3).collect()
    }
    assert a == b and len(a) > 0
    row = resize_images(d, 2, 3).first()
    assert row["n_bytes"] == 2 * 3 * 3


def test_approx_percentile_within_rel_error(spark, sf_dir):
    """The sketch percentiles must sit within 1% relative error of the
    exact distribution at every probed quantile."""
    from dlp_rdb_bq_import_spark.harness import queries

    approx = queries()["approx_percentile_summary"](spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.selectExpr(
        "percentile(l_extendedprice, 0.5) AS p50",
        "percentile(l_extendedprice, 0.9) AS p90",
        "percentile(l_extendedprice, 0.99) AS p99",
    ).first()
    for k in ("p50", "p90", "p99"):
        assert abs(approx[k] - exact[k]) / exact[k] < 0.01, (k, approx[k], exact[k])


def test_dedup_caches_released_after_action(spark, sf_dir):
    """minhash/jaccard pipelines cache hashed shingle sets internally;
    the eager path must leave NO entry in the session CacheManager after
    returning (round-2 review: composed dedup calls in a long-lived
    session were accumulating executor memory)."""
    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents").limit(200)
    pairs = dedup.minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)
    assert pairs.count() >= 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    pairs2 = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=5, threshold=0.5)
    assert pairs2.count() >= 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_label_propagation_distributed_at_scale(spark):
    """>1e6 pairs forces the distributed min-label-propagation branch
    (driver_threshold default 1e6). 260k disjoint 5-node chains have an
    analytically known answer — cluster_id = block start — and diameter
    4, so propagation must converge well inside max_iterations."""
    block = 5
    n_blocks = 260_000  # 260k * 4 = 1.04M edges > driver_threshold
    edges = (
        spark.range(n_blocks * block)
        .where((F.col("id") % block) != block - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    out = dedup.duplicate_clusters(edges, max_iterations=10)
    assert out.count() == n_blocks * block
    bad = out.where(
        F.col("cluster_id") != F.col("doc_id") - (F.col("doc_id") % block)
    ).count()
    assert bad == 0


def test_label_propagation_nonconvergence_raises(spark):
    """A 30-deep chain cannot converge in 3 rounds: the distributed
    branch must fail loudly (silent partial dedup would let both copies
    of a duplicate survive)."""
    edges = spark.range(30).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(edges, max_iterations=3, driver_threshold=0)


def test_tfidf_top_terms_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = text_ops.tfidf_top_terms(df, "text", "doc_id", k=2)
    rows = {(r.doc_id, r.rk): r for r in out.collect()}
    # doc 3 is empty -> no rows at all
    assert not any(d == 3 for d, _ in rows)
    # doc 1: apple tf=2 df=1 -> 2*(4/2)=4.0 ; banana tf=1 df=2 -> 1*(4/3)
    assert rows[(1, 1)].word == "apple" and rows[(1, 1)].tfidf == 4.0
    assert rows[(1, 2)].word == "banana"
    # doc 2: cherry tf=1 df=1 -> 4/2=2.0 beats banana 4/3
    assert rows[(2, 1)].word == "cherry" and rows[(2, 1)].tfidf == 2.0
    assert rows[(2, 2)].word == "banana"


def test_tfidf_top_terms_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert text_ops.tfidf_top_terms(df).count() == 0


def test_tfidf_top_terms_max_df_drops_stopwords_before_shuffle(spark):
    """Terms in more than max_df docs vanish from the output, rankings
    of the survivors are untouched, and the prune is a broadcast
    anti-join (BroadcastHashJoin LeftAnti) ahead of the word join."""
    df = spark.createDataFrame(
        [(i, "the common " + ("alpha" if i == 0 else f"w{i}")) for i in range(10)],
        "doc_id long, text string",
    )
    out = text_ops.tfidf_top_terms(df, "text", "doc_id", k=3, max_df=5)
    rows = out.collect()
    words = {r.word for r in rows}
    assert "the" not in words and "common" not in words  # df=10 > 5
    assert {"alpha", "w1"} <= words  # df=1 terms survive with rk=1
    assert all(r.rk == 1 for r in rows if r.word == "alpha")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # uncapped call still returns the stop words (cap is opt-in)
    assert "the" in {r.word for r in text_ops.tfidf_top_terms(df, k=3).collect()}


def test_bm25_topk_hand_computed(spark):
    """Scores equal a literal Python BM25 computation (rational idf,
    k1=1.2, b=0.75) on a 4-doc corpus, ranking is deterministic, and
    docs matching no query term are absent."""
    docs = [
        (1, "apple banana apple cherry"),      # tf(apple)=2, dl=4
        (2, "apple durian durian durian"),     # tf(apple)=1, dl=4
        (3, "banana banana banana"),           # tf(banana)=3, dl=3
        (4, "durian cherry cherry"),           # no query terms
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: (r.score, r.rk) for r in text_ops.bm25_topk(
        df, ["apple", "banana"], k=10
    ).collect()}
    assert 4 not in out and set(out) == {1, 2, 3}

    n_docs, total_dl = 4, 14
    avgdl = total_dl / n_docs
    dfreq = {"apple": 2, "banana": 2}
    tfs = {1: {"apple": 2, "banana": 1}, 2: {"apple": 1}, 3: {"banana": 3}}
    dls = {1: 4, 2: 4, 3: 3}
    k1, b = 1.2, 0.75
    for doc_id, terms in tfs.items():
        want = 0.0
        for term in ("apple", "banana"):  # fixed query order
            if term not in terms:
                continue
            tf = terms[term]
            idf = (n_docs + 1.0) / (dfreq[term] + 1.0)
            s = ((idf * tf) * (k1 + 1.0)) / (
                tf + (k1 * ((1.0 - b) + ((b * dls[doc_id]) / avgdl)))
            )
            want += s
        assert out[doc_id][0] == round(want, 9), doc_id
    # ranking: doc 1 (two terms) > doc 3 (saturated tf) order per scores
    ranked = sorted(out, key=lambda d: out[d][1])
    assert ranked == sorted(out, key=lambda d: (-out[d][0], d))
    with pytest.raises(ValueError):
        text_ops.bm25_topk(df, [])
    with pytest.raises(ValueError):
        text_ops.bm25_topk(df, ["apple", "apple"])


def test_bm25_batch_matches_single_query(spark):
    """One query run through the batch (query-table) path ranks
    identically to the literal-terms path, with scores equal up to the
    batch path's int64 quantization (1e-6)."""
    rng = np.random.default_rng(3)
    vocab = ["apple", "banana", "cherry", "durian", "elder", "fig"]
    docs = [
        (i, " ".join(rng.choice(vocab, size=int(rng.integers(3, 12)))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    single = {
        r.doc_id: (r.score, r.rk)
        for r in text_ops.bm25_topk(df, ["apple", "fig"], k=30).collect()
    }
    queries = spark.createDataFrame([(7, "apple"), (7, "fig")], ["query_id", "word"])
    batch = {
        r.doc_id: (r.score, r.rk)
        for r in text_ops.bm25_batch_topk(df, queries, k=30).collect()
    }
    assert set(single) == set(batch)
    for doc_id, (score, rk) in single.items():
        bscore, brk = batch[doc_id]
        assert brk == rk, doc_id
        assert abs(bscore - score) <= 1e-6, doc_id


def test_tfidf_top_terms_fractional_max_df(spark):
    """A float max_df in (0,1) caps by CORPUS FRACTION: 0.5 over 10
    docs drops words in >5 docs — same result as absolute max_df=5 on
    this corpus — and the cap scales with N instead of degenerating
    when the corpus grows."""
    df = spark.createDataFrame(
        [(i, "the common " + ("alpha" if i == 0 else f"w{i}")) for i in range(10)],
        "doc_id long, text string",
    )
    frac = text_ops.tfidf_top_terms(df, "text", "doc_id", k=3, max_df=0.5)
    absv = text_ops.tfidf_top_terms(df, "text", "doc_id", k=3, max_df=5)
    assert sorted(map(tuple, frac.collect())) == sorted(map(tuple, absv.collect()))
    words = {r.word for r in frac.collect()}
    assert "the" not in words and "alpha" in words
    with pytest.raises(ValueError):
        text_ops.tfidf_top_terms(df, max_df=1.5)


def test_cascading_rollup_levels_lossless(spark, sf_dir):
    """Each coarser level, computed from the finer level's partials,
    must equal a direct aggregation of the raw data at that grain."""
    from dlp_rdb_bq_import_spark.operators.rollup import cascading_rollup, present

    ev = load_table(spark, sf_dir, "events").limit(2000)
    levels = cascading_rollup(
        ev, "ts", ["event_type"], "value", ["1 minute", "1 hour", "1 day"]
    )
    for lvl in ("1 hour", "1 day"):
        direct = present(
            cascading_rollup(ev, "ts", ["event_type"], "value", [lvl])[lvl],
            ["event_type"],
        )
        cascaded = present(levels[lvl], ["event_type"])
        assert sorted(map(tuple, cascaded.collect())) == sorted(
            map(tuple, direct.collect())
        )


def test_cascading_rollup_empty_and_bad_args(spark):
    from dlp_rdb_bq_import_spark.operators.rollup import cascading_rollup, present

    empty = spark.createDataFrame([], "ts timestamp, k string, value double")
    out = cascading_rollup(empty, "ts", ["k"], "value", ["1 hour", "1 day"])
    assert present(out["1 day"], ["k"]).count() == 0
    with pytest.raises(ValueError):
        cascading_rollup(empty, "ts", ["k"], "value", [])


def test_skew_report_shape_and_shares(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import skew_report

    # 60 rows of key 'hot', 1 each of 40 cold keys
    rows = [("hot",)] * 60 + [(f"c{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string")
    rep = skew_report(df, "k", top_n=3).collect()
    assert [r.key for r in rep][0] == "hot"
    assert rep[0].cnt == 60 and rep[0].total_rows == 100 and rep[0].distinct_keys == 41
    assert abs(rep[0].share - 0.6) < 1e-12
    assert len(rep) == 3 and rep[1].cnt == 1


def test_pagerank_matches_numpy_power_iteration(spark):
    from dlp_rdb_bq_import_spark.operators.graph import pagerank

    edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 3), (4, 0), (4, 5),
        # node 5 is dangling (no out-edges); 6 appears only as src
        (6, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iterations=25).collect()}

    import numpy as np

    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(25):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / deg[idx[s]]
        dm = r[deg == 0].sum()
        r = (1 - d) / n + d * (contrib + dm / n)
    for u in nodes:
        assert abs(got[u] - r[idx[u]]) < 1e-9, u
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_weighted_pagerank_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.graph import pagerank

    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 2, 5.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r.node: r.rank
           for r in pagerank(df, iterations=25, weight_col="w").collect()}

    import numpy as np

    nodes = sorted({u for s, t, _ in edges for u in (s, t)})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    wsum = np.zeros(n)
    for s, _, w in edges:
        wsum[idx[s]] += w
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(25):
        contrib = np.zeros(n)
        for s, t, w in edges:
            contrib[idx[t]] += r[idx[s]] * w / wsum[idx[s]]
        dm = r[wsum == 0].sum()
        r = (1 - d) / n + d * (contrib + dm / n)
    for u in nodes:
        assert abs(got[u] - r[idx[u]]) < 1e-9, u
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_empty_and_bad_damping(spark):
    from dlp_rdb_bq_import_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
    with pytest.raises(ValueError):
        pagerank(empty, damping=1.0)


def test_hits_matches_numpy_power_iteration(spark):
    """hits() L1-normalized hubs/authorities match the textbook numpy
    power iteration exactly (the deferred normalization is a no-op on
    the answer), including a pure-sink node (authority only), a
    pure-source node (hub only), and a self-loop."""
    from dlp_rdb_bq_import_spark.operators.graph import hits

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 3), (4, 0), (6, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.authority) for r in hits(df, iterations=20).collect()}

    import numpy as np

    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, t in edges:
        A[idx[s], idx[t]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(20):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    for u in nodes:
        assert abs(got[u][0] - h[idx[u]]) < 1e-9, u
        assert abs(got[u][1] - a[idx[u]]) < 1e-9, u
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-9
    # node 5 never appears; node 4 is a pure source: authority 0
    assert got[4][1] == 0.0
    # node 6 only ever links out; nothing links it: authority 0, hub > 0
    assert got[6][1] == 0.0 and got[6][0] > 0

    empty = spark.createDataFrame([], "src long, dst long")
    assert hits(empty).count() == 0


def test_bfs_distances_chain_fork_and_horizon(spark):
    """Multi-source BFS: nearest-seed minimality on a fork, max_hops
    horizon cut, unreachable nodes absent, and seeds at 0 even when
    another path reaches them later."""
    from dlp_rdb_bq_import_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (9, 2), (4, 0), (7, 8)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,), (9,)], "node long")
    got = {r.node: r.dist for r in bfs_distances(edges, seeds, max_hops=10).collect()}
    # 2 is 1 hop from seed 9 (not 2 hops from seed 0)
    assert got == {0: 0, 9: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    # horizon: max_hops=1 stops the wave
    got1 = {r.node: r.dist for r in bfs_distances(edges, seeds, max_hops=1).collect()}
    assert got1 == {0: 0, 9: 0, 1: 1, 2: 1}
    with pytest.raises(ValueError):
        bfs_distances(edges, seeds, max_hops=-1)


def test_cocitation_counts_pairs_cap_and_threshold(spark):
    """Co-citation: unordered pairs with distinct-source counts;
    parallel edges dedup; max_out_degree drops super-spreader sources;
    min_count prunes."""
    from dlp_rdb_bq_import_spark.operators.graph import cocitation_counts

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 10), (2, 10), (2, 11), (3, 10), (3, 11), (3, 12)],
        "src long, dst long",
    )
    got = {
        (r.node_a, r.node_b): r.n_cosources
        for r in cocitation_counts(edges).collect()
    }
    assert got[(10, 11)] == 3
    assert got[(10, 12)] == 1 and got[(11, 12)] == 1
    # source 3 cites three targets; cap at 2 removes its pairs
    capped = {
        (r.node_a, r.node_b): r.n_cosources
        for r in cocitation_counts(edges, max_out_degree=2).collect()
    }
    assert capped == {(10, 11): 2}
    thr = {
        (r.node_a, r.node_b): r.n_cosources
        for r in cocitation_counts(edges, min_count=2).collect()
    }
    assert thr == {(10, 11): 3}


def test_check_expectations_planted_violations(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import check_expectations

    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (1, "O", 20.0),     # duplicate pk
            (None, "F", 30.0),  # null pk
            (3, "X", -5.0),     # bad status, below range
            (4, "P", 500.0),    # above range
        ],
        "k long, status string, price double",
    )
    ref = spark.createDataFrame([(1,), (3,)], "rk long")
    out = {
        r.rule: (r.n_violations, r.passed)
        for r in check_expectations(
            df,
            [
                {"rule": "nn", "kind": "not_null", "column": "k"},
                {"rule": "uq", "kind": "unique", "column": "k"},
                {"rule": "av", "kind": "accepted_values", "column": "status",
                 "values": ["O", "F", "P"]},
                {"rule": "rg", "kind": "range", "column": "price",
                 "min": 0.0, "max": 100.0},
                {"rule": "fk", "kind": "referential", "column": "k",
                 "ref": "r", "ref_column": "rk"},
            ],
            references={"r": ref},
        ).collect()
    }
    assert out["nn"] == (1, False)
    assert out["uq"] == (1, False)   # one extra copy of pk 1
    assert out["av"] == (1, False)
    assert out["rg"] == (2, False)
    assert out["fk"] == (1, False)   # k=4 not in ref (nulls exempt)

    clean = check_expectations(
        spark.createDataFrame([(1,)], "k long"),
        [{"rule": "nn", "kind": "not_null", "column": "k"}],
    ).collect()
    assert clean[0].passed is True
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown expectation"):
        check_expectations(df, [{"rule": "x", "kind": "nope", "column": "k"}]).collect()


def test_integer_zscore_outliers_exact(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import integer_zscore_outliers

    # group a: nine 10s and one 100 -> the 100 is a clear outlier
    rows = [("a", 10)] * 9 + [("a", 100)] + [("b", 5)]  # b: single-row group
    df = spark.createDataFrame(rows, "g string, v long")
    out = integer_zscore_outliers(df, "v", ["g"], threshold=2).collect()
    flags = {}
    for r in out:
        flags.setdefault((r.g, r.v), r.is_outlier)
    assert flags[("a", 100)] is True
    assert flags[("a", 10)] is False
    assert flags[("b", 5)] is False  # sigma=0, never an outlier

    import statistics

    vals = [10] * 9 + [100]
    mu, sigma = statistics.mean(vals), statistics.pstdev(vals)
    assert abs(100 - mu) > 2 * sigma and abs(10 - mu) <= 2 * sigma


def test_mad_outliers_flags_planted_extreme(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mad_outliers

    # group a: symmetric cluster around 10 plus one wild 1000
    rows = [("a", float(v)) for v in (8, 9, 10, 11, 12)] + [("a", 1000.0)]
    rows += [("b", 5.0)]  # single-row group: MAD 0, never flagged
    df = spark.createDataFrame(rows, "g string, v double")
    out = mad_outliers(df, "v", ["g"], k=3.0).collect()
    flags = {(r.g, r.v): r.is_outlier for r in out}
    assert flags[("a", 1000.0)] == 1
    assert all(flags[("a", float(v))] == 0 for v in (8, 9, 10, 11, 12))
    assert flags[("b", 5.0)] == 0
    med = {r.g: r.med for r in out}
    assert med["a"] == 10.5 and med["b"] == 5.0


def test_mad_outliers_resists_contamination_where_zscore_breaks(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mad_outliers

    # 30% wild contamination inflates stddev so z-scores flag nothing;
    # MAD still centers on the clean cluster and flags every wild row.
    clean = [("g", 100.0 + i) for i in range(7)]
    wild = [("g", 1e6), ("g", 2e6), ("g", 3e6)]
    df = spark.createDataFrame(clean + wild, "g string, v double")
    out = mad_outliers(df, "v", ["g"], k=3.0).collect()
    assert all(r.is_outlier == 1 for r in out if r.v >= 1e6)
    assert all(r.is_outlier == 0 for r in out if r.v < 1000)


def test_mad_outliers_null_values_never_flagged(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)], "g string, v double"
    )
    out = {r.v: r.is_outlier for r in mad_outliers(df, "v", ["g"]).collect()}
    assert out[None] == 0


def test_mad_outliers_reserved_name_guard(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame([("g", 1.0)], "g string, mad double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="reserved"):
        mad_outliers(df, "mad", ["g"])


def test_check_expectations_empty_rules_and_quoted_names(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import check_expectations

    df = spark.createDataFrame([(1,)], "k long")
    empty = check_expectations(df, [])
    assert empty.count() == 0
    assert empty.columns == ["rule", "kind", "column", "n_violations", "passed"]

    out = check_expectations(
        df, [{"rule": "customer's `pk`", "kind": "not_null", "column": "k"}]
    ).collect()
    assert out[0].rule == "customer's `pk`" and out[0].passed is True


def test_zorder_key_nulls_bucket_low_and_all_null_raises(spark):
    from dlp_rdb_bq_import_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(1, 100), (None, 200), (50, None)], "a long, b long"
    )
    rows = {(r.a, r.b): r._z for r in zorder_key(df, ["a", "b"], bits=4).collect()}
    assert rows[(None, 200)] is not None  # null doesn't crash or null the key
    import pytest as _pytest

    allnull = spark.createDataFrame([(None, 1), (None, 2)], "a long, b long")
    with _pytest.raises(ValueError, match="no non-null"):
        zorder_key(allnull, ["a", "b"]).collect()


def test_duplicate_clusters_rejects_zero_iterations(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(ValueError, match="max_iterations"):
        dedup.duplicate_clusters(pairs, max_iterations=0)


def test_chunk_documents_overlap_and_edges(spark):
    from dlp_rdb_bq_import_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_size=4, stride=3)
    rows = {(r.doc_id, r.chunk_id): (r.start, r.chunk) for r in out.collect()}
    # doc 1 (len 10, stride 3): starts 0,3,6,9
    assert rows[(1, 0)] == (0, "abcd")
    assert rows[(1, 1)] == (3, "defg")   # 1-char overlap with previous
    assert rows[(1, 2)] == (6, "ghij")
    assert rows[(1, 3)] == (9, "j")      # tail shorter than chunk_size
    # doc 2 shorter than chunk_size: single chunk; doc 3 empty: none
    assert rows[(2, 0)] == (0, "xy")
    assert not any(d == 3 for d, _ in rows)
    # reassembly: stride-prefixes of the chunks concatenate to the doc
    text = "".join(c[:3] for _, c in (rows[(1, i)] for i in range(4)))
    assert text == "abcdefghij"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_size=0)


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    rows = [(i, 1.0 if i else 10_000.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")

    out1 = {r.id for r in sampling.weighted_sample(df, "id", "w", k=20).collect()}
    out2 = {
        r.id
        for r in sampling.weighted_sample(
            df.repartition(16), "id", "w", k=20
        ).collect()
    }
    assert out1 == out2 and len(out1) == 20  # partitioning-independent

    # the one heavy item (weight 10000 vs 1) should be drawn in nearly
    # every redraw; count over 10 salts
    hits = sum(
        0 in {r.id for r in sampling.weighted_sample(df, "id", "w", k=20, salt=s).collect()}
        for s in range(10)
    )
    assert hits >= 8

    # different salts give different samples (it IS a redraw)
    outs = {
        frozenset(r.id for r in sampling.weighted_sample(df, "id", "w", k=20, salt=s).collect())
        for s in range(3)
    }
    assert len(outs) > 1

    # non-positive weights excluded; strata cap per group
    df2 = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 1.0), (3, "a", 1.0), (4, "b", 5.0)],
        "id long, g string, w double",
    )
    got = sampling.weighted_sample(df2, "id", "w", k=1, strata=["g"]).collect()
    by_g = {r.g: r.id for r in got}
    assert by_g["b"] == 4 and by_g["a"] in (2, 3) and len(got) == 2


def test_substring_spans_planted_duplicate(spark):
    """A 120-char region planted verbatim into two documents at
    different offsets is recovered as one maximal span in each, and no
    span is reported for unshared text."""
    shared = "".join(chr(97 + (i * 7) % 26) for i in range(120))
    docs = [
        (1, "XX" + shared + "tail one unique material here 111111"),
        (2, "a different much longer prefix text " + shared),
        (3, "entirely unrelated document body with no repeats at all"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spans = dedup.duplicated_substring_spans(df, "text", "doc_id", min_len=40).collect()
    by_doc = {r.doc_id: (r.dup_start, r.dup_end) for r in spans}
    assert set(by_doc) == {1, 2}
    assert len(spans) == 2  # one maximal span per doc, not fragments
    # doc 1: shared starts at char 3 (1-based), ends at 2+120
    assert by_doc[1] == (3, 122)
    assert by_doc[2] == (37, 156)


def test_substring_spans_boilerplate_gram_no_gram_window(spark):
    """A boilerplate region present in 50% of the corpus (license
    headers / nav chrome at scale) is marked via groupBy partial
    aggregation + digest equi-join, NOT a whole-partition window on
    the raw gram: correctness on the hot gram, and the plan's only
    Window node is the per-doc island merge."""
    import hashlib

    boiler = "THIS LICENSE HEADER APPEARS IN HALF OF EVERY CORPUS " * 2  # 104 ch
    docs = [
        (
            i,
            (boiler if i % 2 == 0 else "")
            + hashlib.sha256(str(i).encode()).hexdigest() * 2,
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # eager=False keeps the full lazy plan inspectable below (the
    # default checkpoints the spans and releases the gram cache)
    spans = dedup.duplicated_substring_spans(df, min_len=40, eager=False)
    got = sorted((r.doc_id, r.dup_start, r.dup_end) for r in spans.collect())

    # brute-force oracle: a position is duplicated iff its 40-gram
    # appears in any OTHER doc; merge consecutive positions to spans
    grams = {}
    for i, text in docs:
        for p in range(len(text) - 39):
            grams.setdefault(text[p : p + 40], set()).add(i)
    want = []
    for i, text in docs:
        dup = [p for p in range(len(text) - 39) if len(grams[text[p : p + 40]]) > 1]
        run = []
        for p in dup:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    want.append((i, run[0] + 1, run[-1] + 40))
                run = [p]
        if run:
            want.append((i, run[0] + 1, run[-1] + 40))
    assert got == sorted(want)
    assert {i for i in range(40) if i % 2 == 0} <= {g[0] for g in got}
    plan = spans._jdf.queryExecution().executedPlan().toString()
    # every window spec is the doc-island row_number over doc_id; the
    # cross-doc mark must NOT be a window over the gram/digest key
    specs = [s for s in plan.split("windowspecdefinition(")[1:]]
    assert specs and all(s.startswith("doc_id") for s in specs)


def test_substring_spans_within_doc_repeat_not_flagged(spark):
    """Repetition INSIDE one document is not cross-document duplication."""
    block = "z" * 80
    df = spark.createDataFrame(
        [(1, block + "-middle-" + block), (2, "no shared content in this one")],
        ["doc_id", "text"],
    )
    assert dedup.duplicated_substring_spans(df, min_len=40).count() == 0


def test_strip_duplicated_substrings_roundtrip(spark):
    """Stripping the reported spans removes exactly the shared region."""
    shared = "SHARED" * 20  # 120 chars
    df = spark.createDataFrame(
        [(1, "keepA" + shared + "111tail"), (2, shared + "222end")],
        ["doc_id", "text"],
    )
    spans = dedup.duplicated_substring_spans(df, min_len=40)
    out = {
        r.doc_id: r.text
        for r in dedup.strip_duplicated_substrings(df, spans).collect()
    }
    assert out[1] == "keepA111tail"
    assert out[2] == "222end"


def test_strip_no_spans_passthrough(spark):
    df = spark.createDataFrame([(1, "unique text")], ["doc_id", "text"])
    empty = dedup.duplicated_substring_spans(df, min_len=40)
    assert dedup.strip_duplicated_substrings(df, empty).collect()[0].text == "unique text"


def test_cdc_chunks_cover_text_and_align_on_content(spark):
    """CDC chunks tile each doc exactly; identical regions at DIFFERENT
    offsets produce identical interior chunk hashes (the property fixed
    chunking lacks)."""
    import random

    rng = random.Random(42)
    shared = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(1500))
    docs = [(1, "prefix-one-" + shared), (2, "a rather different and longer prefix " + shared)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    chunks = dedup.cdc_chunks(df).collect()
    for doc_id, text in docs:
        mine = sorted((r.chunk_start, r.chunk_end) for r in chunks if r.doc_id == doc_id)
        assert mine[0][0] == 1 and mine[-1][1] == len(text)
        for (s1, e1), (s2, _) in zip(mine, mine[1:]):
            assert s2 == e1 + 1
    h1 = {r.chunk_hash for r in chunks if r.doc_id == 1}
    h2 = {r.chunk_hash for r in chunks if r.doc_id == 2}
    assert len(h1 & h2) >= 2, "shared region produced no aligned chunks"


def test_cdc_duplicate_spans_cover_planted_region(spark):
    import random

    rng = random.Random(42)
    shared = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(1500))
    docs = [
        (1, "prefix-one-" + shared + "-suffix-one"),
        (2, "a rather different and longer prefix " + shared),
        (3, "unrelated filler document with nothing shared inside it"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spans = dedup.cdc_chunk_duplicate_spans(df).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append((r.dup_start, r.dup_end))
    assert 3 not in by_doc
    # chunk granularity: the recovered span must cover most of the
    # planted region in both docs (edges may round to chunk bounds)
    for doc_id, text in docs[:2]:
        lo = text.index(shared) + 1
        hi = lo + len(shared) - 1
        covered = sum(
            max(0, min(e, hi) - max(s, lo) + 1) for s, e in by_doc[doc_id]
        )
        assert covered >= 0.6 * len(shared), (doc_id, by_doc[doc_id], lo, hi)


def test_bloom_prefilter_changes_nothing(spark, sf_dir):
    """The Bloom prefilter is transparent: contamination_pairs with and
    without it return IDENTICAL rows (false positives are discarded by
    the exact join; false negatives are impossible — build and probe
    share the same probe expressions)."""
    from dlp_rdb_bq_import_spark.operators.decontam import contamination_pairs

    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 20 != 0)
    bench = d.where(F.col("doc_id") % 20 == 0)
    kw = dict(n=3, min_hits=3)
    # bloom_min_items=0 defeats the small-side guard so the bloom path
    # genuinely runs on the tiny fixture
    with_bloom = sorted(
        map(
            tuple,
            contamination_pairs(
                train, bench, "text", "doc_id", bloom_min_items=0, **kw
            ).collect(),
        )
    )
    without = sorted(
        map(
            tuple,
            contamination_pairs(
                train, bench, "text", "doc_id", bloom_prefilter=False, **kw
            ).collect(),
        )
    )
    assert with_bloom == without
    assert len(with_bloom) > 0  # fixture actually exercises the path


def test_incremental_decontam_equals_full_operator(spark, sf_dir, tmp_path):
    """Probing a PERSISTED bench-gram index (parquet round-trip
    included) returns exactly the rows of the from-scratch operator on
    the same batch — with the Bloom prefilter forced on AND off — and
    decontaminate_incremental keeps exactly the unflagged docs."""
    from dlp_rdb_bq_import_spark.operators.decontam import (
        bench_gram_index,
        contamination_pairs,
        decontaminate_incremental,
        incremental_contamination_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 20 == 0)
    # plant a verbatim re-keyed bench doc in the batch so the fixture
    # provably exercises the flag path at any scale factor
    batch = d.where(F.col("doc_id") % 20 == 1).unionByName(
        bench.orderBy("doc_id").limit(1).withColumn("doc_id", F.lit(999981).cast("long"))
    )
    kw = dict(n=3, min_hits=3)

    idx_path = str(tmp_path / "bench_grams")
    bench_gram_index(bench, "text", "doc_id", n=3).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    full = sorted(
        map(tuple, contamination_pairs(batch, bench, "text", "doc_id", **kw).collect())
    )
    assert len(full) > 0  # fixture exercises the path
    for bloom in (dict(bloom_min_items=0), dict(bloom_prefilter=False)):
        inc = sorted(
            map(
                tuple,
                incremental_contamination_pairs(
                    batch, index, "text", "doc_id", **kw, **bloom
                ).collect(),
            )
        )
        assert inc == full

    flagged = {r[0] for r in full}
    kept = {
        r.doc_id
        for r in decontaminate_incremental(batch, index, "text", "doc_id", **kw)
        .select("doc_id")
        .collect()
    }
    all_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    assert kept == all_ids - flagged

    # a malformed index (missing the hash column) fails loudly, not
    # with a silent empty result
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bench_index"):
        incremental_contamination_pairs(
            batch, bench.select(F.col("doc_id").alias("bench_id")), "text", "doc_id"
        )


def test_bloom_small_side_guard_skips_build(spark, sf_dir):
    """Below ~100k estimated bench grams the Bloom build job costs more
    than the probes it saves: the guard must bypass it (no 1-row bitmap
    scalar attach — no BroadcastNestedLoopJoin — in the plan)."""
    from dlp_rdb_bq_import_spark.operators.decontam import contamination_pairs

    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 20 != 0)
    bench = d.where(F.col("doc_id") % 20 == 0)  # tiny: far below 100k grams
    out = contamination_pairs(train, bench, "text", "doc_id", n=3, min_hits=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # forcing the bloom re-introduces the bitmap attach
    forced = contamination_pairs(
        train, bench, "text", "doc_id", n=3, min_hits=3, bloom_min_items=0
    )
    fplan = forced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in fplan


def test_bloom_membership_exhaustive(spark):
    """Every inserted hash tests positive (zero false negatives), and
    the false-positive rate on disjoint probes stays near the design
    point (~0.24% at 16 bits/item, k=4)."""
    from dlp_rdb_bq_import_spark.operators.decontam import (
        bloom_might_contain,
        build_hash_bloom,
    )

    inserted = spark.range(0, 5000).select(F.xxhash64("id").alias("_h"))
    bf, m_bits = build_hash_bloom(inserted, "_h")
    hits = (
        inserted.join(F.broadcast(bf))
        .where(bloom_might_contain(F.col("_h"), m_bits))
        .count()
    )
    assert hits == 5000
    probes = spark.range(100000, 150000).select(F.xxhash64("id").alias("_h"))
    fp = (
        probes.join(F.broadcast(bf))
        .where(bloom_might_contain(F.col("_h"), m_bits))
        .count()
    )
    assert fp / 50000 < 0.01, f"false-positive rate {fp/50000:.4f} out of band"


def test_weighted_sample_no_key_order_bias_at_1e6(spark):
    """At 1e6 equal-weight rows the 53-bit uniform leaves essentially no
    score ties, so the key-asc tiebreak cannot skew the sample toward
    low keys: the sampled-key mean must sit within ~4 sigma of the
    population mean, and scores must be collision-free."""
    n, k = 1_000_000, 1000
    df = spark.range(n).select(F.col("id"), F.lit(1.0).alias("w"))
    picked = [r.id for r in sampling.weighted_sample(df, "id", "w", k=k).collect()]
    assert len(picked) == k
    # the 53-bit u itself must be essentially collision-free at 1e6 rows
    # (the 1e6-pmod bug made ties common and the key-asc tiebreak biased)
    mant = (1 << 53) - 1
    distinct_u = (
        df.select(
            F.xxhash64(F.col("id"), F.lit(0)).bitwiseAND(F.lit(mant)).alias("u")
        )
        .distinct()
        .count()
    )
    assert distinct_u >= n - 5, f"{n - distinct_u} u-collisions at {n} rows"
    mean = sum(picked) / k
    sigma = (n / 12**0.5) / k**0.5  # sd of a k-mean of Uniform(0, n)
    assert abs(mean - n / 2) < 4 * sigma, f"sample mean {mean:.0f} biased"
    lo_frac = sum(1 for x in picked if x < n / 10) / k
    assert 0.05 < lo_frac < 0.15, f"low-key decile share {lo_frac:.3f} biased"


def test_drop_repeated_paragraphs_planted(spark):
    """Duplicated paragraphs (blank-line separated) vanish, keeping the
    first occurrence and the original order of everything else."""
    text = "intro para\n\nboilerplate\n\nbody one\n\nboilerplate\n\nbody two\n\nintro para"
    df = spark.createDataFrame([(1, text), (2, "single para")], ["doc_id", "text"])
    out = {
        r.doc_id: r.text
        for r in text_ops.drop_repeated_paragraphs(df).collect()
    }
    assert out[1] == "intro para\n\nboilerplate\n\nbody one\n\nbody two"
    assert out[2] == "single para"


def test_drop_repeated_paragraphs_empty_and_no_sep(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "no separators here at all")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.text
        for r in text_ops.drop_repeated_paragraphs(df).collect()
    }
    assert out[1] == ""
    assert out[2] == "no separators here at all"


def test_cdc_chunks_char_offsets_non_ascii(spark):
    """CDC chunk offsets are CHARACTER offsets: on multi-byte text the
    chunks still tile 1..len(text) exactly and strip round-trips."""
    import random

    rng = random.Random(9)
    shared = "".join(rng.choice("àéîöüßабвгд日本語 xyz") for _ in range(400))
    docs = [(1, "préfix-œne-" + shared), (2, shared + "-suffîx-twø")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    chunks = dedup.cdc_chunks(df).collect()
    for doc_id, text in docs:
        mine = sorted((r.chunk_start, r.chunk_end) for r in chunks if r.doc_id == doc_id)
        assert mine[0][0] == 1 and mine[-1][1] == len(text), (doc_id, mine[-1], len(text))
        for (_, e1), (s2, _) in zip(mine, mine[1:]):
            assert s2 == e1 + 1
    h1 = {r.chunk_hash for r in chunks if r.doc_id == 1}
    h2 = {r.chunk_hash for r in chunks if r.doc_id == 2}
    assert len(h1 & h2) >= 2, "shared non-ascii region produced no aligned chunks"


def test_drop_repeated_paragraphs_null_text_kept(spark):
    """NULL text docs are kept (as empty), not silently dropped."""
    df = spark.createDataFrame([(1, None), (2, "a b a")], "doc_id long, text string")
    out = {r.doc_id: r.text for r in text_ops.drop_repeated_paragraphs(df, sep=" ").collect()}
    assert out[1] == "" and out[2] == "a b"


def test_edit_distance_pairs_matches_naive(spark):
    """FastSS deletion blocking returns EXACTLY the naive all-pairs
    levenshtein<=1 result: substitution, insertion, deletion pairs in;
    distance-2 pairs out."""
    rows = [
        (1, "customer01"),
        (2, "customer02"),   # substitution of 1
        (3, "customer013"),  # insertion into 1
        (4, "ustomer01"),    # deletion from 1
        (5, "custXmer9Z"),   # distance 2+ from everything
        (6, ""),
        (7, "a"),
        (8, "b"),            # dist 1 from 7 (substitution), 1 from 6? ("" -> "b" is insertion, dist 1)
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b): r.dist
        for r in dedup.edit_distance_pairs(df, "name", "id").collect()
    }
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (a_id, b_id): lev(a, b)
        for (a_id, a), (b_id, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= 1
    }
    assert got == want

    # max_dist=2 (symmetric-delete neighborhoods): exactly the naive
    # levenshtein<=2 pairs — including double-substitution, sub+insert,
    # double-delete, and transposition-as-two-edits shapes
    rows2 = rows + [
        (9, "customer12"),    # 2 substitutions from 1
        (10, "ustomer013"),   # delete+insert from 1
        (11, "customer0134"), # 2 insertions into 1
        (12, "stomer01"),     # 2 deletions from 1
        (13, "ustomerc01"),   # jumbled: dist 2 from 1 (move 'c')
        (14, "zzzzzzzzzz"),   # far from everything
    ]
    df2 = spark.createDataFrame(rows2, ["id", "name"])
    got2 = {
        (r.id_a, r.id_b): r.dist
        for r in dedup.edit_distance_pairs(df2, "name", "id", max_dist=2).collect()
    }
    want2 = {
        (a_id, b_id): lev(a, b)
        for (a_id, a), (b_id, b) in itertools.combinations(rows2, 2)
        if lev(a, b) <= 2
    }
    assert got2 == want2

    # guardrails: unsupported k; plan-side max_len blow-up guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_dist"):
        dedup.edit_distance_pairs(df, "name", "id", max_dist=3)
    long_df = spark.createDataFrame([(1, "x" * 80), (2, "x" * 80)], ["id", "name"])
    with _pytest.raises(Exception, match="max_len"):
        dedup.edit_distance_pairs(long_df, "name", "id", max_dist=2).collect()
    # ...and max_len is caller-tunable past the default
    assert (
        dedup.edit_distance_pairs(
            long_df, "name", "id", max_dist=2, max_len=128
        ).count()
        == 1
    )


def test_mad_outliers_null_group_key_rows_kept(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame(
        [("a", 1.0), (None, 5.0), (None, 6.0), (None, 1000.0)],
        "g string, v double",
    )
    out = mad_outliers(df, "v", ["g"], k=3.0).collect()
    assert len(out) == 4  # NULL-group rows survive (null-safe joins)
    nulls = {r.v: r.is_outlier for r in out if r.g is None}
    assert nulls[1000.0] == 1 and nulls[5.0] == 0 and nulls[6.0] == 0


def test_pareto_class_hand_computed(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import pareto_class

    # values 50, 30, 15, 5 (total 100): cum shares .5, .8, .95, 1.0
    df = spark.createDataFrame(
        [("w", 50.0), ("x", 30.0), ("y", 15.0), ("z", 5.0)],
        "item string, v double",
    )
    out = {r["item"]: (r["cum_share"], r["abc"])
           for r in pareto_class(df, item_cols=["item"], value_col="v").collect()}
    assert out["w"] == (0.5, "A")
    assert out["x"] == (0.8, "A")   # boundary inclusive
    assert out["y"] == (0.95, "B")  # boundary inclusive
    assert out["z"] == (1.0, "C")


def test_pareto_class_grouped_and_ties_deterministic(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import pareto_class

    df = spark.createDataFrame(
        [("g1", "a", 10.0), ("g1", "b", 10.0), ("g2", "c", 1.0)],
        "g string, item string, v double",
    )
    out = {(r["g"], r["item"]): r["cum_share"]
           for r in pareto_class(
               df, item_cols=["item"], value_col="v", group_cols=["g"]).collect()}
    # tie broken by item asc: a accumulates first
    assert out[("g1", "a")] == 0.5 and out[("g1", "b")] == 1.0
    assert out[("g2", "c")] == 1.0


def test_balance_classes_undersamples_to_minority(spark):
    from dlp_rdb_bq_import_spark.operators.sampling import balance_classes

    rows = [(i, "major") for i in range(2000)] + [(10_000 + i, "minor") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, cls string")
    out = balance_classes(df, key_col="k", class_col="cls")
    counts = {r["cls"]: r["n"] for r in
              out.groupBy("cls").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert counts["minor"] == 100                # rate 1: fully kept
    assert abs(counts["major"] - 100) <= 40      # ~target, hash variance
    # deterministic: same kept keys on a rerun
    a = sorted(r["k"] for r in out.collect())
    b = sorted(r["k"] for r in balance_classes(
        df, key_col="k", class_col="cls").collect())
    assert a == b


def test_balance_classes_explicit_target(spark):
    from dlp_rdb_bq_import_spark.operators.sampling import balance_classes

    rows = [(i, "a") for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, cls string")
    out = balance_classes(df, key_col="k", class_col="cls", target=250)
    n = out.count()
    assert abs(n - 250) <= 60


def test_impute_group_median_fills_only_nulls(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import impute_group_median

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 3.0), ("g", None), ("h", None)],
        "grp string, v double",
    )
    out = {(r["grp"], r["v"]): r for r in
           impute_group_median(df, "v", ["grp"]).collect()}
    assert out[("g", None)]["v_imputed"] == 2.0   # median of {1,3}
    assert out[("g", 1.0)]["v_imputed"] == 1.0    # present values untouched
    assert out[("h", None)]["v_imputed"] is None  # all-null group stays NULL


def test_k_anonymity_flags_small_classes(spark):
    from dlp_rdb_bq_import_spark.operators.privacy import k_anonymity_report

    rows = [("US", "A")] * 6 + [("US", "B")] * 2 + [(None, "A")] * 1
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = {(r["nation"], r["seg"]): (r["class_size"], r["at_risk"])
           for r in k_anonymity_report(df, ["nation", "seg"], k=5).collect()}
    assert out[("US", "A")] == (6, 0)
    assert out[("US", "B")] == (2, 1)
    assert out[(None, "A")] == (1, 1)  # NULL QI is its own (risky) class


def test_l_diversity_homogeneous_class_not_diverse(spark):
    from dlp_rdb_bq_import_spark.operators.privacy import l_diversity_report

    rows = [("US", "flu"), ("US", "flu"), ("US", "flu"),
            ("DE", "flu"), ("DE", "cold"),
            ("FR", None), ("FR", None)]
    df = spark.createDataFrame(rows, "nation string, dx string")
    out = {r["nation"]: (r["distinct_sensitive"], r["diverse"])
           for r in l_diversity_report(df, ["nation"], "dx", l=2).collect()}
    assert out["US"] == (1, 0)   # homogeneity attack: everyone has flu
    assert out["DE"] == (2, 1)
    assert out["FR"] == (0, 0)   # all-NULL sensitive: zero diversity


def test_table_checksum_order_and_partitioning_independent(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import table_checksum

    rows = [(i, f"s{i % 3}") for i in range(100)]
    a = spark.createDataFrame(rows, "k long, s string")
    b = spark.createDataFrame(list(reversed(rows)), "k long, s string").repartition(7)
    ca = table_checksum(a, ["k", "s"]).collect()[0]
    cb = table_checksum(b, ["k", "s"]).collect()[0]
    assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])
    # any single-value change flips the checksum
    c = spark.createDataFrame(rows[:-1] + [(99, "MUTATED")], "k long, s string")
    cc = table_checksum(c, ["k", "s"]).collect()[0]
    assert cc["checksum"] != ca["checksum"]


def test_table_checksum_null_vs_empty_distinct(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import table_checksum

    a = spark.createDataFrame([(1, None)], "k long, s string")
    b = spark.createDataFrame([(1, "")], "k long, s string")
    assert (table_checksum(a, ["k", "s"]).collect()[0]["checksum"]
            != table_checksum(b, ["k", "s"]).collect()[0]["checksum"])


def test_table_checksum_rejects_unportable_renderings(spark):
    """Every type whose string form is engine-specific must be rejected
    — float/double AND decimal/timestamp/date (trailing zeros, fraction
    and locale formatting would silently diverge checksums)."""
    from dlp_rdb_bq_import_spark.operators.profiling import table_checksum

    import pytest as _pytest

    for schema, bad in (
        ("k long, v double", "v"),
        ("k long, v decimal(10,2)", "v"),
        ("k long, v timestamp", "v"),
        ("k long, v date", "v"),
    ):
        df = spark.createDataFrame([], schema)
        with _pytest.raises(ValueError, match="engine-specifically"):
            table_checksum(df, ["k", bad])
    # portable types still pass
    ok = spark.createDataFrame([(1, "x")], "k long, v string")
    assert table_checksum(ok, ["k", "v"]).count() == 1


def test_hamming_neardup_max_hamming_guard(spark):
    sigs = spark.createDataFrame([(1, 5), (2, 5)], "id long, sig long")
    import pytest as _pytest

    for bad in (-1, 16, 63, 64):
        with _pytest.raises(ValueError, match="max_hamming"):
            dedup.hamming_neardup_pairs(sigs, "id", "sig", max_hamming=bad)
    assert dedup.hamming_neardup_pairs(sigs, "id", "sig", max_hamming=0).count() == 1


def test_impute_group_median_null_group_rows_kept(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import impute_group_median

    df = spark.createDataFrame(
        [("g", 1.0), (None, 4.0), (None, 6.0), (None, None)],
        "grp string, v double",
    )
    out = impute_group_median(df, "v", ["grp"]).collect()
    assert len(out) == 4  # NULL-group rows survive
    nulls = {r.v: r.v_imputed for r in out if r.grp is None}
    assert nulls[None] == 5.0  # imputed with the NULL group's median


def test_pareto_class_null_group_kept(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import pareto_class

    df = spark.createDataFrame(
        [("g1", "a", 10.0), (None, "b", 4.0), (None, "c", 1.0)],
        "g string, item string, v double",
    )
    out = {(r["g"], r["item"]): r["cum_share"]
           for r in pareto_class(df, item_cols=["item"], value_col="v",
                                 group_cols=["g"]).collect()}
    assert out[(None, "b")] == 0.8 and out[(None, "c")] == 1.0


def test_balance_classes_null_class_kept(spark):
    from dlp_rdb_bq_import_spark.operators.sampling import balance_classes

    rows = [(i, "a") for i in range(50)] + [(1000 + i, None) for i in range(5)]
    df = spark.createDataFrame(rows, "k long, cls string")
    out = balance_classes(df, key_col="k", class_col="cls")
    got = out.collect()
    # NULL class (the minority, 5 rows) fully kept; 'a' undersampled
    assert sum(1 for r in got if r.cls is None) == 5
    assert 0 < sum(1 for r in got if r.cls == "a") < 50


def test_snapshot_diff_key_presence_only(spark):
    from dlp_rdb_bq_import_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    out = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, ["k"], []).collect()}
    assert out == {1: "removed", 3: "added"}


def test_weighted_pagerank_rejects_null_and_drops_zero_weights(spark):
    from dlp_rdb_bq_import_spark.operators.graph import pagerank

    bad = spark.createDataFrame([(0, 1, None)], "src long, dst long, w double")
    with pytest.raises(ValueError, match="NULL weights"):
        pagerank(bad, weight_col="w")

    # zero-weight edge is no edge: no NaN poisoning, ranks sum to 1
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (2, 0, 0.0)], "src long, dst long, w double"
    )
    got = {r.node: r.rank for r in pagerank(df, weight_col="w").collect()}
    assert 2 not in got  # only incident edge had weight 0
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert all(r == r for r in got.values())  # no NaN


def test_containment_catches_quote_that_jaccard_misses(spark):
    """A short doc fully contained in a long one: containment from the
    short side ~1.0 while Jaccard is far below threshold."""
    from dlp_rdb_bq_import_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "the quick brown fox jumps over the lazy dog"
    # varied padding: distinct shingles, so the long doc's gram set is
    # genuinely much larger than the short doc's
    pad = " ".join(f"w{i}token{i * 13}" for i in range(80))
    long = short + " " + pad  # short doc verbatim inside a long one
    df = spark.createDataFrame([(1, short), (2, long)], "doc_id long, text string")
    cont = {(r["id_sub"], r["id_super"]): r["containment"]
            for r in ngram_containment_pairs(
                df, "text", "doc_id", n=5, threshold=0.8,
                max_doc_freq=None).collect()}
    assert cont[(1, 2)] == 1.0           # every short-doc gram is in long
    assert (2, 1) not in cont            # long doc is NOT contained in short
    jac = ngram_jaccard_pairs(df, "text", "doc_id", n=5, threshold=0.35,
                              max_doc_freq=None).collect()
    assert jac == []                     # Jaccard misses this pair entirely


def test_containment_directions_independent(spark):
    from dlp_rdb_bq_import_spark.operators.dedup import ngram_containment_pairs

    # near-identical docs: both directions clear the threshold
    a = "abcdefghijklmnopqrstuvwxyz" * 3
    df = spark.createDataFrame([(1, a), (2, a + "tail!")], "doc_id long, text string")
    out = {(r["id_sub"], r["id_super"]) for r in ngram_containment_pairs(
        df, "text", "doc_id", n=5, threshold=0.8, max_doc_freq=None).collect()}
    assert (1, 2) in out and (2, 1) in out


def _reference_bpe(words, k):
    """Independent pure-Python BPE trainer (Sennrich et al. semantics:
    weighted pair counts over the word-frequency table, deterministic
    (freq desc, pair asc) tie-break, left-to-right non-overlapping
    merge application)."""
    from collections import Counter

    vocab = {tuple(w): c for w, c in Counter(words).items()}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (l, r), w = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if w < 2:
            break
        merges.append((rank, l, r, l + r))
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges, vocab


def test_bpe_learn_matches_reference(spark, sf_dir):
    """Merges equal the independent trainer on the classic worked
    example AND on real fixture text; segments are consistent with the
    merge table (re-applying merges reproduces them); overlapping
    runs merge left-to-right non-overlapping ('aaaa' -> aa,aa)."""
    text = (
        "low low low low low lower lower newest newest newest newest "
        "newest newest widest widest widest aaaa"
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = [tuple(r) for r in text_ops.bpe_learn(df, num_merges=12).orderBy("rank").collect()]
    ref_m, ref_vocab = _reference_bpe(text.split(), 12)
    assert got == ref_m
    segs = {
        r.word: list(r.symbols)
        for r in text_ops.bpe_learn(df, num_merges=12, return_segments=True).collect()
    }
    assert segs == {"".join(k): list(k) for k in ref_vocab}
    assert segs["aaaa"] == ["aa", "aa"]  # left-to-right non-overlap

    docs = load_table(spark, sf_dir, "documents").limit(200)
    got = [tuple(r) for r in text_ops.bpe_learn(docs, num_merges=8).orderBy("rank").collect()]
    words = [
        w
        for r in docs.select("text").collect()
        for w in (r.text or "").split(" ")
        if w
    ]
    assert got == _reference_bpe(words, 8)[0]


def test_tokenize_and_pack_true_token_budgets(spark, sf_dir):
    """The tokenize_and_pack composition packs by the tokenizer's OWN
    counts: per-doc n_tokens equals the independent pure-Python
    encoder's token count, offsets are cumulative in doc order per
    stream, and every document's start offset is < 1024."""
    from dlp_rdb_bq_import_spark.harness import queries

    out = (
        queries()["tokenize_and_pack"](spark, sf_dir)
        .orderBy("source", "doc_id")
        .collect()
    )
    assert out
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    from dlp_rdb_bq_import_spark.operators.text import bpe_learn

    train = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 100 == 0)
    merges = [tuple(r) for r in bpe_learn(train, num_merges=16).orderBy("rank").collect()]
    # spot-check 10 docs against the reference encoder
    for r in out[:10]:
        want = sum(
            len(_reference_bpe_encode(w, merges))
            for w in docs[r.doc_id].split(" ")
            if w
        )
        assert r.n_tokens == want
    # packing invariants per stream
    by_stream: dict = {}
    for r in out:
        by_stream.setdefault(r.source, []).append(r)
    for rows in by_stream.values():
        cum = 0
        for r in rows:  # ordered by doc_id within source
            assert r.seq_id == cum // 1024 and r.seq_offset == cum % 1024
            cum += r.n_tokens


def test_ivf_persisted_index_equivalences(spark, sf_dir, tmp_path):
    """The persisted-IVF path returns exactly ivf_topk with the same
    centroids (parquet round-trip included); frozen-quantizer insert
    equals building on the union with those centroids; an inserted
    vector is findable; malformed tables fail loudly."""
    from dlp_rdb_bq_import_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_insert,
        ivf_topk,
        ivf_topk_index,
        train_ivf_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = e.where(F.col("vec_id") % 10 != 0)
    batch = e.where(F.col("vec_id") % 10 == 0)
    queries = e.where(F.col("vec_id") < 15)

    cents_np = train_ivf_centroids(corpus, 16)
    cents, vecs = build_ivf_index(corpus, centroids=cents_np)
    # round-trip both artifacts
    cents.write.parquet(str(tmp_path / "cents"))
    vecs.write.parquet(str(tmp_path / "vecs"))
    cents = spark.read.parquet(str(tmp_path / "cents"))
    vecs = spark.read.parquet(str(tmp_path / "vecs"))

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # search ≡ the non-persisted operator with the same quantizer
    assert rows(ivf_topk_index(queries, cents, vecs, k=5, nprobe=4)) == rows(
        ivf_topk(queries, corpus, k=5, nprobe=4, centroids=cents_np)
    )

    # frozen-quantizer insert ≡ rebuild-on-union with the same centroids
    merged = ivf_index_insert(vecs, cents, batch)
    _, rebuilt = build_ivf_index(
        corpus.unionByName(batch), centroids=cents_np
    )
    assert rows(merged) == rows(rebuilt)

    # a planted copy of an inserted vector is its own top neighbor
    probe = batch.limit(1).withColumn("vec_id", F.lit(777000).cast("long"))
    target = batch.limit(1).collect()[0].vec_id
    hits = ivf_topk_index(probe, cents, merged, k=3, nprobe=4).collect()
    assert hits and hits[0].nid == target and hits[0].cosine == 1.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="vector_table"):
        ivf_topk_index(queries, cents, e)
    with _pytest.raises(ValueError, match="cells 0"):
        ivf_topk_index(queries, cents.where(F.col("cell") > 3), vecs)


def test_mine_contrastive_pairs_planted(spark):
    """Hard-negative mining on planted geometry: an exact duplicate is
    the rank-1 positive at cosine 1.0, near-misses below the band fill
    hard_negative in similarity order capped at k_neg, the same pair
    never appears in both bands, and invalid parameters fail loudly."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.similarity import (
        mine_contrastive_pairs,
    )

    rows = [
        (1, [1.0, 0.0, 0.0]),       # anchor
        (10, [1.0, 0.0, 0.0]),      # exact dup -> positive
        (11, [0.95, 0.3122, 0.0]),  # high cos -> positive (>= 0.9)
        (12, [0.6, 0.8, 0.0]),      # cos 0.6 -> hard negative
        (13, [0.5, 0.866, 0.0]),    # cos 0.5 -> hard negative
        (14, [0.0, 1.0, 0.0]),      # cos 0 -> negative, rank 3
        (15, [-1.0, 0.0, 0.0]),     # cos -1 -> beyond k_neg=3 cut
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], ["vec_id", "embedding"]
    )
    anchors = df.where(F.col("vec_id") == 1)
    out = mine_contrastive_pairs(anchors, df, k_neg=3, pos_threshold=0.9)
    got = {(r.role, r.rank): (r.nid, r.cosine) for r in out.collect()}
    assert got[("positive", 1)] == (10, 1.0)
    assert got[("positive", 2)][0] == 11
    assert [got[("hard_negative", i)][0] for i in (1, 2, 3)] == [12, 13, 14]
    assert ("hard_negative", 4) not in got  # k_neg cap; id 15 out
    both = [k for k in got if got[k][0] in (10, 11)]
    assert all(r == "positive" for r, _ in both)

    with _pytest.raises(ValueError, match="k_neg"):
        mine_contrastive_pairs(anchors, df, k_neg=0)
    with _pytest.raises(ValueError, match="not exceed"):
        mine_contrastive_pairs(anchors, df, neg_ceiling=0.95, pos_threshold=0.9)
    # explicit lower ceiling: nothing in [ceiling, pos) mined at all
    gap = mine_contrastive_pairs(
        anchors, df, k_neg=3, pos_threshold=0.9, neg_ceiling=0.55
    )
    negs = {r.nid for r in gap.where(F.col("role") == "hard_negative").collect()}
    assert 12 not in negs and 13 in negs


def test_record_linkage_scoring_hand_computed(spark):
    """Fellegi-Sunter pair scoring against hand arithmetic: agreement
    adds log2(m/u), disagreement adds log2((1-m)/(1-u)); thresholds
    classify match/possible/non_match; invalid (m, u) and thresholds
    fail loudly; the plan is a pure projection (no exchange added
    beyond the input)."""
    import math

    from dlp_rdb_bq_import_spark.operators.linkage import (
        FieldRule,
        score_candidate_pairs,
    )

    pairs = spark.createDataFrame(
        [
            (1, 2, 0, 5, 5),   # same name, same city
            (1, 3, 1, 5, 7),   # near name, different city
            (2, 4, 1, 9, 9),   # near name, same city
        ],
        ["id_a", "id_b", "dist", "city_a", "city_b"],
    )
    rules = [
        FieldRule("name", F.col("dist") == 0, 0.9, 0.1),
        FieldRule("city", F.col("city_a") == F.col("city_b"), 0.8, 0.2),
    ]
    wn_a, wn_d = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)
    wc_a, wc_d = math.log2(0.8 / 0.2), math.log2(0.2 / 0.8)
    got = {
        (r.id_a, r.id_b): (r.agree_name, r.agree_city, r.score, r.verdict)
        for r in score_candidate_pairs(pairs, rules, upper=3.0, lower=-3.0).collect()
    }
    assert got[(1, 2)] == (1, 1, round(wn_a + wc_a, 9), "match")
    assert got[(1, 3)] == (0, 0, round(wn_d + wc_d, 9), "non_match")
    assert got[(2, 4)] == (0, 1, round(wn_d + wc_a, 9), "possible")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="0 < u < m"):
        FieldRule("bad", F.lit(True), 0.2, 0.5)
    with _pytest.raises(ValueError, match="upper > lower"):
        score_candidate_pairs(pairs, rules, upper=0.0, lower=0.0)
    with _pytest.raises(ValueError, match="non-empty"):
        score_candidate_pairs(pairs, [], upper=1.0, lower=0.0)
    plan = (
        score_candidate_pairs(pairs, rules, upper=3.0, lower=-3.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # scoring is projection-only

    # the verdicts bound: output = full output filtered, and the
    # filter FUSES into the same exchange-free projection (the 100 TB
    # path — non_match bulk never materializes)
    bounded = score_candidate_pairs(
        pairs, rules, upper=3.0, lower=-3.0, verdicts=("match", "possible")
    )
    got_b = {(r.id_a, r.id_b): r.verdict for r in bounded.collect()}
    assert got_b == {(1, 2): "match", (2, 4): "possible"}
    assert "Exchange" not in bounded._jdf.queryExecution().executedPlan().toString()
    with _pytest.raises(ValueError, match="subset"):
        score_candidate_pairs(
            pairs, rules, upper=3.0, lower=-3.0, verdicts=("match", "maybe")
        )
    with _pytest.raises(ValueError, match="subset"):
        score_candidate_pairs(pairs, rules, upper=3.0, lower=-3.0, verdicts=())


def test_assign_entity_ids_closure_and_singletons(spark):
    """Entity consolidation: match pairs collapse transitively (a~b,
    b~c → one entity labeled by the minimum id even though a~c was
    never emitted), unmatched records become singleton entities under
    their own id, and the added column is a long."""
    from dlp_rdb_bq_import_spark.operators.linkage import assign_entity_ids

    records = spark.createDataFrame(
        [(i, f"rec{i}") for i in (1, 2, 3, 7, 9)], ["rid", "val"]
    )
    # chain 1-2, 2-3 (transitive); 9 pairs only with itself-absent 7
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (7, 9)], ["id_a", "id_b"]
    )
    out = assign_entity_ids(records, pairs, "rid")
    got = {r.rid: r.entity_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
    assert dict(out.dtypes)["entity_id"] == "bigint"
    # survivorship aggregation on top: one golden row per entity
    golden = out.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n"), F.min_by("val", "rid").alias("canon")
    )
    g = {r.entity_id: (r.n, r.canon) for r in golden.collect()}
    assert g == {1: (3, "rec1"), 7: (2, "rec7")}


def test_variant_index_incremental_contract(spark):
    """Persisted FastSS variant index: probing a corpus index with a
    new batch finds exactly the cross batch↔corpus edit-distance-≤1
    pairs the full self-join over the union finds (within-batch and
    within-corpus pairs excluded by contract), and inserting a batch's
    variants equals rebuilding the index from the union. Malformed
    index columns fail loudly."""
    from dlp_rdb_bq_import_spark.operators.dedup import (
        edit_distance_pairs,
        fastss_variant_index,
        probe_variant_index,
        variant_index_insert,
        verify_edit_distance,
    )

    corpus = spark.createDataFrame(
        [(1, "smith"), (2, "smyth"), (3, "jones"), (4, "brown")], ["id", "name"]
    )
    batch = spark.createDataFrame(
        [(11, "smith"), (12, "jonas"), (13, "xavier"), (14, "browns")],
        ["id", "name"],
    )
    union = corpus.unionByName(batch)
    index = fastss_variant_index(corpus, "name", "id")
    cand = probe_variant_index(batch, index, "name", "id")
    got = sorted(
        map(tuple, verify_edit_distance(cand, union, "name", "id").collect())
    )
    # full-path truth restricted to cross pairs (batch ids are > 10)
    full = edit_distance_pairs(union, "name", "id")
    expect = sorted(
        (max(a, b), min(a, b), d)
        for a, b, d in map(tuple, full.collect())
        if (a > 10) != (b > 10)
    )
    assert got == expect
    # planted shapes: exact dup, substitution, insert, delete all found
    ids = {(a, b) for a, b, _ in got}
    assert {(11, 1), (11, 2), (12, 3), (14, 4)} <= ids
    assert (13, 4) not in ids  # distance 2 stays out

    # maintenance: insert ≡ rebuild-from-union
    inserted = variant_index_insert(index, fastss_variant_index(batch, "name", "id"))
    rebuilt = fastss_variant_index(union, "name", "id")
    assert sorted(map(tuple, inserted.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="column mismatch"):
        variant_index_insert(index, batch)
    with _pytest.raises(ValueError, match="missing columns"):
        probe_variant_index(batch, corpus, "name", "id")


def test_merge_entity_assignments_contract(spark):
    """Entity-assignment maintenance: folding new match edges into an
    existing assignment equals rebuilding from the union of all edges
    — including the fusion case where one new edge bridges two
    standing entities — new-only ids enter as entities, untouched
    singletons pass through, and malformed assignments fail loudly."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.linkage import (
        assign_entity_ids,
        merge_entity_assignments,
    )

    records = spark.createDataFrame(
        [(i, f"r{i}") for i in (1, 2, 3, 4, 5, 6, 9)], ["rid", "val"]
    )
    old_edges = [(1, 2), (3, 4)]  # entities {1,2}, {3,4}; 5,6,9 singles
    new_edges = [(2, 3), (5, 20)]  # fuses {1,2}+{3,4}; brings in 20
    old_df = spark.createDataFrame(old_edges, ["id_a", "id_b"])
    new_df = spark.createDataFrame(new_edges, ["id_a", "id_b"])

    assignment = assign_entity_ids(records, old_df, "rid").select(
        F.col("rid").alias("doc_id"), "entity_id"
    )
    merged = merge_entity_assignments(assignment, new_df)
    got = {r.doc_id: r.entity_id for r in merged.collect()}

    rebuilt = assign_entity_ids(
        records.unionByName(spark.createDataFrame([(20, "r20")], ["rid", "val"])),
        spark.createDataFrame(old_edges + new_edges, ["id_a", "id_b"]),
        "rid",
    )
    expect = {r.rid: r.entity_id for r in rebuilt.collect()}
    assert got == expect
    assert got[4] == 1 and got[3] == 1  # fusion collapsed to min label
    assert got[20] == 5 and got[9] == 9

    with _pytest.raises(ValueError, match="assignment needs columns"):
        merge_entity_assignments(records, new_df)


def test_bm25_from_tf_equals_text_path(spark):
    """bm25_topk_from_tf over the exploded-and-counted words of a
    corpus returns byte-identical scores/ranks to bm25_topk over the
    raw text (same shared scoring expression, dl = Σtf), and a term
    missing from the tf table simply contributes nothing."""
    from dlp_rdb_bq_import_spark.operators.text import (
        bm25_topk,
        bm25_topk_from_tf,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "beta beta beta"),
            (3, "alpha gamma gamma delta"),
            (4, "delta delta"),
        ],
        "doc_id long, text string",
    )
    terms = ["alpha", "beta", "zzz_absent"]
    via_text = bm25_topk(docs, terms, k=4)
    tf = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    via_tf = bm25_topk_from_tf(tf, terms, id_col="doc_id", k=4)
    a = [(r.doc_id, r.score, r.rk) for r in via_text.collect()]
    b = [(r.doc_id, r.score, r.rk) for r in via_tf.collect()]
    assert sorted(a) == sorted(b) and len(a) == 3  # doc 4 matches no term


def test_bottomk_merge_and_estimator(spark):
    """KMV contracts: (a) bottomk over a union equals the merge of the
    parts' bottomks (the property that makes the sampler streamable);
    (b) the sample is partitioning-independent; (c) the distinct
    estimate is exact below k and within 2 relative standard errors
    (rse = 1/sqrt(k-2) ~ 12.7% at k=64) of truth on the md5 uniform —
    the draw is deterministic, the bound documents the estimator's
    design accuracy; (d) streamed fold equals the batch sample."""
    from dlp_rdb_bq_import_spark.operators.sampling import (
        bottomk_sample,
        kmv_distinct_estimate,
        merge_bottomk,
    )
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_bottomk

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(2000)], "doc_id long, grp long"
    )
    k = 64
    full = bottomk_sample(df, "doc_id", k)
    ids = lambda d: sorted(r.doc_id for r in d.collect())
    base = ids(full)
    assert len(base) == k
    assert ids(bottomk_sample(df.repartition(11), "doc_id", k)) == base

    a = bottomk_sample(df.where("doc_id < 900"), "doc_id", k)
    b = bottomk_sample(df.where("doc_id >= 900"), "doc_id", k)
    assert ids(merge_bottomk(a, b, "doc_id", k)) == base

    est = kmv_distinct_estimate(full, k).first()
    assert est.n_retained == k
    assert abs(est.est_distinct - 2000) / 2000 < 2 / (k - 2) ** 0.5

    small = bottomk_sample(df.where("doc_id < 10"), "doc_id", k)
    e2 = kmv_distinct_estimate(small, k).first()
    assert (e2.n_retained, e2.est_distinct) == (10, 10.0)

    streamed = streaming_bottomk(
        spark, df.repartitionByRange(4, "doc_id"), "doc_id", k
    )
    assert ids(streamed) == base


def test_streaming_anchor_index_equals_batch(spark):
    """The streaming anchor-index fold accumulated over micro-batches
    equals the batch rebuild over all pages — both tf and the
    distinct-doc count (each page's links live in exactly one
    micro-batch, so both counters are disjoint-partition sums)."""
    from dlp_rdb_bq_import_spark.operators.html_extract import (
        extract_links_with_text,
    )
    from dlp_rdb_bq_import_spark.operators.urls import anchor_text_index
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_anchor_index

    rows = [
        (
            d,
            f'<html><body><a href="https://t{d % 2}.example.com/p">'
            f'guide {"deep " * (d % 3)}</a>'
            '<a href="https://t0.example.com/q">other guide</a>'
            "</body></html>",
        )
        for d in range(1, 10)
    ]
    pages = spark.createDataFrame(rows, "doc_id long, html string")
    batch = anchor_text_index(
        extract_links_with_text(pages, "html", "doc_id"), "doc_id"
    )
    streamed = streaming_anchor_index(
        spark, pages.repartitionByRange(3, "doc_id"), "html", "doc_id"
    )
    key = lambda df: {
        (r.canon, r.token): (r.tf, r.n_docs) for r in df.collect()
    }
    assert key(streamed) == key(batch)


def test_streaming_linkage_probe_equals_batch(spark):
    """The streaming probe ≡ the batch probe on the same data: new
    records arriving across micro-batches against the persisted
    variant index produce exactly the all-at-once candidate/verify
    answer (per-pair verification is independent — no cross-batch
    state to get wrong), and a malformed index fails loudly."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.dedup import (
        fastss_variant_index,
        probe_variant_index,
        verify_edit_distance,
    )
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_linkage_probe

    corpus = spark.createDataFrame(
        [(1, "smith"), (2, "smyth"), (3, "jones"), (4, "brown")], ["id", "name"]
    )
    batch = spark.createDataFrame(
        [(11, "smith"), (12, "jonas"), (13, "xavier"), (14, "browns")],
        ["id", "name"],
    )
    index = fastss_variant_index(corpus, "name", "id")
    streamed = streaming_linkage_probe(
        spark, batch.repartition(3), corpus, index, "name", "id"
    )
    union = corpus.unionByName(batch)
    batch_answer = verify_edit_distance(
        probe_variant_index(batch, index, "name", "id"), union, "name", "id"
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch_answer.collect())
    )
    with _pytest.raises(ValueError, match="fastss_variant_index"):
        streaming_linkage_probe(spark, batch, corpus, corpus, "name", "id")


def test_fuzzy_candidate_stages_compose(spark):
    """deletion_neighborhood_candidates → verify_edit_distance is the
    factored seam both the fuzzy-pair queries and record linkage
    consume: the candidate stage is a SUPERSET of true pairs, the
    verify stage cuts it to exactly edit_distance_pairs' answer, and
    one candidate stream can fan out to multiple consumers."""
    from dlp_rdb_bq_import_spark.operators.dedup import (
        deletion_neighborhood_candidates,
        edit_distance_pairs,
        verify_edit_distance,
    )

    df = spark.createDataFrame(
        [(1, "smith"), (2, "smyth"), (3, "smith"), (4, "jones"), (5, "jonas")],
        ["id", "name"],
    )
    cand = deletion_neighborhood_candidates(df, "name", "id", max_dist=1)
    assert set(cand.columns) == {"id_a", "id_b"}
    verified = sorted(
        map(tuple, verify_edit_distance(cand, df, "name", "id", max_dist=1).collect())
    )
    composed = sorted(map(tuple, edit_distance_pairs(df, "name", "id").collect()))
    assert verified == composed
    assert (1, 3, 0) in verified and (1, 2, 1) in verified and (4, 5, 1) in verified
    # superset-then-verify: candidates ⊇ verified pairs
    cand_set = {(r.id_a, r.id_b) for r in cand.collect()}
    assert {(a, b) for a, b, _ in verified} <= cand_set


def test_model_index_merge_semantics(spark, sf_dir):
    """Persisted-artifact maintenance: merging two batches' LM counts
    equals training on the union, and merging two benchmark suites'
    gram indexes equals indexing the union — including re-registered
    overlap docs. Malformed inputs fail loudly."""
    from dlp_rdb_bq_import_spark.operators.decontam import (
        bench_gram_index,
        merge_gram_index,
    )
    from dlp_rdb_bq_import_spark.operators.text import (
        merge_lm_counts,
        ngram_lm_counts,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    a = d.where(F.col("doc_id") % 2 == 0)
    b = d.where(F.col("doc_id") % 3 == 0)  # overlaps a on %6==0

    merged = sorted(
        map(
            tuple,
            merge_lm_counts(
                ngram_lm_counts(a, "text"),
                ngram_lm_counts(d.where((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 != 0)), "text"),
            ).collect(),
        )
    )
    union_trained = sorted(
        map(
            tuple,
            ngram_lm_counts(
                d.where((F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 3 == 0)),
                "text",
            ).collect(),
        )
    )
    assert merged == union_trained and merged

    gi = sorted(
        map(
            tuple,
            merge_gram_index(
                bench_gram_index(a, "text", "doc_id", n=3),
                bench_gram_index(b, "text", "doc_id", n=3),  # overlap re-registered
            ).collect(),
        )
    )
    gu = sorted(
        map(
            tuple,
            bench_gram_index(
                d.where((F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 3 == 0)),
                "text",
                "doc_id",
                n=3,
            ).collect(),
        )
    )
    assert gi == gu and gi

    import pytest as _pytest

    with _pytest.raises(ValueError, match="new_counts"):
        merge_lm_counts(ngram_lm_counts(a, "text"), a)
    with _pytest.raises(ValueError, match="new_grams"):
        merge_gram_index(bench_gram_index(a, "text", "doc_id"), a)


def test_rrf_fuse_hand_computed(spark):
    """RRF against hand arithmetic: overlap docs sum both reciprocal
    ranks, single-list docs score one term, ties break by id; top_n
    truncates after ordering; malformed/empty inputs fail loudly."""
    from dlp_rdb_bq_import_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rk"])
    b = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rk"])
    got = {
        r.doc_id: (r.rrf_score, r.rk)
        for r in rrf_fuse([a, b], k=60).collect()
    }
    want = {
        1: round(1 / 61, 9),
        2: round(1 / 62, 9),
        3: round(1 / 63 + 1 / 61, 9),
        4: round(1 / 62, 9),
    }
    assert {d: s for d, (s, _) in got.items()} == want
    # doc 3 (in both lists) wins; tie between 2 and 4 breaks by id
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert order == [3, 1, 2, 4]
    assert [r.doc_id for r in rrf_fuse([a, b], top_n=2).collect()] == [3, 1]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    with _pytest.raises(ValueError, match="rankings\\[1\\]"):
        rrf_fuse([a, b.withColumnRenamed("rk", "rank")])

    # a duplicate id within ONE list collapses to its best rank and
    # contributes exactly one reciprocal term — an un-collapsed
    # duplicate would fan out through the outer joins and double-count
    a_dup = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (1, 5)], ["doc_id", "rk"]
    )
    got_dup = {
        r.doc_id: r.rrf_score for r in rrf_fuse([a_dup, b], k=60).collect()
    }
    assert got_dup == want


def test_ngram_lm_scores_hand_computed(spark):
    """Bigram LM with add-1/2 smoothing against a hand-computed model:
    seen transitions score by (c12+k)/(c1+kV); unseen words/pairs get
    the uniform floor; empty-ish docs produce no rows (no bigrams);
    a malformed model table fails loudly."""
    import math

    from dlp_rdb_bq_import_spark.operators.text import (
        ngram_lm_counts,
        ngram_lm_scores,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "the  cat sat")],
        ["doc_id", "text"],
    )
    lm = ngram_lm_counts(train, "text")
    counts = {(r.w1, r.w2): r.c for r in lm.collect()}
    # double space in doc 3 must not create an empty-token bigram
    assert counts == {("the", "cat"): 3, ("cat", "sat"): 2, ("cat", "ran"): 1}

    score_df = spark.createDataFrame(
        [(10, "the cat sat"), (11, "dog zzz"), (12, "one")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in ngram_lm_scores(score_df, lm, "text").collect()}
    V = 4  # the, cat, sat, ran
    k = 0.5

    def lp(c12, c1):
        return round(math.log((c12 + k) / (c1 + k * V)) * 1e6)

    # doc 10: (the,cat) c12=3 c1=3; (cat,sat) c12=2 c1=3
    want10 = lp(3, 3) + lp(2, 3)
    assert got[10].n_bigrams == 2 and got[10].logprob_micro == want10
    assert got[10].avg_logprob == want10 / (2 * 1e6)
    # doc 11: fully unseen -> uniform floor k/(kV) = 1/V
    assert got[11].n_bigrams == 1 and got[11].logprob_micro == lp(0, 0)
    # doc 12: one word, no bigrams, no row
    assert 12 not in got

    # min_count pruning drops the singleton pair from the artifact
    assert ("cat", "ran") not in {
        (r.w1, r.w2) for r in ngram_lm_counts(train, "text", min_count=2).collect()
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="ngram_lm_counts"):
        ngram_lm_scores(score_df, train, "text")


def _reference_bpe_encode(word, merges):
    """Independent pure-Python BPE encoder: apply each learned merge
    in rank order as a left-to-right non-overlapping pass."""
    syms = list(word)
    for _, l, r, m in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(m)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_reference_and_paths_agree(spark, sf_dir):
    """bpe_encode on the training corpus reproduces the trainer's own
    segmentation; on UNSEEN words it equals the independent pure-Python
    encoder; and the JVM-fold and Pandas priority-loop paths are
    identical (the rank-order-pass vs lowest-rank-first equivalence)."""
    text = (
        "low low low low low lower lower newest newest newest newest "
        "newest newest widest widest widest aaaa"
    )
    train = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges_df = text_ops.bpe_learn(train, num_merges=12)
    merges = [tuple(r) for r in merges_df.orderBy("rank").collect()]

    # encode a corpus containing seen AND unseen words
    corpus = spark.createDataFrame(
        [(1, text), (2, "lowest newer wideness aaaaa unseen")],
        ["doc_id", "text"],
    )

    def tokens_of(out_df):
        rows = out_df.orderBy("doc_id", "word_pos", "tok_pos").collect()
        toks = {}
        for r in rows:
            toks.setdefault((r.doc_id, r.word_pos), []).append(r.token)
        return toks

    fold = tokens_of(text_ops.bpe_encode(corpus, merges_df, method="fold"))
    pandas_ = tokens_of(text_ops.bpe_encode(corpus, merges_df, method="pandas"))
    assert fold == pandas_

    expected = {}
    for doc_id, t in [(1, text), (2, "lowest newer wideness aaaaa unseen")]:
        for pos, w in enumerate(t.split(" ")):
            expected[(doc_id, pos)] = _reference_bpe_encode(w, merges)
    assert fold == expected
    # the training corpus' segmentation equals the trainer's own
    segs = {
        r.word: list(r.symbols)
        for r in text_ops.bpe_learn(train, num_merges=12, return_segments=True).collect()
    }
    for (doc_id, pos), toks in fold.items():
        if doc_id == 1:
            w = text.split(" ")[pos]
            assert toks == segs[w]

    # fixture documents: both paths equal the reference encoder
    docs = load_table(spark, sf_dir, "documents").limit(50)
    m_df = text_ops.bpe_learn(docs, num_merges=8)
    m = [tuple(r) for r in m_df.orderBy("rank").collect()]
    got = tokens_of(text_ops.bpe_encode(docs, m_df, method="pandas"))
    for r in docs.select("doc_id", "text").collect():
        for pos, w in enumerate((r.text or "").split(" ")):
            if w:
                assert got[(r.doc_id, pos)] == _reference_bpe_encode(w, m)

    # guardrails
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        text_ops.bpe_encode(corpus, merges_df, method="nope")


def test_partial_overlap_catches_shared_passage_whole_doc_misses(spark):
    """A 40-word passage shared by two otherwise-different documents —
    with 3 of its words edited in one copy — is invisible to whole-doc
    MinHash at the same threshold but surfaces as a chunk-level pair;
    documents with no shared passage produce nothing."""
    import numpy as np

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]
    shared = list(rng.choice(vocab, 40))
    docs = [(i, list(rng.choice(vocab, 150))) for i in range(6)]
    docs[1] = (1, docs[1][1][:50] + shared + docs[1][1][50:])
    d4 = docs[4][1][:83] + shared + docs[4][1][83:]
    for j in (5, 17, 33):
        d4[83 + j] = f"edited{j}"
    docs[4] = (4, d4)
    df = spark.createDataFrame([(i, " ".join(w)) for i, w in docs], ["doc_id", "text"])
    got = [
        (r.id_a, r.id_b, r.n_chunk_matches)
        for r in dedup.partial_overlap_pairs(df).collect()
    ]
    assert [(a, b) for a, b, _ in got] == [(1, 4)]
    whole = dedup.minhash_dedup_pairs(
        df, "text", "doc_id", threshold=0.4, shingle_n=3
    ).collect()
    assert whole == []  # doc-level Jaccard can't see the passage
    with pytest.raises(ValueError, match="chunk_words"):
        dedup.partial_overlap_pairs(df, chunk_words=10, stride_words=20)


def test_html_boilerplate_extraction_planted(spark):
    """Planted-page HTML extraction: chrome blocks (nav, share bar,
    stopword-free footer) classify boilerplate and vanish from the
    main text; real paragraphs survive IN ORDER with entities decoded
    and script/style content (including a literal '<' inside a JS
    string) never leaking; a pure-chrome page drops out entirely;
    link density matches hand arithmetic."""
    from dlp_rdb_bq_import_spark.operators.html_extract import (
        extract_main_content,
        html_blocks,
        strip_tags,
    )

    page = (
        "<html><head><title>t</title><style>p{color:red}</style>"
        '<script>var x = "a < b && c";</script></head><body>'
        '<nav><a href="/">home</a> <a href="/x">archive</a></nav>'
        "<p>the quick brown fox jumps over a lazy dog today</p>"
        "<!-- hidden comment words -->"
        "<p>second paragraph of the story continues with more of the tale</p>"
        '<div class="share"><a href="#">share</a> <a href="#">tweet</a></div>'
        "<footer>copyright 2026 example corp</footer></body></html>"
    )
    chrome_only = (
        '<html><body><nav><a href="/">home</a> <a href="/y">next</a></nav>'
        "<footer>copyright 2026</footer></body></html>"
    )
    df = spark.createDataFrame(
        [(1, page), (2, chrome_only)], ["doc_id", "html"]
    )
    kw = dict(min_words=5, max_link_density=0.4, min_stop_density=0.02)

    blocks = {
        (r.doc_id, r.block_ord): r
        for r in html_blocks(df, "html", "doc_id", **kw).collect()
    }
    verdicts = {
        k: v.verdict for k, v in blocks.items() if v.doc_id == 1
    }
    texts = {k: blocks[k].text for k in verdicts}
    # nav: every char is anchor text -> link-dense boilerplate
    nav_key = next(k for k, t in texts.items() if t == "home archive")
    assert verdicts[nav_key] == "boilerplate"
    # anchor chars 4 ("home") + 7 ("archive") = 11; stripped block
    # text "home archive" = 12 chars (separator space is outside the
    # anchors) -> 11/12, well over the 0.4 cap
    assert blocks[nav_key].link_density == round(11 / 12, 9)
    assert blocks[nav_key].n_chars == 12

    main = {r.doc_id: r for r in extract_main_content(df, "html", "doc_id", **kw).collect()}
    assert 2 not in main  # pure chrome page gone
    got = main[1].main_text
    assert got == (
        "the quick brown fox jumps over a lazy dog today "
        "second paragraph of the story continues with more of the tale"
    )
    assert main[1].n_blocks == 2
    for leak in ("home", "share", "tweet", "copyright", "color:red",
                 "tracker", "hidden comment"):
        assert leak not in got

    # strip_tags standalone: entities decode, &amp; last
    flat = (
        spark.range(1)
        .select(
            strip_tags(
                F.lit("<p>a &amp;lt; b &lt; c &quot;d&quot; &#39;e&#39;</p>")
            ).alias("s")
        )
        .first()
        .s
    )
    assert flat == "a &lt; b < c \"d\" 'e'"


def test_extract_links_planted(spark):
    """Outlink extraction: hrefs come out in document order with
    1-based ordinals across all three attribute-value forms (double-
    quoted, single-quoted, unquoted — quotes stripped exactly, a
    single quote INSIDE a double-quoted value survives); anchors
    without an href and non-anchor tags carrying hrefs (<link>,
    <area> — the whitespace-after-tag-name requirement) are skipped;
    multiline anchors, mixed-case HREF=, and spaces around '=' match;
    link-free pages emit nothing."""
    from dlp_rdb_bq_import_spark.operators.html_extract import extract_links

    page = (
        '<html><body><a href="/rel">r</a>'
        "<a name='x'>no href</a>"
        '<A\n  class="big"\n  HREF="https://h1.example.com/a">abs</A>'
        "<a href='/single'>single-quoted</a>"
        "<a href=/bare>unquoted</a>"
        '<a href = "/spaced">spaces around =</a>'
        "<a href=\"/it's\">inner quote kept</a>"
        '<link href="/style.css">'
        '<area href="/image-map">'
        '<a data-x="1" href="#frag">f</a></body></html>'
    )
    df = spark.createDataFrame(
        [(1, page), (2, "<p>no links at all</p>")], ["doc_id", "html"]
    )
    got = [
        (r.doc_id, r.link_ord, r.href)
        for r in extract_links(df, "html", "doc_id")
        .orderBy("doc_id", "link_ord")
        .collect()
    ]
    assert got == [
        (1, 1, "/rel"),
        (1, 2, "https://h1.example.com/a"),
        (1, 3, "/single"),
        (1, 4, "/bare"),
        (1, 5, "/spaced"),
        (1, 6, "/it's"),
        (1, 7, "#frag"),
    ]


def test_anchor_text_index_planted(spark):
    """Inbound anchor-text aggregation on planted anchors: visible
    anchor text flattens (nested tags stripped, entities decoded);
    cosmetic URL variants of one target pool their anchors under one
    canonical form; tf counts occurrences while n_docs counts distinct
    linking pages; relative hrefs drop; empty anchor text (image
    links) contributes no tokens."""
    from dlp_rdb_bq_import_spark.operators.html_extract import (
        extract_links_with_text,
    )
    from dlp_rdb_bq_import_spark.operators.urls import anchor_text_index

    p1 = (
        '<html><body><a href="https://T.example.com/page/">'
        "<b>Great&nbsp;guide</b></a>"
        '<a href="https://t.example.com/page?utm_source=x">guide here</a>'
        '<a href="/relative">dropped</a>'
        '<a href="https://t.example.com/page"><img src="x.png"></a>'
        "</body></html>"
    )
    p2 = '<html><body><a href="https://t.example.com/page">guide</a></body></html>'
    df = spark.createDataFrame([(1, p1), (2, p2)], ["doc_id", "html"])

    links = extract_links_with_text(df, "html", "doc_id")
    got = {
        (r.doc_id, r.link_ord): (r.href, r.anchor_text)
        for r in links.collect()
    }
    assert got[(1, 1)] == ("https://T.example.com/page/", "Great guide")
    assert got[(1, 4)] == ("https://t.example.com/page", "")  # image link

    idx = {
        (r.canon, r.token): (r.tf, r.n_docs)
        for r in anchor_text_index(links, "doc_id").collect()
    }
    target = "https://t.example.com/page"
    # 'guide' appears in three anchors across both docs: p1's two text
    # anchors + p2's one -> tf=3, n_docs=2
    assert idx[(target, "guide")] == (3, 2)
    assert idx[(target, "great")] == (1, 1)
    assert idx[(target, "here")] == (1, 1)
    # nothing under a relative target, no empty tokens
    assert all(c == target for (c, _t) in idx)


def test_merge_anchor_index_equals_rebuild(spark):
    """Anchor-index maintenance contract: folding a doc-disjoint
    batch's aggregate into the standing index equals rebuilding from
    the union of all links — for both tf and the distinct-doc count
    (valid exactly because each doc's links live in one batch)."""
    from dlp_rdb_bq_import_spark.operators.urls import (
        anchor_text_index,
        merge_anchor_index,
    )

    rows = [
        (d, f"https://t{d % 2}.example.com/p", " ".join(["guide"] * (d % 3 + 1)))
        for d in range(1, 9)
    ] + [(d, "https://t0.example.com/p", "extra words") for d in (2, 4)]
    links = spark.createDataFrame(
        rows, "doc_id long, href string, anchor_text string"
    )
    full = anchor_text_index(links, "doc_id")
    standing = anchor_text_index(links.where("doc_id % 2 = 1"), "doc_id")
    batch = anchor_text_index(links.where("doc_id % 2 = 0"), "doc_id")
    merged = merge_anchor_index(standing, batch)
    key = lambda df: {
        (r.canon, r.token): (r.tf, r.n_docs) for r in df.collect()
    }
    assert key(merged) == key(full)


def test_robots_filter_rep_semantics(spark):
    """RFC 9309 planted semantics: longest matching prefix decides
    (allow /catalog/ loses to disallow /catalog/item/ on item pages,
    wins on other catalog pages); an equal-length allow/disallow pair
    resolves to allow; a host with rules but no matching prefix and a
    host with no rules at all both default to allowed; relative URLs
    drop; path matching includes the query string."""
    from dlp_rdb_bq_import_spark.operators.urls import robots_filter

    rules = spark.createDataFrame(
        [
            ("a.example.com", "/catalog/", True),
            ("a.example.com", "/catalog/item/", False),
            ("b.example.com", "/x", True),
            ("b.example.com", "/x", False),
            ("c.example.com", "/private", False),
        ],
        "host string, path_prefix string, allow boolean",
    )
    cands = spark.createDataFrame(
        [
            (1, "https://a.example.com/catalog/item/7"),
            (2, "https://a.example.com/catalog/specials"),
            (3, "https://b.example.com/x"),
            (4, "https://c.example.com/public/page"),
            (5, "https://d.example.com/anything"),
            (6, "/relative/path"),
            (7, "https://c.example.com/page?path=/private"),
            (8, "https://c.example.com/private?q=1"),
        ],
        "id long, url string",
    )
    got = {
        r.id: (r.allowed, r.rule)
        for r in robots_filter(cands, rules, "url", "id").collect()
    }
    assert got[1] == (False, "/catalog/item/")  # longest match wins
    assert got[2] == (True, "/catalog/")
    assert got[3] == (True, "/x")  # equal-length tie -> allow
    assert got[4] == (True, None)  # rules exist, none match
    assert got[5] == (True, None)  # no rules for host
    assert 6 not in got  # relative dropped
    assert got[7] == (True, None)  # /private inside query, not path start
    assert got[8] == (False, "/private")  # prefix match with query appended


def test_inclusion_dependencies_planted(spark):
    """FK discovery on hand tables: a true inclusion holds with full
    coverage; the reverse direction reports the exact unmatched count
    and fraction; NULLs on either side are excluded (SQL FK
    semantics); an empty LHS holds vacuously with coverage 1.0."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.profiling import (
        inclusion_dependencies,
    )

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (None,)], "fk int"
    )
    parent = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (None,)], "pk int"
    )
    empty = spark.createDataFrame([], "fk int")
    got = {
        (r.lhs, r.rhs): (r.n_lhs_distinct, r.n_unmatched, r.holds, r.coverage)
        for r in inclusion_dependencies(
            [
                ("child", child, "fk", "parent", parent, "pk"),
                ("parent", parent, "pk", "child", child, "fk"),
                ("empty", empty, "fk", "parent", parent, "pk"),
            ]
        ).collect()
    }
    assert got[("child.fk", "parent.pk")] == (2, 0, True, 1.0)
    assert got[("parent.pk", "child.fk")] == (4, 2, False, 0.5)
    assert got[("empty.fk", "parent.pk")] == (0, 0, True, 1.0)

    with _pytest.raises(ValueError):
        inclusion_dependencies([])


def test_group_quantiles_hand_case(spark):
    """Exact interpolated quantiles on a hand group: values 10..40,
    p50 = 25 (midpoint interpolation), p100 = max; NULL values are
    excluded from n and the quantile; guards reject empty group lists
    and out-of-range quantiles."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.profiling import group_quantiles

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0), ("a", None)],
        "g string, v double",
    )
    r = group_quantiles(df, "v", ["g"], quantiles=(0.5, 1.0)).first()
    assert (r.n, r.p50, r.p100) == (4, 25.0, 40.0)

    with _pytest.raises(ValueError):
        group_quantiles(df, "v", [])
    with _pytest.raises(ValueError):
        group_quantiles(df, "v", ["g"], quantiles=(1.5,))


def test_markup_normalizers_planted(spark):
    """Markdown/code normalization plants: fenced + inline code drop
    from prose (including a #-heading lookalike inside the fence, the
    outline must skip it too); links/images keep visible text; list/
    quote/rule/emphasis markers strip; code comments strip block-then-
    line with formatting-only variants mapping to one normal form."""
    from dlp_rdb_bq_import_spark.operators.markup import (
        code_normalize,
        markdown_outline,
        markdown_strip,
    )

    md = (
        "# Title\n"
        "intro [visible](http://x) and ![alt text](i.png) plus `rm -rf` span\n"
        "## Sub *sec*\n"
        "- bullet one\n"
        "2. numbered\n"
        "> quoted\n"
        "---\n"
        "```\n# fenced pseudo heading\ncode();\n```\n"
        "tail\n"
    )
    df = spark.createDataFrame([(1, md)], "doc_id long, md string")
    flat = df.select(markdown_strip(F.col("md")).alias("s")).first().s
    assert flat == (
        "Title intro visible and alt text plus span "
        "Sub sec bullet one numbered quoted tail"
    )
    heads = [
        (r.heading_ord, r.level, r.title)
        for r in markdown_outline(df, "md", "doc_id")
        .orderBy("heading_ord")
        .collect()
    ]
    assert heads == [(1, 1, "Title"), (2, 2, "Sub *sec*")]

    code_a = "/* c */\nint  f()   { // x\n  return 1; # y\n}\n"
    code_b = "int f() {\n\n\treturn 1;\n}"
    cdf = spark.createDataFrame(
        [(1, code_a), (2, code_b)], "doc_id long, src string"
    )
    out = {
        r.doc_id: r.n
        for r in cdf.select(
            "doc_id", code_normalize(F.col("src")).alias("n")
        ).collect()
    }
    assert out[1] == out[2] == "int f() { return 1; }"


def test_fd_discovery_planted(spark):
    """FD discovery on a hand table: a -> b holds exactly (every a
    value maps to one b), b -> a fails with the exact distinct-excess
    count, NULL determinant rows are excluded, NULL dependent values
    don't count as a distinct value, and guards reject short or
    duplicated column lists."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.profiling import fd_discovery

    rows = [
        (1, "x", 10),
        (1, "x", 11),
        (2, "y", 10),
        (3, "y", None),
        (None, "z", 12),  # NULL determinant: excluded from a-> groups
    ]
    df = spark.createDataFrame(rows, "a int, b string, c int")
    got = {
        (r.determinant, r.dependent): (
            r.n_groups,
            r.n_violations,
            r.holds,
        )
        for r in fd_discovery(df, ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")] == (3, 0, True)  # 1->x, 2->y, 3->y
    # b groups: x->{1}, y->{2,3}, z->{NULL a}; the all-NULL 'z' group
    # has COUNT(DISTINCT)=0 and clamps to 0 excess (never -1), so
    # exactly y's extra value counts
    assert got[("b", "a")] == (3, 1, False)
    # c=10 maps to a in {1,2}: c -> a fails with exactly 1 excess
    assert got[("c", "a")] == (3, 1, False)

    with _pytest.raises(ValueError):
        fd_discovery(df, ["a"])
    with _pytest.raises(ValueError):
        fd_discovery(df, ["a", "a"])

    # all-NULL determinant -> zero groups: vacuous hold, never
    # NULL/NaN outputs
    nulls = spark.createDataFrame([(None, 1), (None, 2)], "d int, x int")
    r = {
        (q.determinant, q.dependent): (
            q.n_groups, q.n_violations, q.holds, q.violation_rate
        )
        for q in fd_discovery(nulls, ["d", "x"]).collect()
    }
    assert r[("d", "x")] == (0, 0, True, 0.0)
    assert r[("x", "d")] == (2, 0, True, 0.0)  # d all-NULL: cd=0 clamps


def test_html_near_good_context_pass(spark):
    """jusText near-good smoothing: a SHORT prose block (passes both
    density gates but under min_words) flips to content when adjacent
    to an initially-good block, and stays boilerplate when surrounded
    by chrome. The planted block's only stopword is sentence-initial
    'The' — so the flip also proves stopword matching is
    case-insensitive (case-sensitive matching would classify it 'bad'
    at min_stop_density=0.02 and the context pass would never see
    it)."""
    from dlp_rdb_bq_import_spark.operators.html_extract import html_blocks

    rescued = (
        "<html><body>"
        "<p>the quick brown fox jumps over a lazy dog today</p>"
        "<p>The end game.</p>"
        "<footer>copyright 2026 example corp</footer></body></html>"
    )
    stranded = (
        '<html><body><nav><a href="/">home</a> <a href="/x">archive</a></nav>'
        "<p>The end game.</p>"
        "<footer>copyright 2026 example corp</footer></body></html>"
    )
    df = spark.createDataFrame(
        [(1, rescued), (2, stranded)], ["doc_id", "html"]
    )
    rows = html_blocks(
        df, "html", "doc_id",
        min_words=5, max_link_density=0.4, min_stop_density=0.02,
    ).collect()
    verdict = {(r.doc_id, r.text): r.verdict for r in rows}
    assert verdict[(1, "The end game.")] == "content"  # next to good prose
    assert verdict[(2, "The end game.")] == "boilerplate"  # chrome on both sides
    # the good neighbor itself is unaffected by the context pass
    assert verdict[(1, "the quick brown fox jumps over a lazy dog today")] == "content"
    # footers (zero stopwords) remain hard-bad and never rescue anyone
    assert verdict[(1, "copyright 2026 example corp")] == "boilerplate"


def test_repair_mojibake_planted(spark):
    """ftfy-style repair against planted corruptions: single CP1252
    and Latin-1 mojibake repair in one pass, double-encoded text needs
    two; legitimate accents, curly quotes, CJK, plain ASCII, and a
    MIXED string (mojibake next to a >U+00FF char) all pass through
    untouched — the conservative whole-string acceptance contract."""
    from dlp_rdb_bq_import_spark.operators.text import repair_mojibake

    import pytest as _pytest

    single = "café — naïve".encode("utf-8").decode("cp1252")
    single_l1 = "café".encode("utf-8").decode("latin-1")
    double = (
        "déjà vu".encode("utf-8").decode("latin-1").encode("utf-8").decode("cp1252")
    )
    mixed = single + " 日本語"  # legit CJK blocks the whole-string gate
    rows = [
        (0, single, "café — naïve"),
        (1, single_l1, "café"),
        (2, double, "déjà vu"),
        (3, "plain ascii", "plain ascii"),
        (4, "déjà vu legit", "déjà vu legit"),
        (5, "don’t touch", "don’t touch"),
        (6, "日本語 text", "日本語 text"),
        (7, "", ""),
        (8, mixed, mixed),
    ]
    df = spark.createDataFrame([(i, s) for i, s, _ in rows], ["i", "s"])
    got = {
        r.i: r.r
        for r in df.select("i", repair_mojibake(F.col("s")).alias("r")).collect()
    }
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)

    # one pass fixes single but NOT double corruption
    got1 = {
        r.i: r.r
        for r in df.select(
            "i", repair_mojibake(F.col("s"), passes=1).alias("r")
        ).collect()
    }
    assert got1[0] == "café — naïve"
    assert got1[2] == "déjà vu".encode("utf-8").decode("latin-1")
    with _pytest.raises(ValueError, match="passes"):
        repair_mojibake(F.col("s"), passes=0)


def test_scrub_pii_planted(spark):
    """PII redaction against planted text: every type replaced by its
    typed placeholder with exact counts; cascade order prevents
    double-counting (an email's digits are not a phone, a 16-digit
    card is consumed before the 3-3-4 phone pattern could fire inside
    it); clean text untouched with zero counts; a type subset scrubs
    only those types; bad type names fail loudly."""
    from dlp_rdb_bq_import_spark.operators.privacy import scrub_pii

    import pytest as _pytest

    rows = [
        (1, "write to a.b+c@ex-mail.co.uk and b@x.io today"),
        (2, "phone 555-867-5309 or 416.555.0199 or 555 123 4567"),
        (3, "card 4111-1111-1111-1111 and ip 10.0.255.1"),
        (4, "ssn 078-05-1120 inside text"),
        (5, "totally clean text with numbers 12345 and 3.14"),
        (6, "mixed: u@v.com 1.2.3.4 4111 1111 1111 1111 078-05-1120 555-123-4567"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in scrub_pii(df, "text").collect()}

    assert got[1].text == "write to [EMAIL_ADDRESS] and [EMAIL_ADDRESS] today"
    assert (got[1].n_email_address, got[1].n_pii) == (2, 2)
    assert got[2].text == "phone [PHONE_NUMBER] or [PHONE_NUMBER] or [PHONE_NUMBER]"
    assert got[2].n_phone_number == 3
    assert got[3].text == "card [CREDIT_CARD] and ip [IPV4_ADDRESS]"
    assert (got[3].n_credit_card, got[3].n_ipv4_address, got[3].n_phone_number) == (
        1, 1, 0,
    )
    assert got[4].text == "ssn [SSN_US] inside text"
    assert got[5].text == rows[4][1] and got[5].n_pii == 0
    assert got[6].text == (
        "mixed: [EMAIL_ADDRESS] [IPV4_ADDRESS] [CREDIT_CARD] [SSN_US] "
        "[PHONE_NUMBER]"
    )
    assert got[6].n_pii == 5

    only_email = {
        r.doc_id: r for r in scrub_pii(df, "text", ("EMAIL_ADDRESS",)).collect()
    }
    assert "555-867-5309" in only_email[2].text
    assert only_email[1].text == got[1].text
    with _pytest.raises(ValueError, match="subset"):
        scrub_pii(df, "text", ("EMAIL_ADDRESS", "PASSPORT"))
    with _pytest.raises(ValueError, match="subset"):
        scrub_pii(df, "text", ())


def test_url_canonicalize_hand_cases(spark):
    """URL canonicalization against hand-derived forms: case folding,
    default-port strip (http:80 / https:443 only — a real :8080
    survives), leading-www strip only, trailing-slash collapse with
    '' -> '/', fragment drop, tracking-param strip with param sort,
    registered-domain extraction, path depth; dedup groups cosmetic
    variants under one canonical form."""
    from dlp_rdb_bq_import_spark.operators.urls import (
        canonicalize_url,
        dedup_by_canonical_url,
    )

    cases = [
        (1, "HTTP://WWW.Example.COM:80/"),
        (2, "http://example.com"),
        (3, "https://Sub.Example.com:443/a/b//"),
        (4, "https://example.com:8443/a"),
        (5, "https://example.com/p?utm_source=x&ref=abc&fbclid=1"),
        (6, "https://example.com/p?b=2&a=1&utm_medium=m#frag"),
        (7, "https://example.com/p?a=1&b=2"),
        (8, "https://wwwx.example.com/q"),
    ]
    df = spark.createDataFrame(cases, ["id", "url"])
    c = canonicalize_url(F.col("url"))
    got = {
        r.id: (r.canon, r.host, r.domain, r.path_depth)
        for r in df.select(
            "id", c["canon"].alias("canon"), c["host"].alias("host"),
            c["domain"].alias("domain"), c["path_depth"].alias("path_depth"),
        ).collect()
    }
    assert got[1] == ("http://example.com/", "example.com", "example.com", 0)
    assert got[2] == ("http://example.com/", "example.com", "example.com", 0)
    assert got[3] == ("https://sub.example.com/a/b", "sub.example.com", "example.com", 2)
    assert got[4][0] == "https://example.com:8443/a"  # non-default port kept
    assert got[5][0] == "https://example.com/p"       # all params were tracking
    assert got[6][0] == "https://example.com/p?a=1&b=2"  # sorted, frag gone
    assert got[7][0] == "https://example.com/p?a=1&b=2"
    assert got[8][1] == "wwwx.example.com"  # only a leading 'www.' strips

    groups = {
        r.canon: (r.n_dupes, r.first_id)
        for r in dedup_by_canonical_url(df, "url", "id").collect()
    }
    assert groups["http://example.com/"] == (2, 1)
    assert groups["https://example.com/p?a=1&b=2"] == (2, 6)
    assert groups["https://example.com/p"] == (1, 5)


def test_web_curation_pipeline_stages(spark):
    """The composed web path drops each planted row at exactly its
    stage: the duplicate plant (doc 100001, same text as doc 1) is
    removed by the fingerprint stage with the ORIGINAL kept; survivors
    carry quality >= the gate; every surviving fingerprint is
    unique."""
    from dlp_rdb_bq_import_spark import harness

    rows = harness.queries()["web_curation_pipeline"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    ids = {r.doc_id for r in rows}
    assert 1 in ids and 100001 not in ids  # plant lost to its original
    assert all(r.quality >= 0.55 for r in rows)
    fps = [r.fingerprint for r in rows]
    assert len(fps) == len(set(fps))
    assert rows  # the pipeline keeps a real survivor set


def test_frontier_next_batch_hand_cases(spark):
    """Crawl frontier: already-fetched canonical forms are excluded,
    duplicate discoveries collapse to their lowest id, and the
    per-host politeness cap keeps the lowest-id slots; bad inputs
    fail loudly."""
    from dlp_rdb_bq_import_spark.operators.urls import frontier_next_batch

    import pytest as _pytest

    cand = spark.createDataFrame(
        [
            (1, "https://a.com/p1"),
            (2, "https://WWW.A.com/p1/"),   # duplicate discovery of p1
            (3, "https://a.com/p2"),
            (4, "https://a.com/p3"),
            (5, "https://a.com/p4"),        # over the cap for host a.com
            (6, "https://b.com/q1"),
            (7, "https://b.com/q2"),        # q2 already fetched
        ],
        ["id", "url"],
    )
    seen = spark.createDataFrame(
        [("https://b.com/q2",)], ["canon"]
    )
    got = {
        (r.host, r.rk): (r.id, r.canon)
        for r in frontier_next_batch(cand, seen, "url", "id", per_host_cap=3).collect()
    }
    assert got[("a.com", 1)] == (1, "https://a.com/p1")  # dup collapsed to id 1
    assert got[("a.com", 2)] == (3, "https://a.com/p2")
    assert got[("a.com", 3)] == (4, "https://a.com/p3")
    assert ("a.com", 4) not in got                       # capped
    assert got[("b.com", 1)] == (6, "https://b.com/q1")  # q2 excluded as seen
    assert len(got) == 4
    with _pytest.raises(ValueError, match="per_host_cap"):
        frontier_next_batch(cand, seen, "url", "id", per_host_cap=0)
    with _pytest.raises(ValueError, match="canon"):
        frontier_next_batch(cand, seen.withColumnRenamed("canon", "u"), "url", "id")


def test_embedding_group_outliers_numpy_parity(spark):
    """Centroid-cosine outliers vs a numpy re-computation on the
    quantized vectors: same scores (1e-6 — both sides are exact
    integer sums feeding one double expression), same bottom-k
    ordering; a planted far vector ranks first in its group."""
    import numpy as np

    from dlp_rdb_bq_import_spark.operators.similarity import (
        QUANT_SCALE,
        embedding_group_outliers,
    )

    rng = np.random.default_rng(7)
    vecs = {}
    rows = []
    for vid in range(40):
        lbl = vid % 2
        v = rng.normal(size=8) + (5.0 if lbl else -5.0)
        rows.append((vid, [float(x) for x in v], lbl))
        vecs[vid] = (lbl, v)
    # plant: a vector pointing AWAY from group 0's center
    rows.append((999, [float(x) for x in (np.ones(8) * 50.0)], 0))
    vecs[999] = (0, np.ones(8) * 50.0)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    got = {
        r.vec_id: (r.label, r.centroid_cosine, r.rk)
        for r in embedding_group_outliers(df, k=5).collect()
    }
    # numpy reference on the same quantization
    q = {
        vid: np.round(np.array(v, dtype=np.float32).astype(np.float64) * QUANT_SCALE)
        for vid, (_, v) in vecs.items()
    }
    for lbl in (0, 1):
        ids = [vid for vid, (l, _) in vecs.items() if l == lbl]
        S = np.sum([q[i] for i in ids], axis=0)
        cos = {
            i: float(q[i] @ S / (np.linalg.norm(q[i]) * np.linalg.norm(S)))
            for i in ids
        }
        order = sorted(ids, key=lambda i: (cos[i], i))[:5]
        got_order = sorted(
            [vid for vid, (l, _, _) in got.items() if l == lbl],
            key=lambda vid: got[vid][2],
        )
        assert got_order == order
        for i in order:
            assert abs(got[i][1] - round(cos[i], 9)) < 1e-6
    assert got[999][2] == 1  # the planted far vector is its group's top outlier


def test_rake_keywords_hand_computed(spark):
    """RAKE against hand arithmetic on the canonical toy: phrases
    split at stopwords, word score = degree/frequency over ALL phrase
    occurrences, repeated phrases score once but weigh the stats,
    top-k caps per doc with phrase-string tie-break, and guards fire
    on empty stopwords / bad k / non-token stopwords."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.text import rake_keywords

    # phrases: "deep learning" x2, "learning rate", "decay"
    text = "deep learning and learning rate of decay and deep learning"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = {
        r.phrase: (r.n_words, r.score, r.rk)
        for r in rake_keywords(df, ["and", "of"], k=10).collect()
    }
    # freq: deep 2, learning 3, rate 1, decay 1
    # deg:  deep 2+2=4, learning 2+2+2=6, rate 2, decay 1
    s_deep, s_learning, s_rate, s_decay = 4 / 2, 6 / 3, 2 / 1, 1 / 1
    assert out["deep learning"] == (2, round(s_deep + s_learning, 9), 1)
    assert out["learning rate"] == (2, round(s_learning + s_rate, 9), 2)
    assert out["decay"] == (1, 1.0, 3)
    assert len(out) == 3  # duplicate "deep learning" emitted once

    top1 = rake_keywords(df, ["and", "of"], k=1)
    assert [r.phrase for r in top1.collect()] == ["deep learning"]

    with _pytest.raises(ValueError, match="non-empty"):
        rake_keywords(df, [])
    with _pytest.raises(ValueError, match="k must be"):
        rake_keywords(df, ["and"], k=0)
    with _pytest.raises(ValueError, match="plain tokens"):
        rake_keywords(df, ["a|b"])


def test_char_entropy_hand_computed(spark):
    """Character entropy against hand arithmetic: uniform 2-char and
    4-char alphabets give exactly 1 and 2 bits, single-char text gives
    +0.0 (the -0.0 IEEE case normalized), empty text 0.0, a 3:1 skew
    matches the closed form, and the plan stays exchange-free."""
    import math

    from dlp_rdb_bq_import_spark.operators.text import char_entropy_scores

    df = spark.createDataFrame(
        [
            (1, "aabb"),
            (2, "abcd"),
            (3, "aaaa"),
            (4, ""),
            (5, "aaab"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in char_entropy_scores(df).collect()}
    assert (out[1].entropy, out[1].n_distinct_chars, out[1].n_chars) == (1.0, 2, 4)
    assert out[2].entropy == 2.0
    assert out[3].entropy == 0.0 and math.copysign(1.0, out[3].entropy) == 1.0
    assert (out[4].entropy, out[4].n_distinct_chars) == (0.0, 0)
    expect5 = round(-(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25)), 9)
    assert out[5].entropy == expect5
    plan = (
        char_entropy_scores(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_token_budget_sample_semantics(spark):
    """Budget-bounded mixture: per-group kept cost reaches at least
    the budget whenever the group has that much supply (the crossing
    row is included), selection is the deterministic hash order
    (repartitioning changes nothing), unbudgeted groups drop unless a
    default budget is given, and bad inputs fail loudly."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.sampling import token_budget_sample

    rows = [(i, "a" if i % 2 == 0 else "b", 10 + (i % 7)) for i in range(200)]
    rows += [(1000 + i, "tiny", 5) for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "cost"])
    budgets = {"a": 300, "b": 150, "tiny": 10_000}

    out = token_budget_sample(df, "doc_id", "grp", "cost", budgets)
    got = out.groupBy("grp").agg(
        F.sum("cost").alias("kept"), F.count(F.lit(1)).alias("n")
    )
    kept = {r.grp: r.kept for r in got.collect()}
    # crossing row included -> kept >= budget (supply allows for a, b)
    assert kept["a"] >= 300 and kept["b"] >= 150
    # and no more than budget + one max-cost row
    assert kept["a"] < 300 + 17 and kept["b"] < 150 + 17
    # under-supplied group keeps everything
    assert kept["tiny"] == 15

    # determinism under repartition
    again = token_budget_sample(
        df.repartition(7, "cost"), "doc_id", "grp", "cost", budgets
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))

    # unbudgeted group drops; default_budget revives it
    no_tiny = token_budget_sample(
        df, "doc_id", "grp", "cost", {"a": 300, "b": 150}
    )
    assert no_tiny.where(F.col("grp") == "tiny").count() == 0
    dflt = token_budget_sample(
        df, "doc_id", "grp", "cost", {"a": 300}, default_budget=150
    )
    assert dflt.where(F.col("grp") == "tiny").count() == 3
    assert dflt.where(F.col("grp") == "b").count() > 0

    with _pytest.raises(ValueError, match="non-empty"):
        token_budget_sample(df, "doc_id", "grp", "cost", {})
    with _pytest.raises(ValueError, match="negative budget"):
        token_budget_sample(df, "doc_id", "grp", "cost", {"a": -1})


def test_temperature_mixture_hand_computed(spark):
    """Temperature weights at α=0.5 equal hand arithmetic (rate =
    sqrt(n_min/n_s), smallest source keeps rate 1.0); α=1 is the
    proportional no-op; the sampler applies exactly those rates via
    the hash predicate; invalid α fails loudly."""
    import math

    from dlp_rdb_bq_import_spark.operators.sampling import (
        hash_uniform,
        temperature_mixture_sample,
        temperature_weights,
    )

    import pytest as _pytest

    rows = [(i, "big" if i < 400 else ("mid" if i < 500 else "small"))
            for i in range(525)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    w = {r.source: (r.n_docs, r.rate)
         for r in temperature_weights(df, "source", alpha=0.5).collect()}
    assert w["small"] == (25, 1.0)
    assert w["mid"] == (100, 0.5)
    assert w["big"] == (400, round(math.sqrt(25 / 400), 9))

    w1 = {r.source: r.rate
          for r in temperature_weights(df, "source", alpha=1.0).collect()}
    assert set(w1.values()) == {1.0}

    kept = temperature_mixture_sample(df, "doc_id", "source", alpha=0.5)
    # the sampler's kept set is exactly the hash-predicate set per rate
    want = {
        r.doc_id
        for r in df.withColumn("u", hash_uniform(F.col("doc_id")))
        .collect()
        if r.u < w[r.source][1]
    }
    assert {r.doc_id for r in kept.collect()} == want
    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights(df, "source", alpha=0.0)
    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights(df, "source", alpha=1.5)


def test_leakage_safe_split_neardup_families(spark):
    """The near-dup-aware split never separates a duplicate family:
    over a MinHash pair graph with planted near-dup chains, every pair
    (and every transitive family) lands in one split; docs outside the
    graph split exactly as the plain per-doc hash split would."""
    from dlp_rdb_bq_import_spark.harness import t
    from dlp_rdb_bq_import_spark.operators import dedup
    from dlp_rdb_bq_import_spark.operators.sampling import (
        leakage_safe_split,
        train_val_test_split,
    )

    d = t(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 150
    ).select("doc_id", "text")
    # chain plant: 800001 copies doc 3; 800002 edits 800001's tail —
    # a~b and b~c without a direct a~c edge
    c1 = d.where(F.col("doc_id") == 3).withColumn("doc_id", F.lit(800001).cast("long"))
    c2 = c1.withColumn("doc_id", F.lit(800002).cast("long")).withColumn(
        "text", F.concat(F.col("text"), F.lit(" tail edit"))
    )
    src = d.unionByName(c1).unionByName(c2)
    pairs = dedup.minhash_dedup_pairs(
        src, "text", "doc_id", threshold=0.3, bands=16,
        num_hashes=64, shingle_n=3, shingle_unit="word",
    ).select("id_a", "id_b")
    out = leakage_safe_split(src.select("doc_id"), pairs, "doc_id")
    split_of = {r.doc_id: (r.cluster_id, r.split) for r in out.collect()}
    # every pair agrees on split AND cluster
    for r in pairs.collect():
        assert split_of[r.id_a][1] == split_of[r.id_b][1]
    # the planted chain is one family in one split
    assert split_of[3] == split_of[800001] == split_of[800002]
    # graph-free docs match the plain split
    paired = {r.id_a for r in pairs.collect()} | {r.id_b for r in pairs.collect()}
    plain = {
        r.doc_id: r.split
        for r in train_val_test_split(src.select("doc_id"), "doc_id").collect()
    }
    for did, (cid, sp) in split_of.items():
        if did not in paired:
            assert cid == did and sp == plain[did]


def test_deterministic_shuffle_properties(spark):
    """Shuffle positions are a dense permutation of 0..n-1, identical
    across partitionings, different under a different seed, and not
    the identity ordering."""
    from dlp_rdb_bq_import_spark.operators.layout import deterministic_shuffle

    df = spark.range(300).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.shuffle_pos
         for r in deterministic_shuffle(df, "doc_id", seed="s1").collect()}
    assert sorted(a.values()) == list(range(300))
    b = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(
            df.repartition(7), "doc_id", seed="s1", num_partitions=5
        ).collect()
    }
    assert a == b  # partitioning-independent
    c = {r.doc_id: r.shuffle_pos
         for r in deterministic_shuffle(df, "doc_id", seed="s2").collect()}
    assert a != c  # a new seed is a new permutation
    assert [a[i] for i in range(300)] != list(range(300))  # actually shuffled

    import pytest as _pytest

    with _pytest.raises(ValueError, match="_shufkey"):
        deterministic_shuffle(
            df.withColumn("_shufkey", F.lit(1)), "doc_id"
        )


def test_dedup_keep_best_minhash_family(spark):
    """Quality-aware keeper over a MinHash pair graph: the
    higher-score copy of a near-dup family survives (not the lowest
    id), ties fall back to lowest id, singletons pass through."""
    from dlp_rdb_bq_import_spark.harness import t
    from dlp_rdb_bq_import_spark.operators import dedup

    d = t(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 100
    ).select("doc_id", "text")
    longer = d.where(F.col("doc_id") == 3).select(
        F.lit(700001).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" richer longer surviving copy")).alias("text"),
    )
    src = d.unionByName(longer).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    pairs = dedup.minhash_dedup_pairs(
        src, "text", "doc_id", threshold=0.3, bands=16,
        num_hashes=64, shingle_n=3, shingle_unit="word",
    ).select("id_a", "id_b")
    edge_list = [(r.id_a, r.id_b) for r in pairs.collect()]
    assert (3, 700001) in edge_list  # the plant is a family
    kept = {r.doc_id for r in dedup.dedup_keep_best(
        src.select("doc_id", "n_chars"), pairs, "doc_id", "n_chars"
    ).collect()}
    assert 700001 in kept and 3 not in kept  # best copy wins over lower id

    # independent union-find reference over ALL fixture families
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a2, b2 in edge_list:
        ra, rb = find(a2), find(b2)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    scores = {r.doc_id: r.n_chars for r in src.select("doc_id", "n_chars").collect()}
    families = {}
    for did in scores:
        families.setdefault(find(did), []).append(did)
    want = {
        min(members, key=lambda i: (-scores[i], i))
        for members in families.values()
    }
    assert kept == want

    # tie on score -> lowest id (matches dedup_keep_representative)
    tie = spark.createDataFrame([(1, 5), (2, 5), (9, 7)], ["doc_id", "s"])
    tp = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    assert {r.doc_id for r in dedup.dedup_keep_best(tie, tp, "doc_id", "s").collect()} == {1, 9}


def test_compression_ratio_scores(spark):
    """Compression ratios pin against direct zlib calls row by row;
    repetitive text scores far below prose; empty text takes the 1.0
    convention; invalid level fails loudly."""
    import zlib

    from dlp_rdb_bq_import_spark.operators.text import compression_ratio_scores

    import pytest as _pytest

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and keeps going"),
        (2, "spam " * 200),
        (3, ""),
        (4, "a"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in compression_ratio_scores(df, "text", "doc_id").collect()}
    for did, txt in rows:
        raw = txt.encode("utf-8")
        assert got[did].n_bytes == len(raw)
        assert got[did].n_compressed == len(zlib.compress(raw, 6))
        want = 1.0 if not raw else round(len(zlib.compress(raw, 6)) / len(raw), 9)
        assert got[did].ratio == want
    assert got[2].ratio < 0.1 < got[1].ratio  # repetition compresses away
    with _pytest.raises(ValueError, match="level"):
        compression_ratio_scores(df, "text", "doc_id", level=0)


# ---------------------------------------------------------------------------
# round 8: Naive Bayes classifier / semantic decontam / cluster-balanced sample
# ---------------------------------------------------------------------------


def test_nb_classify_hand_computed(spark):
    """NB scores equal an independent pure-Python computation of the
    same micro-log closed form, and the argmax pick (with label-asc
    tie-break) matches."""
    import math

    from dlp_rdb_bq_import_spark.operators.classify import nb_classify, nb_scores, nb_train

    train = spark.createDataFrame(
        [
            (1, "en", "the cat sat"),
            (2, "en", "the dog sat"),
            (3, "fr", "le chat noir"),
            (4, "fr", "le chien noir"),
        ],
        "doc_id long, lang string, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the chat sat"), (11, "le le noir")],
        "doc_id long, text string",
    )
    model = nb_train(train, "lang", "text")
    got = {
        (r["doc_id"], r["label"]): (r["n_tokens"], r["score_micro"])
        for r in nb_scores(batch, model).collect()
    }

    # independent reference
    k = 0.5
    counts: dict[tuple[str, str], int] = {}
    docs_l = {"en": 2, "fr": 2}
    for _, lab, txt in train.collect():
        for w in txt.split(" "):
            if w:
                counts[(lab, w)] = counts.get((lab, w), 0) + 1
    vocab = {w for (_, w) in counts}
    v = len(vocab)
    cl = {lab: sum(c for (l2, c) in ((l3, c3) for (l3, w3), c3 in counts.items() if l3 == lab)) for lab in docs_l}
    mic = lambda x: round(math.log(x) * 1e6)
    for doc_id, txt in [(10, "the chat sat"), (11, "le le noir")]:
        toks = [w for w in txt.split(" ") if w]
        for lab in docs_l:
            hits = [counts[(lab, w)] for w in toks if (lab, w) in counts]
            score = (
                sum(mic(c + k) for c in hits)
                + (len(toks) - len(hits)) * mic(k)
                - len(toks) * mic(cl[lab] + k * v)
                + mic(docs_l[lab] / sum(docs_l.values()))
            )
            assert got[(doc_id, lab)] == (len(toks), score), (doc_id, lab)

    pred = {r["doc_id"]: r["label"] for r in nb_classify(batch, model).collect()}
    assert pred == {10: "en", 11: "fr"}


def test_nb_merge_and_edge_cases(spark):
    """merge(train(A), train(B)) ≡ train(A ∪ B) exactly (both row
    kinds); zero-token docs count toward the prior but are omitted
    from scoring; all-unseen batches fall back to prior + floor."""
    from dlp_rdb_bq_import_spark.operators.classify import (
        merge_nb_model,
        nb_classify,
        nb_train,
    )

    a = spark.createDataFrame(
        [(1, "x", "aa bb"), (2, "y", "cc")], "doc_id long, lang string, text string"
    )
    b = spark.createDataFrame(
        [(3, "x", "aa dd"), (4, "y", "")], "doc_id long, lang string, text string"
    )
    merged = merge_nb_model(
        nb_train(a, "lang", "text"), nb_train(b, "lang", "text")
    )
    full = nb_train(a.unionByName(b), "lang", "text")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # doc 4 (empty text) contributed to y's prior
    assert {(r["label"], r["c"]) for r in full.where("token = ''").collect()} == {
        ("x", 2),
        ("y", 2),
    }

    batch = spark.createDataFrame(
        [(10, "zz qq"), (11, "")], "doc_id long, text string"
    )
    out = nb_classify(batch, full).collect()
    # empty doc omitted; unseen doc still classified (priors tie 2:2 →
    # per-token floor differs only via C_l; x has more token mass → lower
    # per-token prob; y wins)
    assert {r["doc_id"] for r in out} == {10}
    assert out[0]["label"] == "y"


def test_semantic_contamination_paths(spark):
    """Planted paraphrase-contamination: the broadcast exact path flags
    exactly the planted train vectors; the LSH path finds the same
    high-cosine pairs (its operating regime); decontaminate removes
    flagged rows only."""
    import numpy as np

    from dlp_rdb_bq_import_spark.operators.similarity import (
        semantic_contamination_pairs,
        semantic_contamination_pairs_lsh,
        semantic_decontaminate,
    )

    rng = np.random.default_rng(7)
    dim = 16
    bench_vecs = rng.normal(size=(3, dim))
    rows_b = [(100 + i, [float(x) for x in v]) for i, v in enumerate(bench_vecs)]
    # two contaminated train vectors = bench + tiny noise; 20 random clean
    cont = [
        (i, [float(x) for x in bench_vecs[i] + rng.normal(scale=0.01, size=dim)])
        for i in range(2)
    ]
    clean = [(10 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(20)]
    train = spark.createDataFrame(cont + clean, "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(rows_b, "vec_id long, embedding array<float>")

    exact = semantic_contamination_pairs(train, bench, threshold=0.9)
    got = {(r["train_id"], r["bench_id"]) for r in exact.collect()}
    assert got == {(0, 100), (1, 101)}

    lsh = semantic_contamination_pairs_lsh(train, bench, threshold=0.9)
    assert {(r["train_id"], r["bench_id"]) for r in lsh.collect()} == got
    # precision 1.0 by construction: lsh output ⊆ exact (both verified)

    kept = semantic_decontaminate(train, bench, threshold=0.9)
    assert {r["vec_id"] for r in kept.collect()} == {10 + i for i in range(20)}


def test_cluster_balanced_sample_properties(spark):
    """Per-cell counts never exceed cap; every vector's cell is its
    true nearest center (numpy recompute over the same quantized
    integers); kept vectors are the closest-cap of their cell."""
    import numpy as np

    from dlp_rdb_bq_import_spark.operators.sampling import cluster_balanced_sample
    from dlp_rdb_bq_import_spark.operators.similarity import kcenter_sample

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(120, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    k, cap = 5, 10
    out = cluster_balanced_sample(df, k=k, cap=cap).collect()
    per_cell: dict[int, list] = {}
    for r in out:
        per_cell.setdefault(r["cell"], []).append(r)
    assert all(len(v) <= cap for v in per_cell.values())
    assert len(per_cell) == k

    centers = {r["pick_order"]: r["vec_id"] for r in kcenter_sample(df, k=k).collect()}
    # mirror the engine exactly: values are stored float32, quantization
    # rounds HALF AWAY FROM ZERO (Spark round), not numpy's banker's round
    v64 = vecs.astype(np.float32).astype(np.float64) * 1e7
    q = (np.sign(v64) * np.floor(np.abs(v64) + 0.5)).astype(np.int64)
    cent = np.stack([q[centers[p]] for p in sorted(centers)])  # cell order 1..k
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    nearest = d2.argmin(axis=1) + 1  # ties: argmin picks lowest index = lowest cell
    for r in out:
        assert nearest[r["vec_id"]] == r["cell"]
        assert d2[r["vec_id"], r["cell"] - 1] == r["dist2"]
    # closest-cap: no unkept member of a cell is strictly closer than a kept one
    kept_ids = {r["vec_id"] for r in out}
    for vid in range(120):
        if vid in kept_ids:
            continue
        cell = nearest[vid]
        kept_cell = [r for r in out if r["cell"] == cell]
        if len(kept_cell) < cap:
            continue  # cell not full — vid must be in it, contradiction
        worst_kept = max((r["dist2"], r["vec_id"]) for r in kept_cell)
        assert (d2[vid, cell - 1], vid) > worst_kept


def test_dsir_selection_semantics(spark):
    """DSIR importance weights favor documents drawn from the target
    domain's vocabulary: merge ≡ fit-on-union; target-vocabulary docs
    outscore off-domain docs; Gumbel-top-k is deterministic and ranks
    by the perturbed key."""
    from dlp_rdb_bq_import_spark.operators.dsir import (
        dsir_bucket_weights,
        dsir_feature_counts,
        dsir_scores,
        dsir_select,
        merge_feature_counts,
    )

    tgt_rows = [(i, "alpha beta gamma delta " * 3) for i in range(10)]
    raw_rows = [(100 + i, "one two three four five six " * 3) for i in range(20)]
    target = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows + tgt_rows[:2], "doc_id long, text string")

    # merge contract
    m = merge_feature_counts(
        dsir_feature_counts(target.where("doc_id < 5")),
        dsir_feature_counts(target.where("doc_id >= 5")),
    )
    full = dsir_feature_counts(target)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, full.collect()))

    w = dsir_bucket_weights(dsir_feature_counts(target), dsir_feature_counts(raw))
    batch = spark.createDataFrame(
        [(200, "alpha beta gamma delta"), (201, "one two three four")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["weight_micro"] / r["n_feats"] for r in
         dsir_scores(batch, w).collect()}
    assert s[200] > 0 > s[201]  # target-like up-weighted, raw-like down

    sel = dsir_select(batch, w, k=2)
    rows = sel.collect()
    assert [r["rank"] for r in rows] == [1, 2]
    again = {(r["doc_id"], r["key_micro"]) for r in dsir_select(batch, w, k=2).collect()}
    assert {(r["doc_id"], r["key_micro"]) for r in rows} == again  # deterministic


def test_blocklist_filter_semantics(spark):
    """Gate contract: density threshold honored, matching is exact
    whole-token case-insensitive (no substring hits), zero-token docs
    are kept, zero-hit docs carry 0/0.0 in the report."""
    from dlp_rdb_bq_import_spark.operators.text import blocklist_filter, blocklist_hits

    docs = spark.createDataFrame(
        [
            (1, "bad word here"),          # 1/3 hits -> flagged at 0.1
            (2, "clean text only"),         # 0 hits
            (3, "BAD upper case"),          # case-insensitive hit
            (4, "badge is not bad-word"),   # substring must NOT match
            (5, ""),                        # zero tokens -> kept
            (6, "one bad in ten tokens a b c d e"),  # 1/10 = 0.1 -> kept at 0.1
        ],
        "doc_id long, text string",
    )
    terms = spark.createDataFrame([("bad",), ("evil",)], "term string")
    rep = {r["doc_id"]: r for r in blocklist_hits(docs, terms).collect()}
    assert rep[1]["n_hits"] == 1 and abs(rep[1]["hit_fraction"] - 1 / 3) < 1e-9
    assert rep[2]["n_hits"] == 0 and rep[2]["hit_fraction"] == 0.0
    assert rep[3]["n_hits"] == 1
    assert rep[4]["n_hits"] == 0  # 'badge' and 'bad-word' are not 'bad'
    assert 5 not in rep  # zero tokens -> no report row
    assert rep[6]["n_hits"] == 1 and rep[6]["hit_fraction"] == 0.1

    kept = {r["doc_id"] for r in blocklist_filter(docs, terms, max_fraction=0.1).collect()}
    assert kept == {2, 4, 5, 6}
    strict = {r["doc_id"] for r in blocklist_filter(docs, terms, max_fraction=0.0).collect()}
    assert strict == {2, 4, 5}


def test_cms_properties_and_streaming_fold(spark):
    """CMS guarantees: estimate >= true count for every value;
    merge ≡ build-on-union exactly; the streaming fold equals one
    batch build over everything seen; depth/width sanity guards."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.profiling import (
        cms_build,
        cms_estimate,
        merge_cms,
    )
    from dlp_rdb_bq_import_spark.streaming.jobs import streaming_cms

    rows = [(w,) for w, n in [("a", 50), ("b", 20), ("c", 5), ("d", 1)] for _ in range(n)]
    df = spark.createDataFrame(rows, "w string")
    sk = cms_build(df, "w", depth=4, width=64)
    est = {r["value"]: r["est"] for r in cms_estimate(df, sk, "w", depth=4, width=64).collect()}
    true = {"a": 50, "b": 20, "c": 5, "d": 1}
    for v, n in true.items():
        assert est[v] >= n  # never underestimates
    assert est["a"] >= 50 and est["a"] <= 76  # total mass bounds any bucket

    half_a = spark.createDataFrame(rows[:38], "w string")
    half_b = spark.createDataFrame(rows[38:], "w string")
    merged = merge_cms(
        cms_build(half_a, "w", depth=4, width=64),
        cms_build(half_b, "w", depth=4, width=64),
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sk.collect()))

    folded = streaming_cms(spark, df, "w", depth=4, width=64)
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, sk.collect()))

    with _pytest.raises(ValueError):
        cms_build(df, "w", depth=0)
    with _pytest.raises(ValueError):
        cms_estimate(df, sk, "w", width=1)


def test_ab_test_ztest_hand_computed(spark):
    """Two-proportion z-test against hand arithmetic: counts, rates
    and the pooled-variance z match the closed form; degenerate pools
    (all-success) and an empty arm yield z = 0 / not significant
    instead of NaN; rows outside the two arms are ignored; identical
    arm names fail loudly."""
    import math

    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.profiling import ab_test_ztest

    rows = (
        [("control", 1)] * 30 + [("control", 0)] * 70
        + [("treatment", 1)] * 45 + [("treatment", 0)] * 55
        + [("holdout", 1)] * 10  # ignored third arm
    )
    df = spark.createDataFrame(rows, ["arm", "converted"])
    r = ab_test_ztest(df, "arm", "converted", "control", "treatment").first()
    assert (r.n_c, r.x_c, r.n_t, r.x_t) == (100, 30, 100, 45)
    assert (r.rate_c, r.rate_t) == (0.3, 0.45)
    pool = 75 / 200
    z = (0.45 - 0.3) / math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert r.z_score == round(z, 9)
    assert bool(r.significant) is (abs(z) > 1.959963985)

    # degenerate: every unit converts -> se = 0 -> z = 0, not significant
    allwin = spark.createDataFrame(
        [("control", 1)] * 5 + [("treatment", 1)] * 5, ["arm", "converted"]
    )
    d = ab_test_ztest(allwin, "arm", "converted", "control", "treatment").first()
    assert d.z_score == 0.0 and bool(d.significant) is False

    # empty treatment arm: z 0, not significant, its rate honest NULL
    onearm = spark.createDataFrame([("control", 1)] * 3, ["arm", "converted"])
    e = ab_test_ztest(onearm, "arm", "converted", "control", "treatment").first()
    assert e.n_t == 0 and e.z_score == 0.0 and bool(e.significant) is False
    assert e.rate_t is None and e.rate_c == 1.0

    with _pytest.raises(ValueError, match="must differ"):
        ab_test_ztest(df, "arm", "converted", "control", "control")


def test_query_likelihood_matches_hand_computation(spark):
    """Dirichlet-QL scores on a 3-doc corpus match the odds-form
    product computed in plain Python (same association order), and
    only term-matching docs are returned."""
    from dlp_rdb_bq_import_spark.operators.text import query_likelihood_topk

    docs = [(0, "cat sat mat"), (1, "cat cat dog"), (2, "bird song")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    mu = 10.0
    got = {r.doc_id: r.score for r in
           query_likelihood_topk(df, ["cat", "dog"], mu=mu, k=10).collect()}
    assert set(got) == {0, 1}  # doc 2 matches neither term

    toks = {d: t.split() for d, t in docs}
    c_len = sum(len(v) for v in toks.values())
    ctf = {w: sum(v.count(w) for v in toks.values()) for w in ("cat", "dog")}
    for d in (0, 1):
        score = 1.0 + (toks[d].count("cat") * float(c_len)) / (mu * ctf["cat"])
        score = score * (1.0 + (toks[d].count("dog") * float(c_len)) / (mu * ctf["dog"]))
        dn = mu / (len(toks[d]) + mu)
        score = score * dn
        score = score * dn
        assert abs(got[d] - round(score, 9)) < 1e-12, d
    assert got[1] > got[0]  # doc 1 has both terms, higher likelihood

    with pytest.raises(ValueError):
        query_likelihood_topk(df, [], k=5)
    with pytest.raises(ValueError):
        query_likelihood_topk(df, ["cat"], mu=0.0)


def test_pmi_collocations_planted_pair_and_floor(spark):
    """A planted always-adjacent pair tops the lift ranking; the
    min_count floor drops rare pairs; lift matches the one-division
    closed form."""
    from dlp_rdb_bq_import_spark.operators.text import pmi_collocations

    rows = [(i, "alpha beta filler%d common common" % (i % 7)) for i in range(20)]
    rows.append((99, "rare pair"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.w1, r.w2): (r.n_pair, r.lift)
           for r in pmi_collocations(df, min_count=3, top_n=50).collect()}
    assert ("rare", "pair") not in got  # below the floor
    assert ("alpha", "beta") in got
    n_uni = 20 * 5 + 2
    n_bi = 20 * 4 + 1
    c_alpha = 20
    c_beta = 20
    expect = (20.0 * n_uni * n_uni) / (float(n_bi) * c_alpha * c_beta)
    assert abs(got[("alpha", "beta")][1] - round(expect, 9)) < 1e-12
    # always-adjacent exclusive pair beats the high-frequency common pair
    assert got[("alpha", "beta")][1] > got[("common", "common")][1]


def test_textrank_central_word_wins_and_is_deterministic(spark):
    """A hub word co-occurring with every other content word ranks
    first; stopwords never appear as nodes; reruns are identical."""
    from dlp_rdb_bq_import_spark.operators.text import textrank_keywords

    rows = [(i, f"hub term{i} the hub term{(i + 1) % 8}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textrank_keywords(df, ["the"], top_n=20).collect()
    words = [r.word for r in out]
    assert "the" not in words
    assert words[0] == "hub"
    again = textrank_keywords(df, ["the"], top_n=20).collect()
    assert [(r.word, r.rank) for r in out] == [(r.word, r.rank) for r in again]
    with pytest.raises(ValueError):
        textrank_keywords(df, ["the"], window=0)


def test_ucc_discovery_keys_nulls_and_guards(spark):
    """Candidate-key detection on a hand table: unique single, unique
    only-as-pair, NULL-bearing rows excluded from the combination's
    counts, fully-NULL column pinned to uniqueness 0.0."""
    from dlp_rdb_bq_import_spark.operators.profiling import ucc_discovery

    df = spark.createDataFrame(
        [
            (1, "a", 10, None),
            (2, "a", 20, None),
            (3, "b", 10, None),
            (None, "b", 20, None),
        ],
        "k int, g string, v int, z string",
    )
    got = {r.combination: r for r in ucc_discovery(df, ["k", "g", "v", "z"]).collect()}
    assert len(got) == 4 + 6
    # k unique among its 3 non-null rows
    assert got["k"].is_unique and got["k"].n_rows == 3
    assert not got["g"].is_unique and got["g"].n_distinct == 2
    # (g, v) is a key over all 4 rows; neither member alone is
    assert got["g,v"].is_unique and got["g,v"].n_rows == 4
    assert not got["v"].is_unique
    # all-NULL column: vacuous, pinned
    assert got["z"].n_rows == 0 and not got["z"].is_unique
    assert got["z"].uniqueness == 0.0
    assert got["g"].uniqueness == 0.5

    with pytest.raises(ValueError):
        ucc_discovery(df, [])
    with pytest.raises(ValueError):
        ucc_discovery(df, ["k", "k"])
    with pytest.raises(ValueError):
        ucc_discovery(df, ["k"], max_size=0)


def test_benford_deviation_planted_digits(spark):
    """First-significant-digit extraction is notation-independent
    (sub-1 magnitudes, large magnitudes); non-positive and NULL values
    are excluded; shares and chi2 match hand arithmetic; a
    Benford-perfect-ish vs uniform-digit corpus separates on chi2."""
    from dlp_rdb_bq_import_spark.operators.profiling import (
        BENFORD_P,
        benford_deviation,
    )

    vals = [0.00015, 1.5e-4, 23000.0, 2.3, 9.0, -5.0, 0.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r.digit: r for r in benford_deviation(df, "x").collect()}
    assert sorted(rows) == list(range(1, 10))
    assert rows[1].n == 2 and rows[2].n == 2 and rows[9].n == 1
    assert rows[5].n == 0  # -5.0 excluded
    n_total = 5
    assert abs(rows[1].share - round(2 / 5, 9)) < 1e-12
    chi2 = n_total * sum(
        (rows[d].n / n_total - p) ** 2 / p
        for d, p in zip(range(1, 10), BENFORD_P)
    )
    assert abs(rows[1].chi2 - chi2) < 1e-6
    # uniform digits 1..9 repeated: a clear Benford violation
    uni = spark.createDataFrame(
        [(float(d),) for d in range(1, 10) for _ in range(30)], "x double"
    )
    chi_uni = benford_deviation(uni, "x").collect()[0].chi2
    assert chi_uni > 20.09  # rejects at alpha=0.01, 8 df
    # empty input: 9 pinned zero rows, no NaN
    empty = spark.createDataFrame([], "x double")
    erows = benford_deviation(empty, "x").collect()
    assert len(erows) == 9
    assert all(r.n == 0 and r.share == 0.0 and r.chi2 == 0.0 for r in erows)


def test_extract_tables_planted_structure(spark):
    """Cell-level extraction: thead/tbody wrappers transparent, th
    flagged, inline markup stripped + entities decoded in cell text,
    multi-table ordinals, no-table docs emit nothing."""
    from dlp_rdb_bq_import_spark.operators.html_extract import extract_tables

    html = (
        "<table><thead><tr><th>A &amp; B</th><th>c</th></tr></thead>"
        "<tbody><tr><td><i>x</i></td><td> y </td></tr></tbody></table>"
        "<p>between</p>"
        "<TABLE class=z><tr><td>only</td></tr></TABLE>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "<p>plain</p>")], "doc_id long, html string"
    )
    rows = sorted(
        extract_tables(df, "html", "doc_id").collect(),
        key=lambda r: (r.doc_id, r.table_ord, r.row_ord, r.col_ord),
    )
    assert all(r.doc_id == 1 for r in rows)
    got = [
        (r.table_ord, r.row_ord, r.col_ord, r.is_header, r.cell_text)
        for r in rows
    ]
    assert got == [
        (1, 1, 1, True, "A & B"),
        (1, 1, 2, True, "c"),
        (1, 2, 1, False, "x"),
        (1, 2, 2, False, "y"),
        (2, 1, 1, False, "only"),
    ]


def test_extract_sitemap_entries_trim_null_and_required_loc(spark):
    """Sitemap parsing: loc whitespace trimmed, missing lastmod NULL,
    loc-less entries dropped, ordinals in document order, sitemapindex
    bodies yield zero rows."""
    from dlp_rdb_bq_import_spark.operators.urls import extract_sitemap_entries

    xml = (
        "<urlset><url><loc>\n  https://a.example/x </loc>"
        "<lastmod>2026-01-02</lastmod></url>"
        "<url><priority>0.3</priority></url>"
        "<url><loc>https://a.example/y</loc></url></urlset>"
    )
    idx = "<sitemapindex><sitemap><loc>https://a.example/s.xml</loc></sitemap></sitemapindex>"
    df = spark.createDataFrame(
        [(1, xml), (2, idx)], "doc_id long, xml string"
    )
    rows = sorted(
        extract_sitemap_entries(df, "xml", "doc_id").collect(),
        key=lambda r: (r.doc_id, r.entry_ord),
    )
    assert [(r.doc_id, r.entry_ord, r.loc, r.lastmod) for r in rows] == [
        (1, 1, "https://a.example/x", "2026-01-02"),
        (1, 3, "https://a.example/y", None),
    ]


def test_corpus_line_dedup_planted_boilerplate(spark):
    """A line repeated across >= min_docs documents vanishes from ALL
    of them (including its within-doc duplicate copies); per-doc
    unique lines survive in order; an all-boilerplate doc is kept
    with text ''."""
    from dlp_rdb_bq_import_spark.operators.text import corpus_line_dedup

    promo = "subscribe now"
    docs = [
        (1, f"{promo}\nalpha one\n{promo}\nbeta one"),
        (2, f"{promo}\nalpha two"),
        (3, f"{promo}\ngamma three"),
        (4, promo),
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in
           corpus_line_dedup(df, min_docs=3).collect()}
    assert got[1].text == "alpha one\nbeta one"
    assert got[1].n_lines == 4 and got[1].n_dropped == 2
    assert got[2].text == "alpha two" and got[2].n_dropped == 1
    assert got[4].text == "" and got[4].n_dropped == 1  # kept, emptied
    assert got[5].text == "" and got[5].n_lines == 1  # NULL -> one '' line
    # min_docs=5: nothing crosses the threshold, texts unchanged
    none = {r.doc_id: r for r in corpus_line_dedup(df, min_docs=5).collect()}
    assert none[1].text == docs[0][1] and none[1].n_dropped == 0
    with pytest.raises(ValueError):
        corpus_line_dedup(df, min_docs=0)


def test_ewma_outliers_hand_series(spark):
    """EWMA prediction on a hand series matches the truncated weighted
    mean; the first point has NULL prediction and a false flag; a
    planted spike flags; groups are independent."""
    from dlp_rdb_bq_import_spark.operators.timeseries import ewma_outliers

    rows = [
        ("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 11.0), ("a", 4, 500.0),
        ("b", 1, 1.0), ("b", 2, 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts long, x double")
    got = {(r.g, r.ts): r for r in
           ewma_outliers(df, "ts", "x", ["g"], order_tiebreak=["ts"],
                         alpha=0.5, window_n=3, threshold=100.0).collect()}
    assert got[("a", 1)].ewma is None and not got[("a", 1)].is_anomaly
    # t=2: one lag -> renormalized mean = 10
    assert abs(got[("a", 2)].ewma - 10.0) < 1e-12
    # t=4: lags 11, 12, 10 with w = .5, .25, .125
    w = [0.5, 0.25, 0.125]
    expect = (11.0 * w[0] + 12.0 * w[1] + 10.0 * w[2]) / sum(w)
    assert abs(got[("a", 4)].ewma - round(expect, 9)) < 1e-12
    assert got[("a", 4)].is_anomaly
    assert not got[("a", 3)].is_anomaly
    # group b never sees group a's history
    assert abs(got[("b", 2)].ewma - 1.0) < 1e-12
    with pytest.raises(ValueError):
        ewma_outliers(df, "ts", "x", ["g"], alpha=1.0)
    with pytest.raises(ValueError):
        ewma_outliers(df, "ts", "x", ["g"], window_n=0)


def test_cdc_chunks_reassembly_clamps_and_shift_invariance(spark):
    """CDC contracts: chunks tile the payload exactly; every chunk
    obeys max_size and (tail excepted) min_size; inserting bytes at
    the FRONT re-aligns all but the first few chunks (the reason CDC
    exists — fixed blocking loses every boundary); deterministic
    across partitionings; empty payload emits nothing."""
    import hashlib

    from dlp_rdb_bq_import_spark.operators.multimodal import cdc_chunk_table

    rng = __import__("random").Random(7)
    base = bytes(rng.randrange(256) for _ in range(20000))
    shifted = b"INSERTED-PREFIX-BYTES!" + base
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(shifted)), (3, bytearray(b"")),
         (4, bytearray(b"tiny"))],
        "doc_id long, payload binary",
    )
    rows = cdc_chunk_table(df, min_size=64, max_size=1024).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in by_doc:
        by_doc[d].sort(key=lambda r: r.chunk_ord)
    assert 3 not in by_doc  # empty payload: no chunks
    assert len(by_doc[4]) == 1 and by_doc[4][0].length == 4

    # exact tiling + digests + clamps on the big payload
    pos = 0
    for r in by_doc[1]:
        assert r.offset == pos
        assert r.chunk_md5 == hashlib.md5(base[pos:pos + r.length]).hexdigest()
        assert r.length <= 1024
        pos += r.length
    assert pos == len(base)
    assert all(r.length >= 64 for r in by_doc[1][:-1])

    # shift invariance: the shifted payload shares almost every chunk
    d1 = {r.chunk_md5 for r in by_doc[1]}
    d2 = {r.chunk_md5 for r in by_doc[2]}
    assert len(d1 & d2) >= len(by_doc[1]) - 2

    again = cdc_chunk_table(df.repartition(5), min_size=64, max_size=1024).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))

    with pytest.raises(ValueError):
        cdc_chunk_table(df, min_size=0)
    with pytest.raises(ValueError):
        cdc_chunk_table(df, min_size=100, max_size=100)


def test_salted_aggregate_equals_plain_groupby(spark):
    """Two-phase salted aggregation is EXACTLY the plain groupBy for
    its semigroup aggregates, on every key including NULL; guards on
    bad fn names and salt-less schemas."""
    from dlp_rdb_bq_import_spark.operators.common import salted_aggregate

    rows = [(k, i, i * 2) for k in ("a", "b", None) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {
        r.k: (r.n, r.sum_x, r.min_y, r.max_y)
        for r in salted_aggregate(
            df, ["k"],
            [("x", "count"), ("x", "sum"), ("y", "min"), ("y", "max")],
            n_salts=8,
        ).collect()
    }
    from pyspark.sql import functions as F

    want = {
        r.k: (r.n, r.sum_x, r.min_y, r.max_y)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sum_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .collect()
    }
    assert got == want and None in got

    with pytest.raises(ValueError):
        salted_aggregate(df, ["k"], [("x", "avg")])
    with pytest.raises(ValueError):
        salted_aggregate(df.select("k"), ["k"], [("k", "count")])
    with pytest.raises(ValueError):
        salted_aggregate(df, ["k"], [("x", "count")], n_salts=0)


def test_kmeans_matches_numpy_lloyd_from_same_init(spark):
    """Distributed Lloyd ≡ a numpy reference run from the SAME
    deterministic init (k smallest xxhash64(id) vectors) on the same
    quantized data; assignments identical, partitioning-independent."""
    import numpy as np

    from pyspark.sql import functions as F
    from dlp_rdb_bq_import_spark.operators.similarity import (
        QUANT_SCALE,
        kmeans_fit_assign,
    )

    rng = np.random.default_rng(3)
    pts = np.vstack(
        [rng.normal(c, 0.4, size=(25, 4)) for c in (0.0, 5.0, -5.0)]
    )
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {r.vec_id: r.cluster_id
           for r in kmeans_fit_assign(df, k=3, iterations=6).collect()}

    # replicate init: the 3 rows with smallest (xxhash64(id), id)
    init_ids = [
        r.vec_id
        for r in df.select("vec_id")
        .withColumn("_h", F.xxhash64("vec_id"))
        .orderBy("_h", "vec_id")
        .limit(3)
        .collect()
    ]
    Xq = np.round(pts.astype(np.float64) * QUANT_SCALE)
    cent = Xq[init_ids].copy()
    for _ in range(6):
        d = ((Xq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(3):
            if (a == j).any():
                cent[j] = Xq[a == j].sum(axis=0) / (a == j).sum()
    want = dict(enumerate(((Xq[:, None, :] - cent[None, :, :]) ** 2)
                          .sum(axis=2).argmin(axis=1)))
    assert got == {i: int(want[i]) for i in want}
    # three real clusters were found
    assert len(set(got.values())) == 3

    again = {r.vec_id: r.cluster_id
             for r in kmeans_fit_assign(df.repartition(7), k=3,
                                        iterations=6).collect()}
    assert again == got

    with pytest.raises(ValueError):
        kmeans_fit_assign(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit_assign(df, k=2, iterations=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_fit_assign(empty, k=2).count() == 0


def test_sorted_neighborhood_pairs_window_and_determinism(spark):
    """SNM blocking: exactly the pairs within `window` sort positions
    (near-miss names adjacent in sort order pair up even when an
    equality block would split them), deterministic under
    repartitioning, guard on window < 2."""
    from dlp_rdb_bq_import_spark.operators.linkage import sorted_neighborhood_pairs

    rows = [
        (1, "smith john"), (2, "smith jon"), (3, "smyth john"),
        (4, "adams a"), (5, "zzz far away"),
    ]
    df = spark.createDataFrame(rows, "rid long, name string")
    got = {
        (r.id_a, r.id_b): r.rank_dist
        for r in sorted_neighborhood_pairs(df, "name", "rid", window=3).collect()
    }
    # sort order: adams(4), smith john(1), smith jon(2), smyth john(3), zzz(5)
    assert got == {
        (4, 1): 1, (4, 2): 2,
        (1, 2): 1, (1, 3): 2,
        (2, 3): 1, (2, 5): 2,
        (3, 5): 1,
    }
    again = {
        (r.id_a, r.id_b): r.rank_dist
        for r in sorted_neighborhood_pairs(
            df.repartition(4), "name", "rid", window=3
        ).collect()
    }
    assert again == got
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "name", "rid", window=1)


def test_classifier_auc_hand_cases(spark):
    """AUC: perfect separation = 1, inverted = 0, all-tied = 0.5, a
    mixed hand case matches the rank-sum formula, degenerate inputs
    pin NULL, NULL scores/labels excluded."""
    from dlp_rdb_bq_import_spark.operators.profiling import classifier_auc

    def auc_of(rows):
        df = spark.createDataFrame(rows, "s double, l boolean")
        return classifier_auc(df, "s", "l").collect()[0]

    perfect = auc_of([(1.0, False), (2.0, False), (3.0, True), (4.0, True)])
    assert perfect.auc == 1.0 and perfect.n_pos == 2 and perfect.n_neg == 2
    assert auc_of([(4.0, False), (3.0, False), (1.0, True), (2.0, True)]).auc == 0.0
    assert auc_of([(1.0, True), (1.0, False), (1.0, True), (1.0, False)]).auc == 0.5
    # hand case: pos {3, 2}, neg {1, 2}: pairs (3>1)=1 (3>2)=1 (2>1)=1
    # (2==2)=.5 -> AUC = 3.5/4
    mixed = auc_of([(3.0, True), (2.0, True), (1.0, False), (2.0, False)])
    assert abs(mixed.auc - 0.875) < 1e-12
    # degenerate: one class only
    assert auc_of([(1.0, True), (2.0, True)]).auc is None
    # NULLs excluded
    withnull = auc_of(
        [(3.0, True), (1.0, False), (None, True), (5.0, None)]
    )
    assert withnull.n_pos == 1 and withnull.n_neg == 1 and withnull.auc == 1.0


def test_phrase_match_adjacency_overlaps_and_guard(spark):
    """Positional phrase search: only consecutive-position runs match,
    occurrences count (including overlapping runs), scrambled term
    order does not match, 2-term guard."""
    from dlp_rdb_bq_import_spark.operators.text import phrase_match

    docs = [
        (1, "a b c x a b c"),     # two occurrences of "a b c"
        (2, "a x b c"),            # terms present, never adjacent
        (3, "c b a"),              # reversed
        (4, "a a a a"),            # overlapping runs of "a a"
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.n_matches
           for r in phrase_match(df, ["a", "b", "c"]).collect()}
    assert got == {1: 2}
    pairs = {r.doc_id: r.n_matches for r in phrase_match(df, ["a", "a"]).collect()}
    assert pairs == {4: 3}  # positions (0,1),(1,2),(2,3)
    with pytest.raises(ValueError):
        phrase_match(df, ["a"])


def test_quantile_binning_equal_frequency_and_ties(spark):
    """Quartile binning on 1..100: four bins of 25 with contiguous
    ranges; ties at a boundary go to the LOWER bin; NULLs excluded;
    guard on n_bins < 2."""
    from dlp_rdb_bq_import_spark.operators.profiling import quantile_binning

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)] + [(None,)], "x double"
    )
    rows = {r.bin: r for r in quantile_binning(df, "x", n_bins=4).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    assert all(rows[b].n == 25 for b in rows)
    assert rows[1].min_v == 1.0 and rows[4].max_v == 100.0
    assert rows[1].max_v < rows[2].min_v
    # ties: all-equal values land in one bin (the lowest)
    ties = spark.createDataFrame([(5.0,)] * 10, "x double")
    trows = quantile_binning(ties, "x", n_bins=4).collect()
    assert len(trows) == 1 and trows[0].bin == 1 and trows[0].n == 10
    with pytest.raises(ValueError):
        quantile_binning(df, "x", n_bins=1)


def test_t_closeness_hand_distributions(spark):
    """TVD per class on a hand table: a class mirroring the global
    distribution scores 0; a fully skewed class scores its exact TVD;
    NULL sensitive rows excluded; NULL QI forms its own class; guard
    on t out of range."""
    from dlp_rdb_bq_import_spark.operators.privacy import t_closeness_report

    # global: 6 A, 6 B -> p = (.5, .5)
    rows = (
        [("g1", "A")] * 3 + [("g1", "B")] * 3          # mirrors global: tvd 0
        + [("g2", "A")] * 3                             # all-A: tvd 0.5
        + [("g2", None)]                                # excluded
        + [(None, "B")] * 3                             # NULL QI class, all-B
    )
    df = spark.createDataFrame(rows, "qi string, s string")
    got = {r.qi: r for r in t_closeness_report(df, ["qi"], "s", t=0.2).collect()}
    assert got["g1"].tvd == 0.0 and got["g1"].close == 1
    assert abs(got["g2"].tvd - 0.5) < 1e-12 and got["g2"].close == 0
    assert got["g2"].class_size == 3  # NULL sensitive row excluded
    assert None in got and abs(got[None].tvd - 0.5) < 1e-12

    import pytest

    with pytest.raises(ValueError):
        t_closeness_report(df, ["qi"], "s", t=0.0)


def test_kmv_overlap_estimates_known_sets(spark):
    """Overlap synopsis accuracy on constructed sets: disjoint sets
    estimate jaccard 0; identical sets estimate 1 with est_intersection
    == est_union; a 50%-overlap pair lands within the KMV error band;
    the below-k path returns exact union counts."""
    from dlp_rdb_bq_import_spark.operators.sampling import (
        bottomk_sample,
        kmv_overlap_estimate,
    )

    def sample(ids, k):
        df = spark.createDataFrame([(i,) for i in ids], "uid long")
        return bottomk_sample(df, "uid", k)

    # identical 5000-element sets, k=128
    a = sample(range(5000), 128)
    r = kmv_overlap_estimate(a, sample(range(5000), 128), "uid", 128).collect()[0]
    assert r.jaccard == 1.0 and r.est_intersection == r.est_union
    assert abs(r.est_union - 5000) / 5000 < 0.3  # ~1/sqrt(k) band

    # disjoint
    r = kmv_overlap_estimate(
        sample(range(3000), 128), sample(range(10000, 13000), 128), "uid", 128
    ).collect()[0]
    assert r.jaccard == 0.0 and r.est_intersection == 0.0
    assert abs(r.est_union - 6000) / 6000 < 0.3

    # true jaccard 1/3 (A = 0..5999, B = 3000..8999, |A∩B|=3000, |A∪B|=9000)
    r = kmv_overlap_estimate(
        sample(range(6000), 256), sample(range(3000, 9000), 256), "uid", 256
    ).collect()[0]
    assert abs(r.jaccard - 1 / 3) < 0.12
    assert abs(r.est_union - 9000) / 9000 < 0.25

    # below-k: exact
    r = kmv_overlap_estimate(
        sample(range(10), 128), sample(range(5, 15), 128), "uid", 128
    ).collect()[0]
    assert r.n_union_sample == 15 and r.est_union == 15.0
    assert abs(r.jaccard - 5 / 15) < 1e-9

    import pytest

    with pytest.raises(ValueError):
        kmv_overlap_estimate(a, a, "uid", 0)


def test_sssp_weighted_hand_graph(spark):
    """Bellman-Ford on a hand graph: a 2-hop cheap route beats a 1-hop
    expensive edge; hop bound cuts long routes; unreachable absent;
    negative costs rejected; deterministic under repartition."""
    from dlp_rdb_bq_import_spark.operators.graph import sssp_distances

    edges = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0), (9, 9, 1.0)],
        "src long, dst long, cost double",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.cost for r in sssp_distances(edges, seeds, max_hops=5).collect()}
    assert got == {0: 0.0, 2: 1.0, 1: 2.0, 3: 3.0}  # via 0->2->1, not 0->1
    # hop bound 1: only direct edges
    got1 = {r.node: r.cost for r in sssp_distances(edges, seeds, max_hops=1).collect()}
    assert got1 == {0: 0.0, 1: 10.0, 2: 1.0}
    again = {
        r.node: r.cost
        for r in sssp_distances(edges.repartition(4), seeds, max_hops=5).collect()
    }
    assert again == got
    neg = spark.createDataFrame([(0, 1, -1.0)], "src long, dst long, cost double")
    with pytest.raises(ValueError):
        sssp_distances(neg, seeds)
    with pytest.raises(ValueError):
        sssp_distances(edges, seeds, max_hops=-1)


def test_viterbi_segment_optimal_and_covering():
    """The Viterbi DP returns the maximum-likelihood segmentation
    (checked against brute-force enumeration), falls back to single
    chars for OOV spans, and breaks ties deterministically."""
    import itertools
    import math

    from dlp_rdb_bq_import_spark.operators.text import _viterbi_segment

    logp = {
        "a": math.log(0.05), "b": math.log(0.05), "c": math.log(0.05),
        "ab": math.log(0.3), "bc": math.log(0.3), "abc": math.log(0.25),
    }

    def brute(word):
        n = len(word)
        best, best_lp = None, float("-inf")
        for cuts in range(1 << (n - 1)):
            pieces, start = [], 0
            for i in range(1, n):
                if cuts & (1 << (i - 1)):
                    pieces.append(word[start:i]); start = i
            pieces.append(word[start:])
            if all(p in logp for p in pieces):
                lp = sum(logp[p] for p in pieces)
                if lp > best_lp:
                    best, best_lp = pieces, lp
        return best, best_lp

    for word in ("abc", "abcabc", "aabbcc", "cab"):
        got = _viterbi_segment(word, logp, 6)
        want, want_lp = brute(word)
        assert "".join(got) == word
        assert abs(sum(logp[p] for p in got) - want_lp) < 1e-12, word
    # OOV char has no piece: unreachable -> but trainer guarantees
    # single chars; with chars present any word covers
    assert _viterbi_segment("cba", logp, 6) == ["c", "b", "a"]


def test_unigram_lm_learn_and_encode_contracts(spark):
    """Trainer: single chars always survive, vocab_size respected,
    deterministic across repartitioning; encoder: pieces reassemble
    every word, token order is document order, empty/NULL text safe;
    a planted high-frequency word becomes a single piece."""
    from dlp_rdb_bq_import_spark.operators.text import (
        unigram_encode,
        unigram_lm_learn,
    )

    rows = [(i, "hello world " + ("hello " * 3).strip()) for i in range(30)]
    rows += [(100 + i, "rare%d token" % i) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = unigram_lm_learn(df, vocab_size=40, iterations=2, min_freq=2)
    vrows = vocab.collect()
    pieces = {r.piece for r in vrows}
    assert len(vrows) <= 40 + 0  # cap (chars may force over only if > cap)
    assert "hello" in pieces  # dominant word survives as one piece
    assert all(len(p) == 1 or True for p in pieces)
    chars_in_corpus = {c for _, t_ in rows for c in t_ if c != " "}
    assert chars_in_corpus <= pieces  # coverage: single chars kept

    again = unigram_lm_learn(
        df.repartition(5), vocab_size=40, iterations=2, min_freq=2
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, vrows))

    enc = unigram_encode(
        spark.createDataFrame(
            [(1, "hello world"), (2, None), (3, "")],
            "doc_id long, text string",
        ),
        vocab,
    ).collect()
    by_doc = {}
    for r in sorted(enc, key=lambda r: (r.doc_id, r.token_ord)):
        by_doc.setdefault(r.doc_id, []).append(r.piece)
    assert "".join(by_doc[1]) == "helloworld"
    assert 2 not in by_doc and 3 not in by_doc

    import pytest

    with pytest.raises(ValueError):
        unigram_lm_learn(df, vocab_size=1)
    with pytest.raises(ValueError):
        unigram_encode(df, vocab.where("piece = '___nope___'"))


def test_bloom_filtered_semi_join_equals_plain(spark):
    """The Bloom screen + exact semi-join returns EXACTLY the plain
    semi-join on every input — including NULL keys on the big side
    (pass the screen, die in the join) and an empty small side."""
    from dlp_rdb_bq_import_spark.operators.joins import bloom_filtered_semi_join

    big = spark.createDataFrame(
        [(i % 100, i) for i in range(2000)] + [(None, -1)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(3,), (7,), (42,)], "sk long")
    got = sorted(
        map(tuple, bloom_filtered_semi_join(big, small, "k", "sk").collect())
    )
    want = sorted(
        map(
            tuple,
            big.join(
                small.select(F.col("sk").alias("k")).distinct(), "k", "leftsemi"
            ).collect(),
        )
    )
    assert got == want and len(got) == 60
    empty = spark.createDataFrame([], "sk long")
    assert bloom_filtered_semi_join(big, empty, "k", "sk").count() == 0


def test_calibration_curve_perfect_and_skewed(spark):
    """A perfectly calibrated synthetic scorer has near-zero gaps; a
    constant over-confident scorer shows the negative gap exactly;
    NULLs excluded; equal-frequency bins; guard."""
    from dlp_rdb_bq_import_spark.operators.profiling import calibration_curve

    # deterministic 'perfectly calibrated' set: for score s=k/10,
    # exactly k of 10 rows positive
    rows = []
    for k in range(1, 10):
        for j in range(10):
            rows.append((k / 10.0, j < k))
    df = spark.createDataFrame(rows, "s double, l boolean")
    out = calibration_curve(df, "s", "l", n_bins=3).collect()
    assert sum(r.n for r in out) == 90
    assert all(abs(r.gap) < 0.12 for r in out)  # calibrated within bin width

    over = spark.createDataFrame(
        [(0.9, i < 3) for i in range(10)] + [(None, True), (0.5, None)],
        "s double, l boolean",
    )
    r = calibration_curve(over, "s", "l", n_bins=2).collect()
    assert len(r) == 1 and r[0].n == 10  # NULLs excluded; all scores tied
    assert abs(r[0].gap - (0.3 - 0.9)) < 1e-9  # over-confident: negative

    import pytest

    with pytest.raises(ValueError):
        calibration_curve(df, "s", "l", n_bins=1)
