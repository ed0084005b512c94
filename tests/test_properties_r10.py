"""Property tests for round-10 operators: invariants that must hold
for ANY input, not just the fixtures. Pure-Python properties (Viterbi,
CDC cuts) run at full hypothesis scale; Spark-backed ones use few
examples (a Spark action per example)."""

from __future__ import annotations

import hashlib
import itertools
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# Viterbi segmentation (unigram-LM tokenizer core)
# ---------------------------------------------------------------------------


@given(
    st.text(alphabet="abc", min_size=1, max_size=9),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=120, deadline=None)
def test_viterbi_is_optimal_vs_enumeration(word, seed):
    """For any word over a random piece vocabulary (single chars always
    present), the DP's segmentation (a) reassembles the word and (b)
    achieves exactly the brute-force maximum likelihood."""
    from dlp_rdb_bq_import_spark.operators.text import _viterbi_segment

    rng = np.random.RandomState(seed)
    pieces = {"a", "b", "c"}
    for ln in (2, 3):
        for combo in itertools.product("abc", repeat=ln):
            if rng.rand() < 0.3:
                pieces.add("".join(combo))
    raw = {p: float(rng.rand()) + 0.01 for p in pieces}
    total = sum(raw.values())
    logp = {p: math.log(v / total) for p, v in raw.items()}

    got = _viterbi_segment(word, logp, max_len=3)
    assert "".join(got) == word
    got_lp = sum(logp[p] for p in got)

    n = len(word)
    best_lp = -float("inf")
    for cuts in range(1 << max(n - 1, 0)):
        segs, start = [], 0
        for i in range(1, n):
            if cuts & (1 << (i - 1)):
                segs.append(word[start:i])
                start = i
        segs.append(word[start:])
        if all(p in logp and len(p) <= 3 for p in segs):
            best_lp = max(best_lp, sum(logp[p] for p in segs))
    assert abs(got_lp - best_lp) < 1e-9


# ---------------------------------------------------------------------------
# Content-defined chunking invariants
# ---------------------------------------------------------------------------


def _chunks_of(payload: bytes, spark, **kw):
    from dlp_rdb_bq_import_spark.operators.multimodal import cdc_chunk_table

    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    rows = sorted(cdc_chunk_table(df, **kw).collect(), key=lambda r: r.chunk_ord)
    return rows


def test_cdc_random_payload_invariants(spark):
    """For arbitrary payloads: chunks tile exactly (offsets contiguous,
    lengths sum to the payload), every chunk <= max_size, every
    non-final chunk >= min_size, and digests match the slices."""
    rng = np.random.RandomState(11)
    for size in (0, 1, 63, 64, 65, 300, 5000):
        payload = bytes(rng.randint(0, 256, size, dtype=np.uint8).tobytes())
        rows = _chunks_of(payload, spark, min_size=64, max_size=512)
        if size == 0:
            assert rows == []
            continue
        pos = 0
        for i, r in enumerate(rows):
            assert r.offset == pos
            assert 0 < r.length <= 512
            if i < len(rows) - 1:
                assert r.length >= 64
            assert (
                r.chunk_md5
                == hashlib.md5(payload[pos : pos + r.length]).hexdigest()
            )
            pos += r.length
        assert pos == size


def test_cdc_suffix_stability_under_prefix_edits(spark):
    """CDC's reason to exist: for a large random payload, prepending
    bytes leaves the SUFFIX chunking byte-identical past the first
    affected region — the shared-chunk count stays within a small
    constant of the total."""
    rng = np.random.RandomState(23)
    base = bytes(rng.randint(0, 256, 30000, dtype=np.uint8).tobytes())
    a = {r.chunk_md5 for r in _chunks_of(base, spark, min_size=64, max_size=1024)}
    for prefix_len in (1, 17, 200):
        edited = bytes(rng.randint(0, 256, prefix_len, dtype=np.uint8).tobytes()) + base
        b = {
            r.chunk_md5
            for r in _chunks_of(edited, spark, min_size=64, max_size=1024)
        }
        assert len(a & b) >= len(a) - 3, prefix_len


# ---------------------------------------------------------------------------
# Salted aggregation ≡ plain groupBy on random frames
# ---------------------------------------------------------------------------


def test_salted_aggregate_random_equivalence(spark):
    """For random keyed data (skewed keys, NULL keys, negative values)
    and several salt counts, the two-phase fold equals the plain
    groupBy exactly."""
    from pyspark.sql import functions as F

    from dlp_rdb_bq_import_spark.operators.common import salted_aggregate

    rng = np.random.RandomState(5)
    rows = []
    for _ in range(800):
        k = rng.choice(["hot", "hot", "hot", "a", "b", None])
        rows.append((k, int(rng.randint(-50, 50)), int(rng.randint(0, 9))))
    df = spark.createDataFrame(rows, "k string, x long, y long")
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
    for n_salts in (1, 5, 64):
        got = {
            r.k: (r.n, r.sum_x, r.min_y, r.max_y)
            for r in salted_aggregate(
                df,
                ["k"],
                [("x", "count"), ("x", "sum"), ("y", "min"), ("y", "max")],
                n_salts=n_salts,
            ).collect()
        }
        assert got == want, n_salts


# ---------------------------------------------------------------------------
# t-closeness bounds
# ---------------------------------------------------------------------------


def test_t_closeness_tvd_bounds_random(spark):
    """For random QI/sensitive data: every class's TVD lies in [0, 1],
    a single-class table scores exactly 0 (its distribution IS the
    global one), and class sizes sum to the non-NULL-sensitive row
    count."""
    from dlp_rdb_bq_import_spark.operators.privacy import t_closeness_report

    rng = np.random.RandomState(9)
    rows = [
        (str(rng.randint(4)), str(rng.randint(3)) if rng.rand() > 0.1 else None)
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "qi string, s string")
    out = t_closeness_report(df, ["qi"], "s", t=0.2).collect()
    assert all(0.0 <= r.tvd <= 1.0 for r in out)
    n_valid = sum(1 for _, s in rows if s is not None)
    assert sum(r.class_size for r in out) == n_valid

    one = df.withColumn("qi", df.qi * 0)  # constant QI: one class
    single = t_closeness_report(
        one.selectExpr("'all' AS qi", "s"), ["qi"], "s"
    ).collect()
    assert len(single) == 1 and single[0].tvd == 0.0 and single[0].close == 1


# ---------------------------------------------------------------------------
# AUC identities
# ---------------------------------------------------------------------------


def test_auc_complement_and_bounds_random(spark):
    """For random scores/labels: AUC ∈ [0, 1]; negating the scores
    gives exactly 1 − AUC (the Mann-Whitney reflection identity); and
    label inversion does too."""
    from dlp_rdb_bq_import_spark.operators.profiling import classifier_auc

    rng = np.random.RandomState(13)
    rows = [
        (round(float(rng.randn()), 2), bool(rng.rand() < 0.4)) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "s double, l boolean")
    auc = classifier_auc(df, "s", "l").collect()[0].auc
    assert 0.0 <= auc <= 1.0
    neg = spark.createDataFrame([(-s, l) for s, l in rows], "s double, l boolean")
    auc_neg = classifier_auc(neg, "s", "l").collect()[0].auc
    assert abs((auc + auc_neg) - 1.0) < 1e-9
    flipped = spark.createDataFrame(
        [(s, not l) for s, l in rows], "s double, l boolean"
    )
    auc_flip = classifier_auc(flipped, "s", "l").collect()[0].auc
    assert abs((auc + auc_flip) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# KMV overlap estimator sanity under permutation
# ---------------------------------------------------------------------------


def test_kmv_overlap_symmetry_and_containment(spark):
    """Swapping the two samples gives the identical readout (the
    estimator is symmetric by construction), and a subset relation
    yields jaccard == |A|/|B| on the exact below-k path."""
    from dlp_rdb_bq_import_spark.operators.sampling import (
        bottomk_sample,
        kmv_overlap_estimate,
    )

    def sample(ids, k=64):
        df = spark.createDataFrame([(int(i),) for i in ids], "uid long")
        return bottomk_sample(df, "uid", k)

    a, b = sample(range(0, 900)), sample(range(300, 1500))
    r1 = kmv_overlap_estimate(a, b, "uid", 64).collect()[0]
    r2 = kmv_overlap_estimate(b, a, "uid", 64).collect()[0]
    assert tuple(r1) == tuple(r2)

    small, big = sample(range(20)), sample(range(60))
    r = kmv_overlap_estimate(small, big, "uid", 64).collect()[0]
    assert r.n_union_sample == 60
    assert abs(r.jaccard - 20 / 60) < 1e-9
    assert abs(r.est_intersection - 20.0) < 1e-6
