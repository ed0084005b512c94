"""Property tests for the ML-feature wave: target encoding vs the
direct shrinkage formula, hashed features vs an independent hashlib
computation, isotonic PAV vs an independent O(n²) reference fit, and
the distributed skyline vs brute-force dominance — plus partitioning
invariance (the merge identity) and validation contracts."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from dlp_rdb_bq_import_spark.operators.features import (
    hashed_features,
    isotonic_fit,
    target_encode,
)
from dlp_rdb_bq_import_spark.operators.sampling import skyline


# ---------------------------------------------------------------------------
# target encoding
# ---------------------------------------------------------------------------


def test_target_encode_matches_shrinkage_formula(spark):
    rng = np.random.RandomState(13)
    cats = rng.choice(["a", "b", "c", "rare"], p=[0.5, 0.3, 0.19, 0.01], size=400)
    y = np.round(rng.gamma(2, 50, 400), 2)
    df = spark.createDataFrame(
        [(str(c), float(v)) for c, v in zip(cats, y)], "cat string, y double"
    )
    m = 10
    out = {r.category: r for r in target_encode(df, "cat", "y", smoothing=m).collect()}
    cents = np.round(y * 100).astype(np.int64)
    gmean = cents.sum() / len(cents)
    for c in set(cats):
        mask = cats == c
        n, sy = int(mask.sum()), int(cents[mask].sum())
        ref = (sy + m * gmean) / ((n + m) * 100)
        assert out[c].n == n
        assert out[c].enc == pytest.approx(ref, rel=1e-12), c
    # smoothing=0 == raw category means
    raw = {r.category: r.enc for r in target_encode(df, "cat", "y", smoothing=0).collect()}
    for c in set(cats):
        mask = cats == c
        assert raw[c] == pytest.approx(cents[mask].mean() / 100, rel=1e-12)
    # rare category sits between its own mean and the global mean
    mask = cats == "rare"
    if mask.sum() > 0 and abs(cents[mask].mean() - gmean) > 1:
        own, g = cents[mask].mean() / 100, gmean / 100
        assert min(own, g) <= out["rare"].enc <= max(own, g)
    with pytest.raises(ValueError, match="smoothing"):
        target_encode(df, "cat", "y", smoothing=-1)


# ---------------------------------------------------------------------------
# hashing trick
# ---------------------------------------------------------------------------


def _ref_hashed(docs: dict[int, str], dim: int) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    for i, text in docs.items():
        for tok in text.lower().split(" "):
            if not tok:
                continue
            h = hashlib.md5(tok.encode()).hexdigest()
            b = int(h[:8], 16) % dim
            s = 1 if int(h[8], 16) % 2 == 0 else -1
            out[(i, b)] = out.get((i, b), 0) + s
    return {k: v for k, v in out.items() if v != 0}


def test_hashed_features_matches_hashlib_reference(spark):
    docs = {
        1: "alpha beta gamma alpha",
        2: "delta epsilon",
        3: "  spaced   out  tokens ",
        4: "",
    }
    df = spark.createDataFrame(list(docs.items()), "id long, text string")
    rows = hashed_features(df, "id", "text", dim=32).collect()
    got = {(r.id, r.bucket): r.value for r in rows}
    assert got == _ref_hashed(docs, 32)
    with pytest.raises(ValueError, match="dim"):
        hashed_features(df, "id", "text", dim=0)


def test_hashed_features_fixed_dim_and_sparsity(spark):
    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(500)]
    docs = [
        (i, " ".join(rng.choice(vocab, 40))) for i in range(50)
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    rows = hashed_features(df, "id", "text", dim=16).collect()
    assert all(0 <= r.bucket < 16 for r in rows)
    assert all(r.value != 0 for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.id, 0)
        per_doc[r.id] += 1
    assert all(v <= 16 for v in per_doc.values())  # dim caps the fan-out


# ---------------------------------------------------------------------------
# isotonic PAV
# ---------------------------------------------------------------------------


def _ref_pav(scores, n, pos):
    """Independent O(n²) PAV: repeatedly merge ANY adjacent violating
    pair until monotone (order of merges doesn't matter — PAV's fit is
    unique)."""
    blocks = [[float(s), int(w), int(p)] for s, w, p in zip(scores, n, pos)]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            ra = blocks[i][2] / blocks[i][1]
            rb = blocks[i + 1][2] / blocks[i + 1][1]
            if ra > rb + 1e-15:
                blocks[i][1] += blocks[i + 1][1]
                blocks[i][2] += blocks[i + 1][2]
                del blocks[i + 1]
                changed = True
                break
    # expand back to one rate per original distinct score
    rates = []
    bi, used = 0, 0
    for w in n:
        if used >= blocks[bi][1]:
            bi += 1
            used = 0
        rates.append(blocks[bi][2] / blocks[bi][1])
        used += w
    return rates


def test_isotonic_matches_reference_and_invariants(spark):
    rng = np.random.RandomState(23)
    scores = np.round(rng.uniform(0, 1, 600), 2)
    # noisy monotone label: p(y=1) = score with noise
    labels = rng.uniform(0, 1, 600) < scores
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, lbl boolean",
    )
    rows = sorted(isotonic_fit(df, "score", "lbl").collect(), key=lambda r: r.score)
    # distinct-score grouping is exact
    uniq = np.unique(scores)
    assert [r.score for r in rows] == [pytest.approx(u) for u in uniq]
    for r in rows:
        mask = scores == r.score
        assert r.n == mask.sum() and r.pos == labels[mask].sum()
    # monotone non-decreasing
    rates = [r.iso_rate for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(rates, rates[1:]))
    # equals the independent PAV fit
    ref = _ref_pav(
        [r.score for r in rows], [r.n for r in rows], [r.pos for r in rows]
    )
    assert rates == pytest.approx(ref, abs=1e-12)
    # weighted mean preserved (least-squares projection property)
    tot_fit = sum(r.iso_rate * r.n for r in rows)
    assert tot_fit == pytest.approx(labels.sum(), abs=1e-6)


def test_isotonic_perfect_separation_step(spark):
    rows = [(0.1, False)] * 20 + [(0.9, True)] * 20
    df = spark.createDataFrame(rows, "score double, lbl boolean")
    out = {r.score: r.iso_rate for r in isotonic_fit(df, "score", "lbl").collect()}
    assert out[0.1] == 0.0 and out[0.9] == 1.0
    with pytest.raises(ValueError, match="score_round"):
        isotonic_fit(df, "score", "lbl", score_round=-1)


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------


def _brute_skyline(pts: np.ndarray) -> set[int]:
    """All-minimize brute force dominance."""
    keep = set()
    for i in range(len(pts)):
        dominated = any(
            (pts[j] <= pts[i]).all() and (pts[j] < pts[i]).any()
            for j in range(len(pts))
            if j != i
        )
        if not dominated:
            keep.add(i)
    return keep


def test_skyline_matches_bruteforce_and_partition_invariance(spark):
    rng = np.random.RandomState(29)
    pts = np.round(rng.uniform(0, 100, (300, 3)), 1)
    df = spark.createDataFrame(
        [(i, float(a), float(b), float(c)) for i, (a, b, c) in enumerate(pts)],
        "id long, a double, b double, c double",
    )
    # minimize a, b; maximize c  ->  normalize c by negation for brute force
    norm = pts.copy()
    norm[:, 2] = -norm[:, 2]
    ref_ids = _brute_skyline(norm)
    got = {r.id for r in skyline(df, minimize=["a", "b"], maximize=["c"]).collect()}
    assert got == ref_ids
    # partitioning invariance: the merge identity
    got7 = {
        r.id
        for r in skyline(
            df.repartition(7), minimize=["a", "b"], maximize=["c"]
        ).collect()
    }
    assert got7 == ref_ids


def test_skyline_edges(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, 1.0), (3, 4.0, 2.0), (4, None, 9.0)],
        "id long, price double, qual double",
    )
    got = sorted(
        r.id for r in skyline(df, minimize=["price"], maximize=["qual"]).collect()
    )
    # row 3 dominates rows 1/2; row 4 has a NULL dim -> dropped
    assert got == [3]
    # duplicates of the optimum are BOTH kept
    df2 = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 2.0)], "id long, price double"
    )
    got2 = sorted(r.id for r in skyline(df2, minimize=["price"]).collect())
    assert got2 == [1, 2]
    with pytest.raises(ValueError, match="at least one"):
        skyline(df2)
    with pytest.raises(ValueError, match="duplicate"):
        skyline(df2, minimize=["price"], maximize=["price"])
    with pytest.raises(ValueError, match="not in input"):
        skyline(df2, minimize=["nope"])
