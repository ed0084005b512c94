"""Property tests for the corpus-statistics wave: Kneser-Ney scoring
vs an independent pure-Python implementation of the Chen & Goodman
formulation, the KN-vs-add-k 'Francisco' discrimination property,
Good-Turing unseen mass, the Zipf fit on planted power-law text, and
the per-column entropy profile vs direct numpy entropy."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def _kn_ref(train_bigrams, score_bigrams, d=0.75, min_count=1):
    from collections import Counter

    c12 = Counter(train_bigrams)
    if min_count > 1:
        c12 = Counter({k: v for k, v in c12.items() if v >= min_count})
    c1 = Counter()
    n1p_fwd = Counter()
    n1p_bwd = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1p_fwd[w1] += 1
        n1p_bwd[w2] += 1
    t = len(c12)
    vocab = {w for k in c12 for w in k}
    v = len(vocab)
    total = 0
    for w1, w2 in score_bigrams:
        pc = (n1p_bwd.get(w2, 0) + 1.0) / (t + v)
        if c1.get(w1, 0) > 0:
            p = max(c12.get((w1, w2), 0) - d, 0.0) / c1[w1] + d * n1p_fwd[
                w1
            ] / c1[w1] * pc
        else:
            p = pc
        total += round(math.log(p) * 1e6)
    return total


def _bigrams(text):
    ws = [w for w in text.split(" ") if w]
    return list(zip(ws, ws[1:]))


def test_kneser_ney_matches_independent_reference(spark):
    from dlp_rdb_bq_import_spark.operators.text import (
        kneser_ney_lm_scores,
        ngram_lm_counts,
    )

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(40)]
    train_docs = [
        (100 + i, " ".join(rng.choice(vocab, 30))) for i in range(20)
    ]
    score_docs = [
        (i, " ".join(rng.choice(vocab + ["unseen1", "unseen2"], 25)))
        for i in range(5)
    ]
    tr = spark.createDataFrame(train_docs, "doc_id long, text string")
    sc = spark.createDataFrame(score_docs, "doc_id long, text string")
    lm = ngram_lm_counts(tr, min_count=1)
    out = {r.doc_id: r for r in kneser_ney_lm_scores(sc, lm).collect()}
    train_bg = [b for _, t in train_docs for b in _bigrams(t)]
    for i, text in score_docs:
        ref = _kn_ref(train_bg, _bigrams(text))
        assert out[i].logprob_micro == ref, i
        assert out[i].n_bigrams == len(_bigrams(text))


def test_kneser_ney_fixes_the_francisco_case(spark):
    """'francisco' is frequent but follows ONLY 'san'; 'common' is less
    frequent but follows many contexts. After an unseen context, KN
    must prefer 'common' (high continuation), while add-k prefers the
    raw-frequency word — the textbook discrimination."""
    from dlp_rdb_bq_import_spark.operators.text import (
        kneser_ney_lm_scores,
        ngram_lm_counts,
        ngram_lm_scores,
    )

    train = " ".join(["san francisco"] * 30 + [
        f"{w} common" for w in ("a", "b", "c", "d", "e", "f", "g", "h")
    ])
    tr = spark.createDataFrame([(1, train)], "doc_id long, text string")
    lm = ngram_lm_counts(tr)
    probe = spark.createDataFrame(
        [(10, "novelword francisco"), (11, "novelword common")],
        "doc_id long, text string",
    )
    kn = {r.doc_id: r.logprob_micro for r in kneser_ney_lm_scores(probe, lm).collect()}
    addk = {r.doc_id: r.logprob_micro for r in ngram_lm_scores(probe, lm).collect()}
    assert kn[11] > kn[10]  # KN: versatile word wins after unseen context
    assert addk[10] >= addk[11]  # add-k: can't tell (uniform floor) or
    # prefers the frequent one — either way it does NOT prefer 'common'


def test_unseen_mass_and_zipf(spark):
    from dlp_rdb_bq_import_spark.operators.text import (
        unseen_mass_estimate,
        zipf_slope,
    )

    # exact pin: 3 singletons, 7 tokens
    df = spark.createDataFrame(
        [(1, "a a b b c d e")], "doc_id long, text string"
    )
    r = unseen_mass_estimate(df, "text").collect()[0]
    assert (r.n_tokens, r.vocab, r.singletons) == (7, 5, 3)
    assert r.p_unseen == pytest.approx(3 / 7)
    # planted power law: freq(rank r) = round(1000 / r) -> slope ~ -1
    words = []
    for rank in range(1, 101):
        words += [f"z{rank:03d}"] * max(1, round(1000 / rank))
    zdf = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    z = zipf_slope(zdf, "text").collect()[0]
    assert z.n_words == 100
    assert z.slope == pytest.approx(-1.0, abs=0.05)
    # numpy least-squares reference on the same micro-quantized points
    per = {}
    for w in words:
        per[w] = per.get(w, 0) + 1
    ranked = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.array([round(math.log(i + 1) * 1e6) for i in range(len(ranked))])
    y = np.array([round(math.log(c) * 1e6) for _, c in ranked])
    n = len(x)
    slope_ref = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    assert z.slope == pytest.approx(slope_ref, abs=1e-9)
    # empty -> NULL slope
    e = spark.createDataFrame([(1, "only")], "doc_id long, text string")
    assert zipf_slope(e, "text").collect()[0].slope is None


def test_column_entropy_profile_matches_numpy(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import (
        column_entropy_profile,
    )

    rng = np.random.RandomState(3)
    a = rng.choice(["x", "y", "z"], 300, p=[0.7, 0.2, 0.1])
    b = ["const"] * 300
    df = spark.createDataFrame(
        [(str(u), str(v)) for u, v in zip(a, b)], "a string, b string"
    )
    rows = {r.col_name: r for r in column_entropy_profile(df, ["a", "b"]).collect()}

    def h(vals):
        _, counts = np.unique(vals, return_counts=True)
        p = counts / counts.sum()
        return float(-(p * np.log(p)).sum())

    assert rows["a"].entropy_nats == pytest.approx(h(a), abs=5e-6)
    assert rows["a"].norm_entropy == pytest.approx(h(a) / math.log(3), abs=5e-6)
    # constant column: zero up to the micro-log quantization residue
    # (round(ln n · 1e6)/1e6 vs ln n — bounded by 5e-7 by construction)
    assert abs(rows["b"].entropy_nats) <= 5e-7
    assert rows["b"].norm_entropy is None
    assert rows["a"].n == 300 and rows["a"].n_distinct == 3
    with pytest.raises(ValueError, match="at least one"):
        column_entropy_profile(df, [])
    with pytest.raises(ValueError, match="not in input"):
        column_entropy_profile(df, ["nope"])
