"""Regression tests for the round-10 ADVICE items (round 11).

Each test pins one of the five advisory fixes:
  1. bloom_filtered_semi_join — cross-type keys must not produce Bloom
     false negatives; reserved-name guard on _h/_bloom.
  2. _viterbi_segment / unigram_encode — unseen characters fall back to
     single-char pieces at a floor log-prob instead of crashing.
  3. hits() — iterations/norm_every validation at entry.
  4. t_closeness_report / classifier_auc — exact numerators computed in
     DECIMAL(38,0) (values unchanged at small scale; overflow-safe).
  5. salted_aggregate — duplicate-alias and _salt reserved-name guards.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. bloom_filtered_semi_join cross-type keys + reserved names
# ---------------------------------------------------------------------------


def test_bloom_semi_join_cross_type_keys_no_false_negatives(spark):
    """INT keys on one side, BIGINT on the other: every plain-semi-join
    match must survive the Bloom screen (xxhash64 is type-dependent on
    native encodings, so the fix hashes a common string rendering)."""
    from dlp_rdb_bq_import_spark.operators.joins import bloom_filtered_semi_join

    big = spark.createDataFrame([(i,) for i in range(1000)], "k int")
    small = spark.createDataFrame([(int(i),) for i in range(0, 1000, 7)], "k long")
    got = sorted(
        r.k for r in bloom_filtered_semi_join(big, small, "k").collect()
    )
    want = sorted(
        r.k for r in big.join(small.select(F.col("k").cast("int")), "k", "leftsemi").collect()
    )
    assert got == want and len(got) == len(range(0, 1000, 7))


def test_bloom_semi_join_reserved_name_guard(spark):
    from dlp_rdb_bq_import_spark.operators.joins import bloom_filtered_semi_join

    big = spark.createDataFrame([(1, 2)], "k int, _h int")
    small = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="_h"):
        bloom_filtered_semi_join(big, small, "k")


# ---------------------------------------------------------------------------
# 2. unigram encode with unseen characters
# ---------------------------------------------------------------------------


def test_viterbi_unseen_char_falls_back_to_single_char():
    from dlp_rdb_bq_import_spark.operators.text import _viterbi_segment

    logp = {"a": -1.0, "b": -1.0, "ab": -0.5}
    # 'x' and 'q' are absent from the vocab: must still segment, with
    # the unknowns emitted as single-char pieces and known substrings
    # still segmented optimally.
    assert _viterbi_segment("axb", logp, 2) == ["a", "x", "b"]
    assert _viterbi_segment("qq", logp, 2) == ["q", "q"]
    assert _viterbi_segment("abx", logp, 2) == ["ab", "x"]
    # Known segmentations never lose to the floor path.
    assert _viterbi_segment("ab", logp, 2) == ["ab"]


def test_unigram_encode_cross_corpus_does_not_crash(spark):
    from dlp_rdb_bq_import_spark.operators.text import (
        unigram_encode,
        unigram_lm_learn,
    )

    train = spark.createDataFrame(
        [("aa ab ba bb aab abb",)] * 4, "text string"
    )
    vocab = unigram_lm_learn(train, vocab_size=8, max_piece_len=3, min_freq=1)
    # 'z' never appeared in training; the encode must not crash and the
    # unknown char must come through as its own piece.
    test = spark.createDataFrame([(1, "az zb zzz")], "doc_id long, text string")
    out = unigram_encode(test, vocab, text_col="text").collect()
    pieces = [r.piece for r in sorted(out, key=lambda r: r.token_ord)]
    assert "z" in pieces
    # concatenation invariant survives the unknown-char path
    assert "".join(pieces) == "azzbzzz"


# ---------------------------------------------------------------------------
# 3. hits() parameter validation
# ---------------------------------------------------------------------------


def test_hits_validates_parameters(spark):
    from dlp_rdb_bq_import_spark.operators.graph import hits

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits(edges, iterations=0)
    with pytest.raises(ValueError, match="norm_every"):
        hits(edges, norm_every=0)


# ---------------------------------------------------------------------------
# 4. decimal-exact numerators (values unchanged at small scale)
# ---------------------------------------------------------------------------


def test_t_closeness_decimal_path_matches_python(spark):
    rows = [("a", v) for v in ["x"] * 6 + ["y"] * 2] + [
        ("b", v) for v in ["x"] * 2 + ["y"] * 6
    ]
    from dlp_rdb_bq_import_spark.operators.privacy import t_closeness_report

    df = spark.createDataFrame(rows, "qi string, s string")
    got = {r.qi: r.tvd for r in t_closeness_report(df, ["qi"], "s").collect()}
    # global: x=8/16, y=8/16; class a: x=6/8 ⟹ tvd = |6/8-1/2| = 0.25
    assert got == {"a": 0.25, "b": 0.25}


def test_classifier_auc_score_round_bounds_cardinality(spark):
    from dlp_rdb_bq_import_spark.operators.profiling import classifier_auc

    rows = [(i / 997.0, i % 3 == 0) for i in range(997)]
    df = spark.createDataFrame(rows, "s double, l boolean")
    exact = classifier_auc(df, "s", "l").collect()[0].auc
    rounded = classifier_auc(df, "s", "l", score_round=2).collect()[0].auc
    # rounding to 2 decimals merges ~10 raw scores per bucket; the tie
    # term keeps the estimate within the bucket mass of the exact AUC
    assert abs(exact - rounded) < 0.02
    with pytest.raises(ValueError, match="score_round"):
        classifier_auc(df, "s", "l", score_round=-1)


# ---------------------------------------------------------------------------
# 5. salted_aggregate guards
# ---------------------------------------------------------------------------


def test_salted_aggregate_duplicate_alias_guard(spark):
    from dlp_rdb_bq_import_spark.operators.common import salted_aggregate

    df = spark.createDataFrame([(1, 2.0, 3.0)], "k int, a double, b double")
    with pytest.raises(ValueError, match="duplicate"):
        salted_aggregate(df, ["k"], [("a", "count"), ("b", "count")])
    with pytest.raises(ValueError, match="duplicate"):
        salted_aggregate(df, ["k"], [("a", "sum"), ("a", "sum")])


def test_salted_aggregate_salt_column_guard(spark):
    from dlp_rdb_bq_import_spark.operators.common import salted_aggregate

    df = spark.createDataFrame([(1, 2.0)], "k int, _salt double")
    with pytest.raises(ValueError, match="_salt"):
        salted_aggregate(df, ["k"], [("_salt", "sum")])
