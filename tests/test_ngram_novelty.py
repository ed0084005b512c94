"""Unit tests for text.ngram_novelty: planted boilerplate detection,
short-doc handling, hashed-gram parity, and plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.text import ngram_novelty


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_planted_boilerplate_scores_low(spark):
    shared = "all rights reserved contact us for details"
    docs = _docs(
        spark,
        [
            f"alpha beta gamma delta {shared}",
            f"epsilon zeta eta theta {shared}",
            "iota kappa lam mu nu xi omicron pi",  # fully unique
        ],
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    # doc 2 shares no bigram with anyone -> fully novel
    assert out[2]["unique_fraction"] == 1.0
    # docs 0/1 share the boilerplate bigrams -> strictly less novel
    assert out[0]["unique_fraction"] < 1.0
    assert out[1]["unique_fraction"] < 1.0
    # the shared span contributes 6 bigrams of doc 0's 10
    assert out[0]["n_ngrams"] == 10
    assert out[0]["n_unique_ngrams"] == out[0]["n_distinct_ngrams"] - 6


def test_short_docs_yield_zero_counts_null_fraction(spark):
    docs = _docs(spark, ["solo", "two words here"])
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert out[0]["n_ngrams"] == 0
    assert out[0]["unique_fraction"] is None
    assert out[1]["n_ngrams"] == 2


def test_duplicate_grams_within_doc_counted_once_for_df(spark):
    # "a b a b" contains bigram "a b" twice; a second doc also has it.
    # df must be 2 (docs), not 3 (occurrences).
    docs = _docs(spark, ["a b a b", "a b c d"])
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert out[0]["n_ngrams"] == 3  # "a b", "b a", "a b"
    assert out[0]["n_distinct_ngrams"] == 2
    assert out[0]["n_unique_ngrams"] == 1  # only "b a"


def test_hashed_grams_match_string_grams(spark):
    docs = _docs(
        spark,
        ["the quick brown fox", "the quick red fox", "lorem ipsum dolor sit amet"],
    )
    a = {tuple(r) for r in ngram_novelty(docs).collect()}
    b = {tuple(r) for r in ngram_novelty(docs, hash_grams=True).collect()}
    assert a == b


def test_trigram_mode(spark):
    docs = _docs(spark, ["a b c d", "x y"])
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[0]["n_ngrams"] == 2  # "a b c", "b c d"
    assert out[1]["n_ngrams"] == 0  # shorter than n


def test_reserved_name_raises(spark):
    docs = _docs(spark, ["a b"]).withColumn("n_ngrams", _one())
    with pytest.raises(ValueError, match="reserved"):
        ngram_novelty(docs)


def _one():
    from pyspark.sql import functions as F

    return F.lit(1)


def test_no_cartesian_in_plan(spark):
    docs = _docs(spark, ["a b c", "c d e"])
    plan = ngram_novelty(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
