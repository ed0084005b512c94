"""Empty-input robustness: every operator must plan and execute on a
zero-row DataFrame (the failure mode that bites at 3 a.m. when one
incremental batch is empty — driver actions at plan time and
first()-based dimension sniffing both die here)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dlp_rdb_bq_import_spark.operators import dedup, sampling, similarity
from dlp_rdb_bq_import_spark.operators import text as text_ops
from dlp_rdb_bq_import_spark.operators.cdc import apply_changes, merge_upsert
from dlp_rdb_bq_import_spark.operators.profiling import profile_table


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture()
def empty_vecs(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_dedup_ops_on_empty(spark, empty_docs):
    assert dedup.minhash_dedup_pairs(empty_docs, "text", "doc_id").count() == 0
    assert dedup.simhash_neardup_pairs(empty_docs, "text", "doc_id").count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, "text", "doc_id").count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.duplicate_clusters(pairs).count() == 0
    assert dedup.dedup_keep_representative(empty_docs, pairs, "doc_id").count() == 0


def test_similarity_ops_on_empty(spark, empty_vecs):
    assert similarity.sign_lsh_bands(empty_vecs).count() == 0
    assert similarity.embedding_neardup_pairs(empty_vecs).count() == 0
    assert similarity.lsh_topk(empty_vecs, empty_vecs).count() == 0
    # IVF cannot train a quantizer on nothing — a clear error, not a crash
    with pytest.raises(ValueError, match="empty corpus"):
        similarity.train_ivf_centroids(empty_vecs)


def test_text_and_sampling_on_empty(spark, empty_docs):
    assert text_ops.analyze_documents(empty_docs).count() == 0
    assert text_ops.gopher_quality_flags(empty_docs).count() == 0
    assert text_ops.winnowing_fingerprint_rows(empty_docs).count() == 0
    assert sampling.deterministic_sample(empty_docs, "doc_id", 0.5).count() == 0


def test_cdc_and_profile_on_empty(spark):
    base = spark.createDataFrame([], "k long, v long")
    changes = spark.createDataFrame([], "k long, v long, _op string, _seq long")
    assert merge_upsert(base, base.drop("v").limit(0).withColumn("v", F.lit(0)), ["k"]).count() == 0
    assert apply_changes(base, changes, ["k"]).count() == 0
    prof = {r["col_name"]: r for r in profile_table(base).collect()}
    assert prof["k"]["n_rows"] == 0 and prof["k"]["n_distinct"] == 0


def test_stateful_sessionize_empty_input(spark, tmp_path):
    """An events dir with zero rows must yield an empty session frame
    (not a TypeError on the sentinel timestamp arithmetic)."""
    from dlp_rdb_bq_import_spark.streaming.jobs import stateful_sessionize

    src = str(tmp_path / "events")
    spark.createDataFrame([], "event_id long, ts timestamp, user_id long").write.parquet(src)
    out = stateful_sessionize(spark, src)
    assert out.count() == 0
    assert set(out.columns) == {
        "user_id", "session_start", "session_end", "n_events", "first_event",
    }


def test_round4_operators_on_empty(spark, empty_docs, empty_vecs):
    from dlp_rdb_bq_import_spark.operators.cdc import snapshot_diff
    from dlp_rdb_bq_import_spark.operators.graph import kcore, label_propagation
    from dlp_rdb_bq_import_spark.operators.privacy import (
        k_anonymity_report,
        l_diversity_report,
    )
    from dlp_rdb_bq_import_spark.operators.profiling import (
        impute_group_median,
        mad_outliers,
        pareto_class,
    )
    from dlp_rdb_bq_import_spark.operators.sampling import balance_classes
    from dlp_rdb_bq_import_spark.operators.text import tfidf_cosine_pairs
    from dlp_rdb_bq_import_spark.operators.timeseries import (
        detect_gaps,
        interval_concurrency,
        period_over_period,
    )

    assert tfidf_cosine_pairs(empty_docs).count() == 0
    e = spark.createDataFrame([], "src long, dst long")
    assert kcore(e, k=2).count() == 0
    assert label_propagation(e).count() == 0
    kv = spark.createDataFrame([], "g string, v double")
    assert mad_outliers(kv, "v", ["g"]).count() == 0
    assert impute_group_median(kv, "v", ["g"]).count() == 0
    assert pareto_class(kv, item_cols=["g"], value_col="v").count() == 0
    assert k_anonymity_report(kv, ["g"]).count() == 0
    assert l_diversity_report(kv, ["g"], "v").count() == 0
    assert balance_classes(kv.withColumn("k", F.lit(1)), key_col="k",
                           class_col="g").count() == 0
    assert snapshot_diff(kv, kv, ["g"], ["v"]).count() == 0
    ts = spark.createDataFrame([], "user_id long, ts timestamp, event_id long")
    assert detect_gaps(ts, key_col="user_id", ts_col="ts",
                       min_gap_seconds=60, order_cols=["event_id"]).count() == 0
    iv = spark.createDataFrame([], "s timestamp, e timestamp")
    assert interval_concurrency(iv, start_col="s", end_col="e").count() == 0
    pp = spark.createDataFrame([], "ts timestamp, v double")
    assert period_over_period(pp, ts_col="ts", value_col="v").count() == 0
