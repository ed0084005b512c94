#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the flagship aggregation, two multiway joins, window/
session analytics, and the LLM-data operators (minhash near-dup, knn,
text analysis) — the mix a 100 TB training-data pipeline actually runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dlp_rdb_bq_import_spark import harness
from dlp_rdb_bq_import_spark.session import get_spark

BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume_customer",
    "tpch_q21_waiting_supplier",
    "topk_per_group",
    "sessionize",
    "batch_window_agg",
    "dedup_exact",
    "dedup_incremental",
    "dedup_incremental_minhash",
    "incremental_curation",
    "decontaminate_overlap",
    "sequence_packing",
    "semantic_dedup",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "kcore_supplier",
    "communities_supplier",
    "multimodal_header_probe",
    "embedding_neardup_lsh",
    "knn_bruteforce_topk",
    "knn_lsh_topk",
    "text_analysis",
    "winnow_fingerprints",
    # round 3 additions: curation/layout stages + real media decode
    "domain_cap",
    "text_normalize",
    "zorder_key",
    "multimodal_features",
    "dedup_clusters_exact",
    "reid_pipeline",
    # round 3 additions: temporal joins + rollup + keyword extraction
    "asof_click_signup",
    "incident_overlap_join",
    "rollup_cascade",
    "tfidf_top_terms",
    "skew_report",
    # round 3 additions: warehouse/feature-engineering surface
    "scd2_pit_lookup",
    "data_expectations",
    "length_outliers",
    "global_row_ids",
    "vocab_encode_words",
    "chunk_documents",
    # round 4 additions: substring-level + within-doc dedup
    "dedup_substring",
    "dedup_paragraphs",
    # round 4 additions: timeseries/stats/itemsets/PCA surface
    "resample_gapfill",
    "cohort_retention",
    "numeric_correlations",
    "ngram_novelty",
    "frequent_item_pairs",
    "embedding_pca",
    # round 4 additions: graph/rules/markov/quantization surface
    "supplier_triangles",
    "association_rules",
    "event_transitions",
    "embedding_quantize_int8",
    "mad_price_outliers",
    "image_phash",
    "detect_gaps",
    "lateral_topk_orders",
    "tfidf_cosine_pairs",
    "bm25_topk_docs",
    "bm25_batch_topk",
    "heavy_hitter_terms",
    "contamination_spans",
    "kcenter_diversity_sample",
    "hll_distinct_rollup",
    "snapshot_diff",
    "interval_concurrency",
    "pareto_part_revenue",
    "hopping_window_agg",
    "period_over_period",
    "balance_event_classes",
    "impute_median",
    "k_anonymity",
    "l_diversity",
    "table_checksum",
    "order_lifecycle",
    "session_bounce_stats",
    "dedup_containment",
    # round 7 additions: tokenizer loop, incremental decontam, LM
    # quality filtering, hybrid retrieval, distance-2 fuzzy matching
    "bpe_encode",
    "tokenize_and_pack",
    "decontam_incremental",
    # lm_quality_gate subsumes lm_quality_scores (same train+score plus
    # the percentile gate); the scorer alone stays registry/gate-only
    "lm_quality_gate",
    "hybrid_retrieval_rrf",
    "fuzzy_name_pairs_k2",
    # the bounded production form; record_linkage_scores (full audit
    # output, quadratic in name-collision density) stays registry-only
    "record_linkage_review",
    "knn_ivf_incremental",
    # round 8: boilerplate extraction (subsumes html_block_classify —
    # same segmentation + features plus the reassembly groupBy), the
    # composed web path (extract → mojibake → quality → dedup), URL
    # dedup, corpus PII scrub, embedding outliers, leakage-safe split
    "html_extract_main",
    "web_curation_pipeline",
    "url_dedup",
    "pii_scrub",
    "embedding_outliers",
    "leakage_safe_split",
    # round 8: trainable NB classifier, embedding-space decontam,
    # cluster-balanced coreset, CCNet perplexity-bucketed mixture
    "nb_classify_lang",
    "semantic_decontam_lsh",
    "cluster_balanced_sample",
    "perplexity_bucket_mixture",
    "dsir_select",
    "blocklist_screen",
    "cms_term_estimates",
    "balanced_file_layout",
    # round 8 (late): entity consolidation on top of linkage matches,
    # the persisted-FastSS incremental linkage probe, link-graph crawl
    # prioritization, budget-bounded mixture, contrastive mining,
    # char entropy
    "entity_golden_records",
    "linkage_incremental",
    "crawl_prioritized_frontier",
    "token_budget_mixture",
    "contrastive_mining",
    "char_entropy",
    "schema_drift",
    "streaming_linkage",
    "entity_incremental",
    "funnel_analysis",
    "rake_keywords",
    "ab_test_purchase",
    # round 9: inbound anchor-text signal (subsumes
    # html_link_text_extract — same extraction plus the index
    # groupBy), robots screening, whole-document BFD bin packing
    "anchor_text_index",
    "robots_screen",
    "bin_packed_sequences",
    "fd_discovery",
    "inclusion_deps",
    "group_quantiles",
    "markdown_extract_text",
    "code_normalize",
    "anchor_bm25_topk",
    # round 10: link-authority second axis + seed distance, LM
    # retrieval, collocations, key discovery, structured-table
    # harvest, CCNet line dedup, EWMA monitoring
    "host_hits_scores",
    "host_distance_bfs",
    "query_likelihood_topk",
    "pmi_collocations",
    "ucc_discovery",
    "benford_first_digit",
    "html_table_extract",
    "sitemap_extract",
    "corpus_line_dedup",
    "ewma_anomaly",
    "cdc_chunks",
    "salted_group_stats",
    "kmeans_clusters",
    "sorted_neighborhood_pairs",
    "classifier_auc",
    "phrase_search",
    "quantile_binning",
    "streaming_ewma",
    "t_closeness",
    "kmv_set_overlap",
    "host_weighted_sssp",
    "unigram_lm_vocab",
    "unigram_encode_tokens",
    "bloom_semi_join",
    "calibration_curve",
    # round 11: linkage JW verify, DP release, mergeable quantile
    # digest (build + two-slice fold), CUBE grains, Holt forecaster,
    # pre-flight join sizing, baseline-JPEG decode, schema evolution
    "jaro_winkler_pairs",
    "dp_noisy_counts",
    "quantile_digest",
    "digest_merge_fold",
    "cube_rollup_revenue",
    "holt_linear_forecast",
    "join_size_report",
    "jpeg_decode_features",
    "schema_evolution_plan",
    "cohens_kappa",
    "personalized_pagerank_seeds",
    "streaming_quantile_digest",
    "classification_report",
    "mutual_information",
    "ndcg_retrieval_eval",
    "psi_drift",
    "chi_square_independence",
    # round 11 wave 3: two-sample tests + concentration + series decomposition
    "ks_drift_test",
    "mann_whitney_priority",
    "gini_revenue_concentration",
    "cusum_shift_detection",
    "acf_daily_revenue",
    "seasonal_decompose_revenue",
    "target_encoding_priority",
    "hashed_text_features",
    "skyline_parts",
    "isotonic_calibration",
    "gif_decode_features",
    "hilbert_layout",
    "embedding_random_projection",
    "connected_components_star",
    "streaming_skyline",
    "vocab_js_divergence",
    "trimmed_mean_prices",
    "soundex_blocking",
    "kneser_ney_scores",
    "unseen_mass_estimate",
    "zipf_slope",
    "column_entropy_profile",
    "streaming_connected_components",
    "theil_sen_trend",
    "image_channel_histogram",
    "weighted_median_price",
    "kaplan_meier_retention",
    "cuped_purchase_value",
    "poisson_bootstrap_se",
    "conversion_wilson_ci",
    "mann_kendall_trend",
    "g_test_independence",
    # round 12 additions: rank statistics, corpus richness, graph structure
    "spearman_price_quantity",
    "kruskal_wallis_priority_price",
    "cliffs_delta_returnflag",
    "chao1_vocab_richness",
    "bigram_repetition",
    "degree_assortativity",
    "common_neighbors_suppliers",
    "woe_iv_source_lang",
    "flesch_readability",
    "twap_user_value",
    "mad_outliers_event_value",
    "streaming_twap",
    "progressive_jpeg_parity",
    "mcnemar_paired_models",
    "brier_score_decomposition",
    "cumulative_gains_deciles",
    "logrank_churn_test",
    "rfm_user_segments",
    "user_burstiness",
    "cohens_d_priority_price",
    "odds_ratio_source_flag",
    "cronbach_alpha_quality_items",
    "hosmer_lemeshow_calibration",
    "brown_forsythe_returnflag_price",
    "kendall_tau_quantity_discount",
    "max_drawdown_daily_revenue",
    "ols_trend_daily_revenue",
    "supplier_clustering_coefficient",
    "kfold_target_encoding_priority",
    "scale_features_acctbal",
    "lexical_richness_corpus",
    "mrr_map_retrieval_eval",
    "jonckheere_priority_trend",
    "streaming_ols_trend",
    "streaming_max_drawdown",
    "pacf_daily_revenue",
    "benjamini_hochberg_fdr",
    "mantel_haenszel_source_by_lang",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    qs = harness.queries()

    # warm the JVM/codegen path once (not counted)
    spark.range(1000).count()

    # Min-of-2 per query (min-of-3 when sub-second, where host jitter
    # is the same order as the runtime): first-run numbers fold in
    # codegen compilation and OS page-cache misses that a steady-state
    # pipeline never pays; the min reports the reproducible cost.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best, rows, run = None, 0, 0
        while run < 2 or (run < 3 and best < 1.0):
            run += 1
            # isolate queries from each other's lingering cached
            # relations (operators may cache intermediates within a
            # plan; leaked caches skew later Arrow-heavy queries badly)
            spark.catalog.clearCache()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            rows = df.count()  # materialize fully
            elapsed = round(time.time() - t0, 3)
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = best
        print(f"# {name}: {rows} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full 3-decimal detail goes to .scratch/; the driver-visible line
    # must stay within the driver's 2000-char tail-capture buffer
    # (BENCH_r05 was lost to truncation), so the inline per-query dict
    # is 2-decimal compact JSON, and if it still would not fit the
    # FASTEST queries are dropped from the line (they remain in the
    # detail file) with a queries_omitted count.
    scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch")
    os.makedirs(scratch, exist_ok=True)
    detail_path = os.path.join(scratch, "bench_detail.json")
    with open(detail_path, "w") as fh:
        json.dump(
            {"metric": "headline_queries_total_time", "value": total,
             "unit": "sec", "queries": timings, "sf": sf_val},
            fh, indent=1,
        )

    def line_for(q: dict[str, float], omitted: int) -> str:
        payload = {
            "metric": "headline_queries_total_time",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in q.items()},
            "sf": sf_val,
        }
        if omitted:
            payload["queries_omitted"] = omitted
        return json.dumps(payload, separators=(",", ":"))

    shown = dict(timings)
    by_speed = sorted(timings, key=timings.get)
    while len(line_for(shown, len(timings) - len(shown))) > 1800 and shown:
        shown.pop(by_speed[len(timings) - len(shown)])
    print(line_for(shown, len(timings) - len(shown)))
    spark.stop()


if __name__ == "__main__":
    main()
