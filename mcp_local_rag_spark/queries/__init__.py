"""Driver-facing query registry.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string (or None for non-SQL-expressible ops).
Importing the submodules populates REGISTRY via the @register decorator.
"""

from .common import REGISTRY  # noqa: F401
from . import rag  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import ext  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import parsing  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import warehouse  # noqa: F401,E402
from . import contracts  # noqa: F401,E402


# Rotation against the driver's per-round check window (50 queries/round):
# never-verified queries go FIRST, then the queries whose last green row is
# OLDEST (round 1 only), then the ones re-verified most recently (round 2).
# Every registry entry keeps a green row at most two rounds old, so silent
# regressions in "settled" queries still surface. Update these sets each
# round from the latest CORRECTNESS_r{N}.json.
_VERIFIED_R1 = {
    "agg_per_file", "bm25_ngram23", "bm25_unigram", "chunk_documents",
    "content_hash", "corpus_stats", "dedup_embedding_cosine", "dedup_exact",
    "dedup_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "distinct_event_types", "documents_cube", "embedding_centroids",
    "embedding_confusion", "events_hourly", "events_json_extract",
    "events_sessionize", "first_event_per_user", "gap_stats",
    "grouping_similar", "hybrid_search", "keyword_boost", "knn_bruteforce",
    "knn_ivf_probe", "list_cross_reference", "median_pairwise_sim",
    "neighbors_frame", "null_normalization", "orphan_customers",
    "percentile_by_lang", "range_read", "scalar_funcs", "scan_projection",
    "semi_join_candidates", "sync_counters", "sync_plan", "text_fingerprint",
    "text_langid", "text_quality", "text_token_stats", "tpch_q18_big_orders",
    "tpch_q1_pricing", "tpch_q3_topk", "tpch_q5_region", "tpch_q6_selective",
    "vector_topk", "vector_topk_scoped", "viewers_never_purchased",
    "window_rank_orders",
}

_VERIFIED_R2 = {
    "bm25_ngram23", "bm25_unigram", "caption_postprocess", "chunk_documents",
    "customer_balance_deciles", "dedup_clusters", "documents_length_histogram",
    "documents_profile", "events_asof_lastclick", "events_error_rate",
    "events_funnel", "events_moving_avg", "events_range_prev_hour",
    "events_resample_ffill", "events_retention", "events_rollup",
    "events_salted_agg", "events_topk_per_group", "gap_stats",
    "grouping_similar", "hybrid_search", "keyword_boost",
    "knn_ivf_multiprobe", "list_cross_reference", "median_pairwise_sim",
    "neighbors_frame", "null_normalization", "parsed_docx_roundtrip",
    "parsed_html_roundtrip", "part_fuzzy_pairs", "range_read",
    "tpch_q10_returns", "tpch_q11_important_stock", "tpch_q12_priority_lines",
    "tpch_q13_custdist", "tpch_q14_promo", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt", "tpch_q17_small_qty", "tpch_q19_brackets",
    "tpch_q20_blue_suppliers", "tpch_q21_sole_late", "tpch_q22_idle_rich",
    "tpch_q2_best_supplier", "tpch_q4_priority", "tpch_q7_volume",
    "tpch_q8_mktshare", "tpch_q9_profit", "vector_topk", "vector_topk_scoped",
}


_VERIFIED_R3 = {
    "agg_per_file", "bm25_ngram23", "bm25_unigram", "content_hash",
    "corpus_decontaminate", "corpus_split_assign", "corpus_stats",
    "dedup_embedding_cosine", "dedup_exact", "dedup_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "distinct_event_types",
    "documents_cube", "documents_pack_bins", "embedding_centroids",
    "embedding_confusion", "embeddings_quantized_topk", "events_hourly",
    "events_json_extract", "events_sessionize", "first_event_per_user",
    "gap_stats", "grouping_similar", "keyword_boost", "knn_bruteforce",
    "knn_ivf_probe", "list_cross_reference", "null_normalization",
    "orphan_customers", "parsed_pdf_roundtrip", "percentile_by_lang",
    "scalar_funcs", "scan_projection", "semi_join_candidates", "sync_counters",
    "sync_plan", "text_fingerprint", "text_langid", "text_quality",
    "text_token_stats", "tpch_q18_big_orders", "tpch_q1_pricing",
    "tpch_q3_topk", "tpch_q5_region", "tpch_q6_selective", "vector_topk",
    "vector_topk_scoped", "viewers_never_purchased", "window_rank_orders",
}


_VERIFIED_R4 = {
    "caption_postprocess", "chunk_documents", "corpus_stratified_sample",
    "customer_balance_deciles", "dedup_clusters", "documents_length_histogram",
    "documents_profile", "events_asof_lastclick", "events_error_rate",
    "events_funnel", "events_moving_avg", "events_range_prev_hour",
    "events_resample_ffill", "events_retention", "events_rollup",
    "events_salted_agg", "events_sessionize", "events_topk_per_group",
    "hybrid_search", "knn_bruteforce", "knn_ivf_multiprobe",
    "median_pairwise_sim", "neighbors_frame", "parsed_csv_roundtrip",
    "parsed_docx_roundtrip", "parsed_html_roundtrip", "parsed_jsonl_roundtrip",
    "part_fuzzy_pairs", "range_read", "text_gopher_filter", "text_pii_redact",
    "text_repetition", "text_winnowing", "tpch_q10_returns",
    "tpch_q11_important_stock", "tpch_q12_priority_lines", "tpch_q13_custdist",
    "tpch_q14_promo", "tpch_q15_top_supplier", "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty", "tpch_q19_brackets", "tpch_q20_blue_suppliers",
    "tpch_q21_sole_late", "tpch_q22_idle_rich", "tpch_q2_best_supplier",
    "tpch_q4_priority", "tpch_q7_volume", "tpch_q8_mktshare", "tpch_q9_profit",
    "vector_topk", "vector_topk_scoped",
}


_VERIFIED_R5 = {
    "agg_per_file", "bm25_ngram23", "bm25_unigram", "content_hash",
    "corpus_boilerplate_ngrams", "corpus_mixture_weights", "corpus_stats",
    "corpus_weighted_sample", "corpus_zipf_slope", "dedup_embedding_cosine",
    "dedup_exact", "dedup_jaccard", "dedup_keep_list",
    "dedup_minhash_incremental", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_pairs", "distinct_event_types", "events_countmin_freq",
    "events_hll_distinct", "events_hourly", "events_hourly_anomalies",
    "events_json_extract", "events_session_window_native",
    "events_value_quantiles_hist", "first_event_per_user", "gap_stats",
    "grouping_similar", "hybrid_search_indexed", "keyword_boost",
    "knn_lsh_hyperplane", "knn_truncated_rerank", "list_cross_reference",
    "null_normalization", "orphan_customers", "percentile_by_lang",
    "scalar_funcs", "scan_projection", "semi_join_candidates",
    "sync_counters", "sync_plan", "text_unigram_logprob",
    "tpch_q18_big_orders", "tpch_q1_pricing", "tpch_q3_topk",
    "tpch_q5_region", "tpch_q6_selective", "vector_topk_batch",
    "viewers_never_purchased", "window_rank_orders",
}


_VERIFIED_R7 = {
    "bm25_term_bucketed", "caption_postprocess", "corpus_curation_funnel",
    "corpus_curation_pipeline", "corpus_decontaminate",
    "corpus_decontaminate_fuzzy", "corpus_dsir_weights",
    "corpus_epoch_plan", "corpus_source_entropy", "corpus_source_overlap",
    "corpus_split_assign", "dedup_clusters", "dedup_graph_pagerank",
    "dedup_graph_triangles", "dedup_semantic_keep_list", "documents_cube",
    "documents_length_histogram", "documents_pack_bins",
    "embedding_centroids", "embedding_confusion",
    "embeddings_quantized_topk", "events_bloom_prune",
    "events_cohort_matrix", "events_heavy_hitters",
    "events_markov_transitions", "events_sessionize", "hybrid_search",
    "hybrid_search_batch", "knn_bruteforce", "knn_hard_negatives",
    "knn_ivf_indexed", "knn_ivf_probe", "knn_recall_report",
    "median_pairwise_sim", "neighbors_frame", "parsed_pdf_roundtrip",
    "parsed_xml_roundtrip", "rag_eval_ndcg", "range_read",
    "text_bigram_logprob", "text_char_entropy", "text_dedup_spans",
    "text_fingerprint", "text_langid", "text_quality",
    "text_tfidf_keywords", "text_token_stats", "vector_topk",
    "vector_topk_scoped",
}


_VERIFIED_R8 = {
    "chunk_documents_oracle", "corpus_ngram_novelty",
    "corpus_stratified_sample", "customer_balance_deciles", "dedup_containment",
    "documents_profile", "events_asof_lastclick", "events_click_attribution",
    "events_error_rate", "events_funnel", "events_moving_avg",
    "events_range_prev_hour", "events_resample_ffill", "events_retention",
    "events_rollup", "events_salted_agg", "events_topk_per_group", "gap_stats",
    "grouping_similar", "knn_ivf_multiprobe", "parsed_csv_roundtrip",
    "parsed_docx_roundtrip", "parsed_html_roundtrip", "parsed_jsonl_roundtrip",
    "part_fuzzy_pairs", "pdf_visual_detect", "text_gopher_filter",
    "text_nb_source_classifier", "text_pii_redact", "text_repetition",
    "text_winnowing", "tpch_q10_returns", "tpch_q11_important_stock",
    "tpch_q12_priority_lines", "tpch_q13_custdist", "tpch_q14_promo",
    "tpch_q15_top_supplier", "tpch_q16_supplier_cnt", "tpch_q17_small_qty",
    "tpch_q19_brackets", "tpch_q20_blue_suppliers", "tpch_q21_sole_late",
    "tpch_q22_idle_rich", "tpch_q2_best_supplier", "tpch_q4_priority",
    "tpch_q7_volume", "tpch_q8_mktshare", "tpch_q9_profit", "vector_topk_batch",
}


_VERIFIED_R10 = {
    "agg_per_file", "bm25_ngram23", "bm25_unigram", "content_hash",
    "corpus_perplexity_buckets", "corpus_shuffle_shards", "corpus_stats",
    "dedup_minhash_estimate", "dedup_rate_by_source", "distinct_event_types",
    "documents_cdf_view", "documents_merge_changes",
    "documents_merge_time_travel", "documents_merge_upsert",
    "documents_point_reads", "documents_secondary_lookup", "embedding_kmeans",
    "events_expectations", "events_expectations_metrics", "events_hourly",
    "events_impressions_unattributed", "events_ivm_hourly",
    "events_ivm_sketches", "events_optimized_range_read",
    "events_scd2_history", "events_theta_audience", "events_zorder_read",
    "first_event_per_user", "hybrid_search_indexed", "keyword_boost",
    "list_cross_reference", "media_audio_features", "media_image_features",
    "media_video_frames", "null_normalization", "orphan_customers",
    "percentile_by_lang", "scalar_funcs", "scan_projection",
    "semi_join_candidates", "sync_counters", "sync_plan",
    "tpch_q18_big_orders", "tpch_q1_pricing", "tpch_q3_topk", "tpch_q5_region",
    "tpch_q6_selective", "viewers_never_purchased", "window_rank_orders",
}


_VERIFIED_R11 = {
    "bm25_term_bucketed", "caption_postprocess", "chunk_documents",
    "corpus_boilerplate_ngrams", "corpus_decontaminate",
    "corpus_mixture_weights", "corpus_split_assign", "corpus_weighted_sample",
    "corpus_zipf_slope", "dedup_clusters", "dedup_embedding_cosine",
    "dedup_exact", "dedup_jaccard", "dedup_keep_list", "dedup_minhash_banded",
    "dedup_minhash_incremental", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_pairs", "documents_cube", "documents_length_histogram",
    "documents_pack_bins", "documents_schema_evolution",
    "documents_secondary_range", "embedding_centroids", "embedding_confusion",
    "embeddings_quantized_topk", "events_countmin_freq", "events_hll_distinct",
    "events_hourly_anomalies", "events_json_extract",
    "events_session_window_native", "events_sessionize",
    "events_value_quantiles_hist", "hybrid_search", "hybrid_search_batch",
    "knn_bruteforce", "knn_ivf_probe", "knn_lsh_hyperplane",
    "knn_truncated_rerank", "median_pairwise_sim", "neighbors_frame",
    "range_read", "text_fingerprint", "text_langid", "text_quality",
    "text_token_stats", "text_unigram_logprob", "vector_topk",
    "vector_topk_scoped",
}


_VERIFIED_R12 = {
    "corpus_curation_funnel", "corpus_curation_pipeline",
    "corpus_decontaminate_fuzzy", "corpus_dsir_weights",
    "corpus_epoch_plan", "corpus_ngram_novelty", "corpus_source_entropy",
    "corpus_source_overlap", "dedup_containment", "dedup_graph_pagerank",
    "dedup_graph_triangles", "dedup_semantic_keep_list",
    "documents_profile", "documents_secondary_asof",
    "documents_table_maintain", "documents_txn_ingest",
    "events_bloom_prune", "events_cohort_matrix", "events_heavy_hitters",
    "events_markov_transitions", "gap_stats", "grouping_related",
    "grouping_similar", "knn_hard_negatives", "knn_ivf_indexed",
    "knn_ivf_multiprobe", "knn_recall_report", "parsed_pdf_roundtrip",
    "parsed_xml_roundtrip", "rag_eval_ndcg", "text_bigram_logprob",
    "text_char_entropy", "text_dedup_spans", "text_tfidf_keywords",
    "tpch_q10_returns", "tpch_q12_priority_lines", "tpch_q13_custdist",
    "tpch_q14_promo", "tpch_q15_top_supplier", "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty", "tpch_q19_brackets", "tpch_q20_blue_suppliers",
    "tpch_q21_sole_late", "tpch_q2_best_supplier", "tpch_q4_priority",
    "tpch_q7_volume", "tpch_q8_mktshare", "tpch_q9_profit",
    "vector_topk_batch",
}



_VERIFIED_R13 = {
    "agg_per_file", "bm25_ngram23", "bm25_unigram", "content_hash",
    "corpus_domain_cap", "corpus_stats", "corpus_stratified_sample",
    "customer_balance_deciles", "documents_index_recovery",
    "embedding_drift_psi", "events_asof_lastclick",
    "events_click_attribution", "events_error_rate", "events_funnel",
    "events_moving_avg", "events_range_prev_hour", "events_resample_ffill",
    "events_retention", "events_rollup", "events_salted_agg",
    "events_topk_per_group", "hybrid_search_indexed", "keyword_boost",
    "list_cross_reference", "media_gif_features", "media_png_features",
    "null_normalization", "parsed_arrow_roundtrip", "parsed_csv_roundtrip",
    "parsed_docx_roundtrip", "parsed_html_roundtrip",
    "parsed_jsonl_gz_roundtrip", "parsed_jsonl_roundtrip",
    "part_fuzzy_pairs", "pdf_visual_detect", "scalar_funcs",
    "scan_projection", "sync_counters", "sync_plan", "text_bpe_encode",
    "text_bpe_merges", "text_gopher_filter", "text_nb_source_classifier",
    "text_pii_redact", "text_repetition", "text_winnowing",
    "tpch_q11_important_stock", "tpch_q22_idle_rich",
    "webdataset_multimodal", "webdataset_roundtrip",
}


_VERIFIED_R14 = {
    "bm25_ngram23", "bm25_unigram", "corpus_domain_cap",
    "corpus_epoch_order", "corpus_pack_sequences",
    "corpus_stratified_sample", "customer_balance_deciles",
    "documents_index_recovery", "embedding_drift_psi",
    "events_asof_lastclick", "events_click_attribution",
    "events_error_rate", "events_funnel", "events_moving_avg",
    "events_range_prev_hour", "events_resample_ffill", "events_retention",
    "events_rollup", "events_salted_agg", "events_topk_per_group",
    "hybrid_search_indexed", "keyword_boost", "list_cross_reference",
    "media_gif_features", "media_png_features", "null_normalization",
    "parsed_arrow_roundtrip", "parsed_csv_roundtrip",
    "parsed_docx_roundtrip", "parsed_html_roundtrip",
    "parsed_jsonl_gz_roundtrip", "parsed_jsonl_roundtrip",
    "part_fuzzy_pairs", "pdf_visual_detect", "sync_plan", "text_bpe_encode",
    "text_bpe_merges", "text_bpe_merges_batched", "text_gopher_filter",
    "text_nb_source_classifier", "text_pii_redact", "text_repetition",
    "text_winnowing", "tpch_q11_important_stock", "tpch_q18_large_volume",
    "tpch_q22_idle_rich", "tpch_q5_local_volume", "tpch_q6_forecast",
    "webdataset_multimodal", "webdataset_roundtrip",
}



def _ordered_names():
    """Oracle-paired queries first — never-verified ones leading, then by
    the age of the last green row (oldest round first) — so the driver's
    50-query window always covers the fresh surface and re-verifies the
    stalest settled queries. Rows-only entries (sql=None) sort LAST: the
    driver can only record a weaker rows-only row for them, their hard
    checks live in pytest goldens, and the sample window's slots belong
    to hash-checkable queries."""
    names = list(REGISTRY)
    rounds = (_VERIFIED_R1, _VERIFIED_R2, _VERIFIED_R3, _VERIFIED_R4,
              _VERIFIED_R5, _VERIFIED_R7, _VERIFIED_R8, _VERIFIED_R10,
              _VERIFIED_R11, _VERIFIED_R12, _VERIFIED_R13,
              _VERIFIED_R14)

    def last_green(n):
        seen = [i + 1 for i, s in enumerate(rounds) if n in s]  # R8 ranks 7th
        return max(seen) if seen else 0

    return sorted(
        names,
        key=lambda n: (
            REGISTRY[n]["sql"] is None, last_green(n), names.index(n)
        ),
    )


def queries():
    return {name: REGISTRY[name]["spark"] for name in _ordered_names()}


def oracle_sql():
    return {
        name: REGISTRY[name]["sql"]
        for name in _ordered_names()
        if REGISTRY[name]["sql"] is not None
    }
