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


# Queries whose correctness the driver has already recorded green (round 1,
# CORRECTNESS_r01.json). If the driver caps per-round checks, queries that
# have never had a correctness row must register FIRST so every registry
# entry eventually gets verified. Registration order within each group is
# preserved (dicts are insertion-ordered).
_PREVIOUSLY_VERIFIED = {
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


def _ordered_names():
    names = list(REGISTRY)
    fresh = [n for n in names if n not in _PREVIOUSLY_VERIFIED]
    seen = [n for n in names if n in _PREVIOUSLY_VERIFIED]
    return fresh + seen


def queries():
    return {name: REGISTRY[name]["spark"] for name in _ordered_names()}


def oracle_sql():
    return {
        name: REGISTRY[name]["sql"]
        for name in _ordered_names()
        if REGISTRY[name]["sql"] is not None
    }
