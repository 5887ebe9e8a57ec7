"""Query registry: every operator in SURVEY.md §2 (plus the engine-grade
extensions) is registered here as a (Spark DataFrame impl, DuckDB oracle
SQL) pair. ``__spark_entry__.py``, ``bench.py`` and the test suite all
read this registry, so an operator is "done" exactly when it appears here
with a passing oracle.
"""

from http_log_anonymizer_spark.plans.registry import REGISTRY, Query, register

# Import for registration side effects. The driver's correctness gate
# checks the FIRST 50 registry entries in insertion order; _WINDOW below
# controls which 50 those are, so in-module registration order no longer
# matters.
from http_log_anonymizer_spark.plans import http_log  # noqa: E402,F401
from http_log_anonymizer_spark.plans import dedup  # noqa: E402,F401
from http_log_anonymizer_spark.plans import similarity  # noqa: E402,F401
from http_log_anonymizer_spark.plans import text  # noqa: E402,F401
from http_log_anonymizer_spark.plans import multimodal  # noqa: E402,F401
from http_log_anonymizer_spark.plans import sampling  # noqa: E402,F401
from http_log_anonymizer_spark.plans import scalars  # noqa: E402,F401
from http_log_anonymizer_spark.plans import analytics  # noqa: E402,F401
from http_log_anonymizer_spark.plans import curation  # noqa: E402,F401
from http_log_anonymizer_spark.plans import linkage  # noqa: E402,F401

# Round-9 window (VERDICT r08 items 1, 3, 6 — exactly the prescribed
# allocation): multimodal_phash_wide_neardup FIRST (the only registry
# query never driver-checked — added after the r08 window filled), the
# round's two new driver-green-required queries
# (ann_ivf_sqrt_opq_pq_topk, the rotated production PQ tier of
# directive 3, and storage_estimate_report, the reference capacity ask
# of directive 6), then ALL 47 r04-stale queries — 1 + 2 + 47 = 50,
# the verdict's own arithmetic ("47 + this one = 48 <= 50"), after
# which nothing in the correctness union is older than r05. The
# sessionize_events / session_window_agg rows double as re-verification
# of this round's microsecond-gap fix (ADVICE r08). The round's one
# OTHER new query (ann_ivf_sqrt_opq_pq_recall_report) shares its
# entire pipeline with the windowed rotated tier and the recall-join
# wrapper with three driver-green recall reports; it is locally
# oracle-gated and LEADS the r10 rotation (ROADMAP).
# Everything outside the window stays locally gated by
# tests/test_registry_oracle.py (same comparator).
_WINDOW = [
    "multimodal_phash_wide_neardup",  # never driver-checked (r08 verdict #1)
    "ann_ivf_sqrt_opq_pq_topk",  # new this round (r08 verdict #3)
    "storage_estimate_report",  # new this round (r08 verdict #6)
    # --- all 47 r04-stale queries (r08 verdict #1: the full cohort) ---
    "ams_f2_selfjoin_size",
    "ann_brute_topk",
    "ann_ivf_adc_topk",
    "ann_ivf_kmeans_topk",
    "ann_ivf_topk",
    "ann_lsh_recall_report",
    "ann_lsh_topk",
    "ann_lsh_wide_topk",
    "ann_quantized_topk",
    "best_order_per_customer",
    "bloom_membership_report",
    "bm25_query_table",
    "cms_user_frequency",
    "customer_running_revenue",
    "dedup_simhash",
    "dedup_simhash_stats",
    "dedup_simhash_wide",
    "dedup_simhash_xwide",
    "embed_neardup_gemm",
    "embed_neardup_lsh",
    "embed_quantization_error",
    "hard_negative_mining",
    "hdr_latency_quantiles",
    "hilbert_layout",
    "hll_user_cardinality",
    "hybrid_rrf_fusion",
    "ivf_cluster_stats",
    "ivf_residual_quantization",
    "k_anonymity_report",
    "kmeans_cluster_sizes",
    "nation_volume",
    "padding_efficiency",
    "pagerank_copurchase",
    "pricing_summary",
    "range_join_error_context",
    "rerank_fusion_topk",
    "semdedup_cells",
    "session_window_agg",
    "sessionize_events",
    "source_overlap_matrix",
    "temperature_mix_weights",
    "triangle_counts",
    "unigram_encode_stats",
    "unigram_lm_vocab",
    "user_zscore_outliers",
    "value_percentiles",
    "wordpiece_encode_stats",
]


def _apply_window() -> None:
    assert len(_WINDOW) == 50, len(_WINDOW)
    missing = [n for n in _WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    tail = [n for n in REGISTRY if n not in _WINDOW]
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update({n: snapshot[n] for n in [*_WINDOW, *tail]})


_apply_window()

__all__ = ["REGISTRY", "Query", "register"]
