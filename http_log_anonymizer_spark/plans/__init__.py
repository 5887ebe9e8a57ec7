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

# Round-4 window (VERDICT r03 next-step 2): the 4 queries that have
# never held a driver slot (committed after r03's verification run —
# green rows here make the driver-verified union 133/133 minus this
# round's additions), plus this round's NEW queries, plus every query
# whose PLAN changed this round (the whole similarity family: byte-
# sized spread + the brute-topk parquet side-input; dedup_simhash's
# dropped sort; the hilbert kernel masking), plus two flagship parity
# anchors, with the remaining slots re-verifying queries whose only
# driver row is from r01 (the stalest verification). Everything outside
# the window stays locally gated by tests/test_registry_oracle.py
# (same comparator).
_WINDOW = [
    # --- never-driver-checked (committed after the r03 run) ---
    "ann_lsh_recall_report",
    "source_overlap_matrix",
    "temperature_mix_weights",
    "padding_efficiency",
    # --- new round-4 queries ---
    "bm25_query_table",
    "dedup_simhash_stats",
    "dedup_simhash_wide",
    "hybrid_rrf_fusion",
    "cms_user_frequency",
    "dedup_simhash_xwide",
    "hll_user_cardinality",
    "ams_f2_selfjoin_size",
    "pagerank_copurchase",
    "unigram_lm_vocab",
    "unigram_encode_stats",
    "triangle_counts",
    "rerank_fusion_topk",
    "k_anonymity_report",
    "bloom_membership_report",
    "hdr_latency_quantiles",
    "ann_lsh_wide_topk",
    "wordpiece_encode_stats",
    # --- plans changed this round: re-verify ---
    "dedup_simhash",
    "hilbert_layout",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "ann_ivf_adc_topk",
    "ann_ivf_kmeans_topk",
    "embed_neardup",
    "embed_neardup_lsh",
    "embed_neardup_gemm",
    "embed_quantization_error",
    "semdedup_cells",
    "ivf_cluster_stats",
    "ivf_residual_quantization",
    "kmeans_cluster_sizes",
    "hard_negative_mining",
    # --- flagship parity anchors ---
    "http_totals",
    "llm_corpus_report",
    # --- stalest re-verification (driver row only from r01) ---
    "session_window_agg",
    "sessionize_events",
    "range_join_error_context",
    "value_percentiles",
    "user_zscore_outliers",
    "nation_volume",
    "pricing_summary",
    "best_order_per_customer",
    "customer_running_revenue",
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
