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

# Round-3 window (VERDICT r02 next-step 1): every query that has NEVER
# held a driver correctness slot (35 — the r01+r02 window union covered
# 88 of 123), plus the 5 queries whose brand-new oracles flip them from
# `no_oracle` to hash-checked this round, plus queries whose plans or
# outputs changed this round and so need re-verification, plus two
# flagship parity anchors. Everything outside the window stays locally
# gated by tests/test_registry_oracle.py (same comparator).
_WINDOW = [
    # --- 35 never-driver-checked (CORRECTNESS_r01 ∪ r02 complement) ---
    "array_feature_stats",
    "sliding_window_traffic",
    "unpivot_lineitem_metrics",
    "map_ops_explode",
    "null_semantics",
    "nation_market_share",
    "event_funnel",
    "retention_cohorts",
    "event_transition_matrix",
    "winsorized_stats",
    "data_quality_report",
    "snapshot_diff_cdc",
    "user_entropy_scores",
    "rolling_correlation",
    "kmv_cohort_overlap",
    "promo_revenue_share",
    "large_order_customers",
    "bpe_pretokenize_stats",
    "blocklist_hit_report",
    "pack_sequences",
    "apply_mix_sampling",
    "bpe_learn_merges",
    "embed_quantization_error",
    "ivf_residual_quantization",
    "kmeans_cluster_sizes",
    "dedup_ngram_jaccard",
    "embed_neardup",
    "ann_quantized_topk",
    "weighted_reservoir_sample",
    "ivf_cluster_stats",
    "pii_source_summary",
    "multimodal_resize_features",
    "dedup_clusters_star",
    "ann_ivf_adc_topk",
    "stratified_sample",
    # --- 5 newly oracled (were `no_oracle` rows in r01/r02) ---
    "ann_ivf_kmeans_topk",
    "distinct_users_approx",
    "frequent_resources_sketch",
    "latency_quantile_sketch",
    "hilbert_layout",
    # --- changed this round: re-verify ---
    "dsir_importance_weights",
    "embed_neardup_gemm",
    "dedup_minhash_lsh",
    # --- new round-3 queries (flagship anchors http_totals /
    #     llm_corpus_report yield their slots: both carry green driver
    #     rows from r01 AND r02 and are unchanged this round) ---
    "bm25_retrieval",
    "bpe_encode_stats",
    "doc_chunking",
    "hard_negative_mining",
    # --- r02-green anchors whose plans changed this round (partial
    #     top-k operator / spread=True embeddings scans) ---
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
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
