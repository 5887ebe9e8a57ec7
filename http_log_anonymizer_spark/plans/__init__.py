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

# Round-8 window (VERDICT r07 item 2 — staleness debt FIRST): the 14
# r03-stale queries (the full remainder of the rotation — after this
# round nothing in the union is older than r04), then every query
# whose plan or oracle changed this round (the zipf exact-integer
# gate, the ngram_novelty column rename, the Neyman decimal
# accumulator, the KS degenerate-cohort guard, the three new scale
# gates), then the stalest r04 cohort fill — with the three r07
# driver-bench drift suspects (ann_ivf_topk, dedup_simhash,
# dedup_simhash_wide) and both gated r04 queries placed first. The 24
# r04 queries that didn't fit rotate in round 9 (listed in
# ROADMAP.md; hybrid_rrf_fusion, ivf_cluster_stats,
# hll_user_cardinality and hilbert_layout ceded their slots to the
# round's four late new queries, and hdr_latency_quantiles,
# embed_quantization_error, hard_negative_mining and embed_neardup_lsh
# to continuation session 2's four, and dedup_simhash_xwide +
# embed_neardup_gemm to the two late result-affecting plan fixes
# (classifier_auc_report peer-order AUC, quality_quantile_normalize
# exact-half rounding), and dedup_simhash_stats +
# customer_running_revenue + cms_user_frequency + bm25_query_table +
# bloom_membership_report + best_order_per_customer to continuation
# session 3's six new queries (gopher_repetition_report,
# soft_dedup_weights, quality_filter_tradeoff, rho_excess_loss_report,
# epochs_per_source_report, split_leakage_report) — first driver check
# beats a staleness refresh).
# Everything outside the window stays locally gated by
# tests/test_registry_oracle.py (same comparator).
_WINDOW = [
    # --- r03-latest driver rows: the rotation's last fill ---
    "array_feature_stats",
    "large_order_customers",
    "latency_quantile_sketch",
    "map_ops_explode",
    "nation_market_share",
    "null_semantics",
    "promo_revenue_share",
    "rolling_correlation",
    "snapshot_diff_cdc",
    "stratified_sample",
    "unpivot_lineitem_metrics",
    "user_entropy_scores",
    "weighted_reservoir_sample",
    "winsorized_stats",
    # --- plan/oracle changed in round 8: re-verify ---
    "zipf_fit_report",
    "ngram_novelty_report",
    "neyman_allocation_report",
    "ks_drift_report",
    "dedup_ngram_jaccard",  # scale-gated this round
    "embedding_spectrum_report",  # new this round
    "token_burstiness_report",  # new this round
    "minhash_estimator_error_report",  # new this round
    "watermark_greenlist_report",  # new this round
    "heaps_fit_report",  # new this round
    "kcenter_coreset",  # new this round
    "multimodal_phash_neardup",  # new this round
    "dp_histogram_report",  # new this round (continuation session 2)
    "unicode_cleanup_report",  # new this round (continuation session 2)
    "template_prefix_report",  # new this round (continuation session 2)
    "context_length_survival",  # new this round (continuation session 2)
    "gopher_repetition_report",  # new this round (continuation session 3)
    "soft_dedup_weights",  # new this round (continuation session 3)
    "quality_filter_tradeoff",  # new this round (continuation session 3)
    "rho_excess_loss_report",  # new this round (continuation session 3)
    "epochs_per_source_report",  # new this round (continuation session 3)
    "split_leakage_report",  # new this round (continuation session 3)
    # --- result-affecting plan changes late in round 8: the AUC
    # --- peer-order fix and the exact-half HALF-UP rounding fix can
    # --- change values even on NULL-free driver data ---
    "classifier_auc_report",
    "quality_quantile_normalize",
    # --- r04-latest fill (24 of 48; 24 defer to round 9): the drift
    # --- suspects and the other two gated queries lead ---
    # session 4: ann_ivf_topk cedes its slot to the new
    # benford_first_digit_report (its r07 drift suspicion was likewise
    # closed by the measured isolated-rerun classification in SCALE.md)
    "benford_first_digit_report",
    # session 4: dedup_simhash cedes its slot to the new
    # hits_copurchase (its r07 drift suspicion was closed by the
    # measured isolated-rerun classification in SCALE.md, not by a
    # correctness row; first driver check beats a staleness refresh)
    "hits_copurchase",
    # session 4: dedup_simhash_wide cedes its slot to the new
    # conformal_threshold_report (same closed-by-measurement rationale
    # as its two drift-suspect siblings above)
    "conformal_threshold_report",
    # session 4: ann_lsh_topk cedes its slot to the new
    # linkage_blocking_recall_report — the gate-wrapper change it was
    # window'd for is one shared code path with embed_neardup and
    # dedup_ngram_jaccard (both still in the window), so two driver
    # checks cover the wrapper class and a first check wins the slot
    "linkage_blocking_recall_report",
    "embed_neardup",  # scale-gated this round
    # session 4: ams_f2_selfjoin_size cedes its r04-fill slot to the
    # new textrank_keywords
    "textrank_keywords",
    # session 4: ann_brute_topk cedes its r04-fill slot to the new
    # sequential_patterns
    "sequential_patterns",
    # session 4: ann_ivf_adc_topk cedes its r04-fill slot to
    # pii_source_summary, whose plan was refactored into the shared
    # map/reduce halves behind the new streaming PII monitor
    "pii_source_summary",
    # session 4: ann_ivf_kmeans_topk cedes its r04-fill slot to the new
    # shuffle_mixing_report
    "shuffle_mixing_report",
    # session 4: ann_lsh_recall_report cedes its r04-fill slot to
    # decontaminate_docs, whose plan was refactored into the shared
    # halves behind the new streaming decontamination monitor
    "decontaminate_docs",
    # session 4: ann_lsh_wide_topk cedes its r04-fill slot to the new
    # kmeans_silhouette_report
    "kmeans_silhouette_report",
    # session 4: ann_quantized_topk cedes its r04-fill slot to the new
    # record_linkage_em (first driver check beats a staleness refresh)
    "record_linkage_em",
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
