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

# Round-5 window (VERDICT r04 next-step 1): this round's 4 NEW queries
# + the one whose plan changed (data_quality_report count fusion) + two
# flagship anchors + ALL 25 queries whose only driver row is from r01
# (the staleness gap the verdict called out) + 18 of the next-stalest
# (r02-only) rows, preferring families adjacent to this round's
# additions. Everything outside the window stays locally gated by
# tests/test_registry_oracle.py (same comparator).
_WINDOW = [
    # --- new round-5 queries (VERDICT r04 items 2, 7, 8, 9) ---
    "ann_ivf_sqrt_topk",
    "wordpiece_learn_merges",
    "personalized_pagerank",
    "suffix_array_dup_report",
    "suffix_selfrep_report",
    "ann_ivf_pq_topk",
    "embedding_pca_power",
    # --- plan changed this round: re-verify (item 5: fused counts) ---
    "data_quality_report",
    # --- flagship parity anchors ---
    "http_totals",
    "llm_corpus_report",
    # --- stalest re-verification: every query whose ONLY driver row
    # --- is from r01 (VERDICT r04 item 1 — all 25 of them)
    "blocking_supplier",
    "customer_order_distribution",
    "customers_with_high_value_orders",
    "disjunctive_filter_revenue",
    "distinct_users_exact",
    "dormant_rich_customers",
    "gapfill_locf",
    "grouping_sets_totals",
    "hypertable_rollup",
    "important_parts",
    "json_props_stats",
    "late_shipment_priority",
    "nation_trade_flow",
    "orders_without_lineitems",
    "pivot_avg_value",
    "revenue_leaders",
    "rollup_region_nation",
    "shipping_priority",
    "small_quantity_revenue",
    "supplier_part_diversity",
    "top_orders_per_customer",
    "top_terms_per_lang",
    "user_cohort_setops",
    "value_stats",
    "zorder_layout",
    # --- next-stalest (r02-only) fill, preferring families adjacent
    # --- to this round's additions (dup/ANN/tokenizer + T4/T6 core)
    "dup_span_report",
    "dedup_exact",
    "dedup_clusters",
    "dedup_winnow_join",
    "dedup_prefix_filter_join",
    "doc_winnowing",
    "doc_fingerprints",
    "http_anonymize_rows",
    "http_dedup_final",
    "http_top_ips",
    "http_monthly",
    "http_totals_cube",
    "json_encode_rows",
    "token_stats",
    "multimodal_decode_meta",
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
