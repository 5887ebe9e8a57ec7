"""Planted-NULL parity: NULLs in every nullable user-data column
(documents.text/lang/source/n_chars, events.ts/event_type/value/props,
embeddings.embedding/label). This planting (examples/
hostile_nulls_audit.py is the registry-wide sweep) found five real
divergence classes, each pinned here on the queries that carried them:

1. pandas groupby DROPS NaN group keys by default — the partial top-k
   prune lost the whole NULL-lang stratum that the Spark window
   finisher and DuckDB both keep (operators/reservoir.py).
2. engine NULL placement in ordered windows — Spark NULLS FIRST vs
   DuckDB NULLS LAST shifted every rolling/rank frame; fixed by
   excluding NULL measurements/dates explicitly in BOTH engines
   (rolling_correlation, winsorized_stats, ks/psi drift,
   http_error_bursts, weighted_reservoir_sample).
3. contentless docs fold to identical init-value MinHash signatures,
   band together, and 0/0 in Jaccard verification — while the oracle's
   unnest never emits them (plans/dedup.py hashed_shingle_transform).
4. NULL embeddings crash numpy kernels / fold to degenerate codes —
   now dropped AT SCAN in both engines (sources/batch.py load_table +
   every oracle's WHERE embedding IS NOT NULL).
5. null-unsafe equi-joins silently dropped the NULL cohort that both
   engines' groupBys keep (latency_quantile_sketch), and numpy's
   NaN != x disagreed with SQL three-valued c.label <> q.qlabel
   (hard_negative_mining).

Second sweep wave (same classes, more carriers): the time-ordered
family (sliding windows, sessions, as-of, transition bigrams) excludes
undated events in both engines; the quality-score family excludes
textless docs (a NULL score bucket has no CDF position); multimodal
payload synthesis drops NULL payloads (the T3 invalid-record class);
chi-square runs complete-case (a NULL category zero-marginal divides
by zero in Spark and silently vanishes in DuckDB); the suffix-array
corpus excludes textless docs (a NULL token count poisoned every later
document's offset — the oracle spilled 78 GB on 50 docs); and
quality_quantile_normalize's mean rounds HALF-UP in exact integer
arithmetic (the grid can produce exact 4th-decimal halves, where
Spark's BigDecimal and DuckDB's binary-double rounding disagree).
"""

from __future__ import annotations

import duckdb
import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

SRC = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# one or two carriers per fixed divergence class (the full registry
# sweep lives in examples/hostile_nulls_audit.py)
FIXED_QUERIES = [
    "weighted_reservoir_sample",  # class 1 + 2
    "stratified_sample",  # class 1 (shared operator)
    "rolling_correlation",  # class 2
    "winsorized_stats",  # class 2
    "ks_drift_report",  # class 2 (+ streaming twin ingest)
    "psi_drift_report",  # class 2
    "http_error_bursts",  # class 2
    "dedup_minhash_lsh",  # class 3
    "dedup_clusters",  # class 3
    "ann_brute_topk",  # class 4
    "ann_ivf_topk",  # class 4
    "ivf_residual_quantization",  # class 4 (label-join leg)
    "latency_quantile_sketch",  # class 5 (null-safe cohort join)
    "hard_negative_mining",  # class 5 (NaN != vs <> semantics)
    # --- second sweep wave ---
    "sliding_window_traffic",  # class 2: window() drops NULL ts, oracle kept it
    "sessionize_events",  # class 2: lag chain over NULL ts
    "session_window_agg",  # class 2
    "asof_last_purchase",  # class 2: as-of ordering over NULL ts
    "event_transition_matrix",  # class 2: bigram lag over NULL ts
    "quality_quantile_normalize",  # class 2 + exact-half rounding divergence
    "classifier_auc_report",  # class 2: NULL score support point
    "chi_square_report",  # class 5: NULL category zero-marginal division
    "multimodal_decode_meta",  # class 4: NULL payload crashes the kernel
    "multimodal_frame_sample",  # class 4
    "multimodal_resize_features",  # class 4
    "suffix_array_dup_report",  # class 3: NULL token count poisons offsets
    "dup_span_report",  # class 3 (shared corpus CTE)
    # --- session-4 wave ---
    # pii_doc_counts briefly gained an isNotNull pre-filter during the
    # streaming-monitor refactor, shrinking n_docs vs the oracle's
    # count(*) (caught by the registry-wide sweep): NULL-text docs are
    # zero-PII documents, KEPT in both engines
    "pii_source_summary",
]


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nulls")
    con = duckdb.connect()
    con.execute(
        f"""COPY (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text,
         CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
         CASE WHEN doc_id % 13 = 0 THEN NULL ELSE source END AS source,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS n_chars
  FROM '{SRC}/documents.parquet'
) TO '{tmp}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  SELECT event_id,
         CASE WHEN event_id % 17 = 0 THEN NULL ELSE ts END AS ts,
         user_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS event_type,
         CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value,
         CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS props
  FROM '{SRC}/events.parquet'
) TO '{tmp}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  SELECT vec_id,
         CASE WHEN vec_id % 11 = 0 THEN NULL ELSE embedding END AS embedding,
         CASE WHEN vec_id % 7 = 0 THEN NULL ELSE label END AS label
  FROM '{SRC}/embeddings.parquet'
) TO '{tmp}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in _TABLES:
        if t not in ("documents", "events", "embeddings"):
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(tmp)


@pytest.mark.parametrize("name", FIXED_QUERIES)
def test_planted_nulls_keep_parity(spark, nulls_dir, name):
    q = REGISTRY[name]
    con = duckdb.connect()
    try:
        for t in _TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{nulls_dir}/{t}.parquet'"
            )
        ok, msg = compare(q.spark_fn(spark, nulls_dir), con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()


def test_prune_keeps_null_group_and_null_priority(spark):
    """Direct pin of divergence class 1: the per-partition prune must
    keep a NULL group key as a group and rank NaN sort keys FIRST
    (Spark's ascending NULLS FIRST), or the exact finisher ranks rows
    the prune already discarded."""
    from http_log_anonymizer_spark.operators.reservoir import reservoir_per_group

    rows = [
        (1, "a", 0.5),
        (2, "a", 0.1),
        (3, None, 0.9),
        (4, None, 0.2),
        (5, "a", None),  # NULL priority: Spark ranks it FIRST ascending
    ]
    df = spark.createDataFrame(rows, "id long, g string, pri double")
    got = {
        (r.g, r.rnk): r.id
        for r in reservoir_per_group(
            df, group_cols=["g"], k=2, priority_col="pri", tiebreak_cols=["id"]
        ).collect()
    }
    # group 'a': NULL pri wins rank 1 (NULLS FIRST), then 0.1
    assert got[("a", 1)] == 5 and got[("a", 2)] == 2
    # NULL group is a real group with both its rows ranked
    assert got[(None, 1)] == 4 and got[(None, 2)] == 3
