"""Pathological-cohort parity: a REAL cohort value literally named
'ALL' collides with the pooled-ALL union row in every per-cohort +
pooled report. Two engine-divergence modes live here, both found by
this planting (late r08): duplicate support points make ROWS/RANGE
cumulative windows peer-order-dependent (classifier_auc_report's AUC
flipped at the 4th decimal; ks_drift_report mixed a Spark RANGE frame
with the oracle's ROWS frame), and pre-aggregated union rows that are
never re-grouped emit two 'ALL' rows where the oracle's GROUP BY
emits one (watermark_greenlist_report, fixed in wm_readout). The fix
everywhere is the same: re-group on (cohort, support) after the
pooled union, in BOTH engines. This suite pins parity for every
pooled-cohort query on a planted corpus where the collision actually
happens."""

from __future__ import annotations

import duckdb
import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

SRC = "/root/testdata/sf0.001"

# every registered per-cohort + pooled-ALL report and the column its
# cohort comes from
POOLED_QUERIES = [
    "revenue_concentration_report",  # c_mktsegment
    "psi_drift_report",  # event_type
    "ks_drift_report",  # event_type
    "classifier_auc_report",  # source
    "zipf_fit_report",  # source
    "watermark_greenlist_report",  # source
]

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("all_cohort")
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * REPLACE (CASE WHEN event_id % 5 = 0 THEN 'ALL' "
        f"ELSE event_type END AS event_type) FROM '{SRC}/events.parquet') "
        f"TO '{tmp}/events.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * REPLACE (CASE WHEN c_custkey % 3 = 0 THEN 'ALL' "
        f"ELSE c_mktsegment END AS c_mktsegment) FROM '{SRC}/customer.parquet') "
        f"TO '{tmp}/customer.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * REPLACE (CASE WHEN doc_id % 4 = 0 THEN 'ALL' "
        f"ELSE source END AS source) FROM '{SRC}/documents.parquet') "
        f"TO '{tmp}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in _TABLES:
        if t not in ("events", "customer", "documents"):
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(tmp)


@pytest.mark.parametrize("name", POOLED_QUERIES)
def test_planted_all_cohort_keeps_parity(spark, planted_dir, name):
    q = REGISTRY[name]
    con = duckdb.connect()
    try:
        for t in _TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{planted_dir}/{t}.parquet'"
            )
        ok, msg = compare(q.spark_fn(spark, planted_dir), con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
