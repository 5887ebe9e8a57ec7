"""Template mining: the synthetic corpus has no templates (coverage
must be 0.0 everywhere — a false positive means the downstream filter
deletes good docs), so detection is pinned on a PLANTED corpus where a
CMS-style scaffold with varying bodies, case and whitespace noise must
surface as one template; engine parity re-checked on the planting."""

from __future__ import annotations

import duckdb
import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.curation import _TPL_MIN_DOCS
from tests.oracle import compare

SRC = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SCAFFOLD = "Welcome to ACME Corp — your trusted partner in widgets since 1952."
PLANTED = (
    # one scaffold, varying bodies + case/whitespace noise that the
    # normalizer must fold together
    [(9_100_000 + i, f"{SCAFFOLD} Item {i}: unique body text {i * 37}.") for i in range(4)]
    + [(9_100_004, SCAFFOLD.upper() + "  extra   spaced\tbody")]
    + [(9_100_005, "  " + SCAFFOLD.lower() + "\n\nanother body")]
    # below-threshold pair: must NOT count as template docs
    + [(9_100_006, "Rare scaffold A shared body start padding padding padding x1"),
       (9_100_007, "Rare scaffold A shared body start padding padding padding x2")]
)
N_TEMPLATE_DOCS = 6  # the 6 scaffold docs; the pair of 2 stays below _TPL_MIN_DOCS


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    assert _TPL_MIN_DOCS == 3  # the planting's arithmetic assumes this
    tmp = tmp_path_factory.mktemp("templates")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE extra (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO extra VALUES (?, ?, 'en', 'cms', ?)",
        [(i, t, len(t)) for i, t in PLANTED],
    )
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/documents.parquet' UNION ALL "
        f"SELECT * FROM extra) TO '{tmp}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in _TABLES:
        if t != "documents":
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(tmp)


def test_planted_scaffold_surfaces_and_parity_holds(spark, planted_dir):
    q = REGISTRY["template_prefix_report"]
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

    rows = {r.source: r for r in q.spark_fn(spark, planted_dir).collect()}
    cms = rows["cms"]
    assert cms.n_docs == len(PLANTED)
    # 6 noisy scaffold variants fold to ONE normalized prefix; the
    # 2-doc pair stays distinct and below threshold
    assert cms.top_prefix_docs == N_TEMPLATE_DOCS
    assert cms.top_prefix == SCAFFOLD.lower()[:48]
    assert cms.n_template_docs == N_TEMPLATE_DOCS
    assert cms.template_coverage == round(N_TEMPLATE_DOCS / len(PLANTED), 4)


def test_clean_corpus_has_zero_template_coverage(spark):
    for r in REGISTRY["template_prefix_report"].spark_fn(spark, SRC).collect():
        assert r.n_template_docs == 0
        assert r.template_coverage == 0.0
