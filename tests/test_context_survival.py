"""Context-length survival: boundary semantics (a doc with exactly
ctx_len tokens is NOT truncated), NULL/empty text counts as 0 tokens,
and engine parity on a planted corpus exercising all three."""

from __future__ import annotations

import duckdb
import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.curation import _CTX_LADDER
from tests.oracle import compare

SRC = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

L0 = _CTX_LADDER[0]
PLANTED = [
    (9_200_001, " ".join(["tok"] * L0)),  # exactly L0: survives L0 intact
    (9_200_002, " ".join(["tok"] * (L0 + 1))),  # one over: loses exactly 1
    (9_200_003, ""),  # empty: 0 tokens
    (9_200_004, None),  # NULL: 0 tokens
]


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ctx_survival")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE extra (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO extra VALUES (?, ?, 'en', 'edge', ?)",
        [(i, t, len(t) if t else 0) for i, t in PLANTED],
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


def test_boundaries_and_parity(spark, planted_dir):
    q = REGISTRY["context_length_survival"]
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

    rows = {
        (r.source, r.ctx_len): r for r in q.spark_fn(spark, planted_dir).collect()
    }
    edge = rows[("edge", L0)]
    assert edge.n_docs == len(PLANTED)
    # only the L0+1 doc is truncated, losing exactly its one overflow
    # token; the exactly-L0 doc and the 0-token docs survive intact
    assert edge.n_docs_truncated == 1
    assert edge.tokens_lost == 1
    assert edge.tokens_total == L0 + (L0 + 1)


def test_survival_is_monotone_in_ctx_len(spark):
    rows = REGISTRY["context_length_survival"].spark_fn(spark, SRC).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.ctx_len)
        surv = [r.token_survival for r in rs]
        assert surv == sorted(surv), (src, surv)
        lost = [r.tokens_lost for r in rs]
        assert lost == sorted(lost, reverse=True), (src, lost)
