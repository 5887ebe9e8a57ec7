"""Unicode-hygiene audit: the sf corpora are clean ASCII (the report
must prove all-zeros there — a false positive means the cleanup pass
would corrupt good text), so the real verification is a PLANTED
hostile corpus with every defect class: engine parity via the driver
comparator AND hand-counted expected values per class."""

from __future__ import annotations

import duckdb
import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

SRC = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# (doc_id, text, expected (repl, ctrl, zw, moji)) — all source='hostile'
HOSTILE = [
    (9_000_001, "clean ascii stays clean", (0, 0, 0, 0)),
    (9_000_002, "café naïve über legit accents", (0, 0, 0, 0)),
    (9_000_003, "decode fail � twice �", (2, 0, 0, 0)),
    (9_000_004, "ocr\x01debris\x02 tab\tand nl\n stay fine \x7f", (0, 3, 0, 0)),
    (9_000_005, "zero​width‌ joiner‍ bom ﻿", (0, 0, 4, 0)),
    (9_000_006, "moji Ã© and â and Â ", (0, 0, 0, 3)),
    (9_000_007, "all of it � \x00 ​ Ã¼", (1, 1, 1, 1)),
    (9_000_008, "", (0, 0, 0, 0)),
    (9_000_009, None, (0, 0, 0, 0)),
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("unicode_hostile")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE extra (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO extra VALUES (?, ?, 'en', 'hostile', ?)",
        [(i, t, len(t) if t else 0) for i, t, _ in HOSTILE],
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


def test_hostile_corpus_keeps_engine_parity(spark, hostile_dir):
    q = REGISTRY["unicode_cleanup_report"]
    con = duckdb.connect()
    try:
        for t in _TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{hostile_dir}/{t}.parquet'"
            )
        ok, msg = compare(q.spark_fn(spark, hostile_dir), con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()


def test_hostile_counts_are_exact(spark, hostile_dir):
    rows = {
        r.source: r
        for r in REGISTRY["unicode_cleanup_report"].spark_fn(spark, hostile_dir).collect()
    }
    h = rows["hostile"]
    want = [sum(e[i] for _, _, e in HOSTILE) for i in range(4)]
    assert (h.repl_chars, h.ctrl_chars, h.zw_chars, h.moji_seqs) == tuple(want)
    assert h.n_docs == len(HOSTILE)
    assert h.n_docs_affected == sum(1 for _, _, e in HOSTILE if sum(e) > 0)


def test_clean_corpus_reports_all_zeros(spark):
    """No false positives on the clean synthetic corpus — accented
    letters, tabs and newlines must NOT count as defects."""
    for r in REGISTRY["unicode_cleanup_report"].spark_fn(spark, SRC).collect():
        assert r.n_docs_affected == 0, r
        assert r.repl_chars == r.ctrl_chars == r.zw_chars == r.moji_seqs == 0
        assert r.pct_docs_affected == 0.0
