"""Invariants for quality_filter_tradeoff: the operating curve must be
monotone (tightening a filter never keeps more), the extreme rows must
behave (everything kept below min score, NULL mean on an empty kept
set), and parity must hold on planted corpora."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t) if t else 0) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["quality_filter_tradeoff"]
    rows = q.spark_fn(spark, str(tmp_path)).collect()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        ok, msg = compare(q.spark_fn(spark, str(tmp_path)), con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return rows


def test_curve_is_monotone_on_real_corpus(spark):
    rows = (
        REGISTRY["quality_filter_tradeoff"]
        .spark_fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs_kept >= b.n_docs_kept
        assert a.tokens_kept >= b.tokens_kept
        if a.mean_score_kept is not None and b.mean_score_kept is not None:
            assert a.mean_score_kept <= b.mean_score_kept


def test_all_low_quality_corpus_keeps_nothing(spark, tmp_path):
    # heavy repetition -> tiny uniq_ratio -> score ~0.07, below every
    # candidate threshold: every row keeps 0 docs with NULL mean
    _write_docs(spark, tmp_path, ["x x x x x"] * 4 + [None])
    rows = _run(spark, tmp_path)
    assert all(r.n_docs_kept == 0 and r.pct_docs_kept == 0.0 for r in rows)
    assert all(r.mean_score_kept is None for r in rows)


def test_loose_threshold_keeps_everything(spark, tmp_path):
    # distinct tokens incl. stopwords -> scores > 0.3 for all docs, so
    # the loosest row keeps the full corpus (NULL-text row excluded)
    texts = [
        "join hash row batch scan alpha beta gamma delta epsilon",
        "join hash row batch scan one two three four five six",
        None,
    ]
    _write_docs(spark, tmp_path, texts)
    rows = _run(spark, tmp_path)
    first = rows[0]
    assert first.threshold == 0.3
    assert first.n_docs_kept == 2 and first.pct_docs_kept == 1.0
    assert first.pct_tokens_kept == 1.0
