"""Planted semantics for token_burstiness_report (Church adaptation)
and minhash_estimator_error_report (estimator calibration), plus
oracle parity on the planted tables."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path, name, key):
    q = REGISTRY[name]
    got = {getattr(r, key): r for r in q.spark_fn(spark, str(tmp_path)).collect()}
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
    return got


def test_bursty_term_adapts_function_word_does_not(spark, tmp_path):
    # "the" appears once in every doc (function-word profile);
    # "reactor" appears in half the docs but ALWAYS twice (bursty)
    docs = []
    for i in range(20):
        if i % 2 == 0:
            docs.append(f"the reactor w{i} reactor")
        else:
            docs.append(f"the w{i} x{i} y{i}")
    _write_docs(spark, tmp_path, docs)
    got = _run(spark, tmp_path, "token_burstiness_report", "term")
    the, reactor = got["the"], got["reactor"]
    assert the.df == 20 and the.df2 == 0 and the.adaptation == 0.0
    assert the.doc_rate == 1.0
    assert reactor.df == 10 and reactor.df2 == 10
    assert reactor.adaptation == 1.0 and reactor.doc_rate == 0.5


def test_estimator_error_is_zero_on_identical_docs(spark, tmp_path):
    # identical docs: exact Jaccard 1.0 on every surfaced pair, all 8
    # signature components agree -> est 1.0, zero error everywhere
    text = " ".join(f"tok{i}" for i in range(40))
    _write_docs(spark, tmp_path, [text, text, text])
    got = _run(spark, tmp_path, "minhash_estimator_error_report", "m_matches")
    assert set(got) == {8}
    r = got[8]
    assert r.n_pairs == 3  # all three ordered pairs of the clique
    assert r.mean_exact_jaccard == 1.0
    assert r.mean_abs_err == 0.0 and r.max_abs_err == 0.0


def test_estimator_error_bounded_on_partial_overlap(spark, tmp_path):
    # docs sharing half their shingles: surfaced pairs must carry
    # exact jaccard strictly below 1 and the audit must bound the
    # estimator's error honestly (|err| <= 1 by construction)
    base = [f"tok{i}" for i in range(60)]
    texts = [
        " ".join(base),
        " ".join(base[:30] + [f"alt{i}" for i in range(30)]),
        " ".join(base),
    ]
    _write_docs(spark, tmp_path, texts)
    got = _run(spark, tmp_path, "minhash_estimator_error_report", "m_matches")
    rows = list(got.values())
    assert rows, "the identical pair must be surfaced"
    for r in rows:
        assert 0.0 <= r.mean_exact_jaccard <= 1.0
        assert 0.0 <= r.mean_abs_err <= 1.0
        assert r.max_abs_err >= r.mean_abs_err - 1e-9
