"""Planted semantics for heaps_fit_report: an all-unique corpus fits
beta = 1 exactly, a saturated one-type corpus gates to the flat fit,
a single checkpoint yields NULL, and sub-linear growth lands between —
with oracle parity on every planted table."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["heaps_fit_report"]
    rows = q.spark_fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
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
    return rows[0]


def test_all_unique_tokens_fit_beta_one_exactly(spark, tmp_path):
    # every token in the corpus is distinct: V(n) = n at every
    # checkpoint, so the log-log fit is y = x exactly
    k = 0
    texts = []
    for _ in range(32):
        toks = [f"u{k + j}" for j in range(10)]
        k += 10
        texts.append(" ".join(toks))
    _write_docs(spark, tmp_path, texts)
    r = _run(spark, tmp_path)
    assert r.n_types == r.n_tokens == 320
    assert r.heaps_beta == 1.0
    assert r.heaps_k == 1.0
    assert r.r2 == 1.0


def test_saturated_vocabulary_gates_to_flat_fit(spark, tmp_path):
    # one type everywhere: the integer curve is flat (max_v = min_v),
    # so beta is literal 0.0, K = exp(mean ln 1) = 1, r2 NULL
    _write_docs(spark, tmp_path, ["w w w w"] * 16)
    r = _run(spark, tmp_path)
    assert r.n_types == 1
    assert r.heaps_beta == 0.0
    assert r.heaps_k == 1.0
    assert r.r2 is None


def test_single_checkpoint_yields_null_fit(spark, tmp_path):
    # doc_id 0 alone lands in one power-of-two bucket: one curve point,
    # no slope — exact n_points gate, not a float-variance accident
    _write_docs(spark, tmp_path, ["a b c a"])
    r = _run(spark, tmp_path)
    assert r.n_points == 1
    assert r.heaps_beta is None and r.heaps_k is None and r.r2 is None


def test_sublinear_growth_lands_between(spark, tmp_path):
    # each doc: 2 new types + 18 draws from a fixed 8-type core ->
    # vocabulary grows, but far slower than tokens
    texts = []
    for i in range(64):
        toks = [f"n{i}a", f"n{i}b"] + [f"core{j % 8}" for j in range(18)]
        texts.append(" ".join(toks))
    _write_docs(spark, tmp_path, texts)
    r = _run(spark, tmp_path)
    assert 0.0 < r.heaps_beta < 1.0
    assert r.r2 > 0.9
    assert r.n_tokens == 64 * 20
    assert r.n_types == 64 * 2 + 8
