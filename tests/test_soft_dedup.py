"""Planted semantics for soft_dedup_weights: a c-copy cluster must
contribute total mass exactly 1 (hard dedup's keep-one), cross-source
clusters must split that mass across sources, and short/NULL docs keep
weight 1 — with oracle parity on every planting."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

_DUP = "the quick brown fox jumps over the lazy dog again and again"
_UNIQ = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten eleven",
]


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, len(t) if t else 0) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["soft_dedup_weights"]
    got = {r.source: r for r in q.spark_fn(spark, str(tmp_path)).collect()}
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


def test_triplicate_cluster_contributes_unit_mass(spark, tmp_path):
    rows = [("s", _DUP)] * 3 + [("s", _UNIQ[0])]
    _write_docs(spark, tmp_path, rows)
    r = _run(spark, tmp_path)["s"]
    assert r.n_docs == 4 and r.n_dup_docs == 3
    # 3 * (1/3) + 1 = 2.0 — the cluster's total mass is one document
    assert r.soft_mass == 2.0
    assert r.keep_ratio == 0.5
    dup_toks = len(_DUP.split())
    uniq_toks = len(_UNIQ[0].split())
    assert r.n_tokens == 3 * dup_toks + uniq_toks
    assert abs(r.effective_tokens - (dup_toks + uniq_toks)) < 1e-6


def test_cross_source_cluster_splits_mass(spark, tmp_path):
    # the same content in two sources: each copy weighs 1/2, so each
    # source's soft mass is 1.5 (one half-weight dup + one unique)
    rows = [("a", _DUP), ("b", _DUP), ("a", _UNIQ[0]), ("b", _UNIQ[1])]
    _write_docs(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    for s in ("a", "b"):
        assert got[s].n_docs == 2 and got[s].n_dup_docs == 1
        assert got[s].soft_mass == 1.5


def test_short_and_null_docs_keep_full_weight(spark, tmp_path):
    # two identical 2-token docs can't shingle (k=3) so they are NOT
    # near-dup candidates and keep weight 1; NULL text counts 0 tokens
    rows = [("s", "hi there"), ("s", "hi there"), ("s", None)]
    _write_docs(spark, tmp_path, rows)
    r = _run(spark, tmp_path)["s"]
    assert r.n_docs == 3 and r.n_dup_docs == 0
    assert r.soft_mass == 3.0 and r.keep_ratio == 1.0
    assert r.n_tokens == 4


def test_all_unique_is_identity(spark, tmp_path):
    rows = [("u", _UNIQ[0]), ("u", _UNIQ[1]), ("u", _DUP)]
    _write_docs(spark, tmp_path, rows)
    r = _run(spark, tmp_path)["u"]
    assert r.n_dup_docs == 0 and r.soft_mass == 3.0
    assert r.effective_tokens == float(r.n_tokens)
