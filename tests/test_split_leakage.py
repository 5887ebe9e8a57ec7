"""Planted semantics for split_leakage_report: a near-copy planted
across the train/test boundary must flag as a leak, within-split
duplicates must not, and parity holds on the planted tables. Doc ids
are chosen so their split-hash buckets are known (the same
hash64(doc_id, "split") % 100 rule as train_val_test_split):
ids 0-5 -> train, 10 -> val, 8/21 -> test."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

_DUP = "the quick brown fox jumps over the lazy dog again and again"
_UNIQ = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["split_leakage_report"]
    got = {(r.split_a, r.split_b): r for r in q.spark_fn(spark, str(tmp_path)).collect()}
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


def test_cross_split_near_copy_flags_as_leak(spark, tmp_path):
    # id 0 (train) and id 8 (test) share identical text; id 1 (train)
    # carries unique text so the corpus has a non-leaky doc too
    _write_docs(spark, tmp_path, [(0, _DUP), (8, _DUP), (1, _UNIQ)])
    got = _run(spark, tmp_path)
    r = got[("test", "train")]
    assert r.is_leak and r.n_pairs == 1 and r.n_docs == 2
    assert r.max_jaccard == 1.0
    assert ("train", "train") not in got


def test_within_split_duplicates_are_not_leaks(spark, tmp_path):
    # ids 0 and 1 are both train: a duplicate pair, but not leakage
    _write_docs(spark, tmp_path, [(0, _DUP), (1, _DUP)])
    got = _run(spark, tmp_path)
    assert list(got) == [("train", "train")]
    assert not got[("train", "train")].is_leak


def test_val_test_leak_normalizes_unordered(spark, tmp_path):
    # id 10 (val) vs id 8 (test): the pair reports once, as
    # (test, val) under least/greatest normalization
    _write_docs(spark, tmp_path, [(10, _DUP), (8, _DUP)])
    got = _run(spark, tmp_path)
    assert list(got) == [("test", "val")]
    assert got[("test", "val")].is_leak


def test_clean_corpus_reports_nothing(spark, tmp_path):
    _write_docs(spark, tmp_path, [(0, _UNIQ), (8, _DUP)])
    got = _run(spark, tmp_path)
    assert got == {}
