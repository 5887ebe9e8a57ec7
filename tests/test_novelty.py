"""Planted-corpus semantics for ngram_novelty_report: an exact repeat
contributes zero novelty, fresh text is fully novel, and the decile
split follows the shared rank formula. Parity on the planted tables
is asserted through the same driver-equivalent comparator."""

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
    q = REGISTRY["ngram_novelty_report"]
    got = {r.decile: r for r in q.spark_fn(spark, str(tmp_path)).collect()}
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


def test_repeats_are_zero_novel_and_fresh_text_fully_novel(spark, tmp_path):
    fresh = [" ".join(f"w{d}_{j}" for j in range(10)) for d in range(10)]
    # 20 docs -> 2 per decile: doc 2k is fresh text k, doc 2k+1 repeats it
    texts = []
    for k in range(10):
        texts += [fresh[k], fresh[k]]
    _write_docs(spark, tmp_path, texts)
    got = _run(spark, tmp_path)
    assert set(got) == set(range(1, 11))
    for d, r in got.items():
        assert r.n_docs == 2
        # each decile: one fresh doc (8 novel 3-gram types) + one exact
        # repeat (8 types, 0 novel) -> novelty_rate 0.5
        assert r.n_doc_gram_pairs == 16 and r.n_novel == 8, d
        assert r.novelty_rate == 0.5


def test_monotone_duplication_shows_decaying_curve(spark, tmp_path):
    base = " ".join(f"b{j}" for j in range(12))
    # later docs increasingly repeat the shared base text
    texts = []
    for i in range(20):
        if i < 4:
            texts.append(" ".join(f"u{i}_{j}" for j in range(12)))
        else:
            texts.append(base)
    _write_docs(spark, tmp_path, texts)
    got = _run(spark, tmp_path)
    rates = [got[d].novelty_rate for d in sorted(got)]
    # the first deciles carry all the novelty; the tail is pure repeat
    assert rates[0] == 1.0
    assert rates[-1] == 0.0
