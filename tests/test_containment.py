"""Planted semantics for containment_join: a small doc fully inside a
big one scores 1.0 in that direction only (the asymmetry Jaccard
cannot express), near-threshold pairs land on the exact integer cut,
and parity with the quadratic oracle holds on the planted tables."""

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
    q = REGISTRY["containment_join"]
    got = {
        (r.doc_a, r.doc_b): (r.n_a, r.inter, r.containment)
        for r in q.spark_fn(spark, str(tmp_path)).collect()
    }
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


def test_quote_inside_article_is_one_directional(spark, tmp_path):
    quote = " ".join(f"q{j}" for j in range(12))           # 10 shingles
    article = quote + " " + " ".join(f"a{j}" for j in range(120))
    other = " ".join(f"z{j}" for j in range(30))
    _write_docs(spark, tmp_path, [quote, article, other])
    got = _run(spark, tmp_path)
    # quote (doc 0) -> article (doc 1): every quote shingle except the
    # 2 seam-crossing... no seam: article starts with the quote, so all
    # 10 of the quote's shingles appear in the article verbatim
    assert got[(0, 1)] == (10, 10, 1.0)
    # the reverse direction is far below t = 0.8
    assert (1, 0) not in got
    assert all(k[0] != 2 and k[1] != 2 for k in got)  # 'other' matches nothing


def test_exact_integer_threshold_boundary(spark, tmp_path):
    # doc 0: 7 tokens -> 5 shingles; doc 1 contains 4 of them
    # (5*i >= 4*n -> 20 >= 20: exactly AT threshold, must be kept)
    a = "w0 w1 w2 w3 w4 w5 w6"
    b = "w0 w1 w2 w3 w4 w5 x0 x1 x2"  # shares shingles starting at w0..w3
    _write_docs(spark, tmp_path, [a, b])
    got = _run(spark, tmp_path)
    assert got[(0, 1)] == (5, 4, 0.8)
