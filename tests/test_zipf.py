"""Planted semantics for zipf_fit_report: an exact power-law corpus
recovers its exponent, a uniform corpus yields NULL fit (zero count
variance), and parity holds on the planted tables."""

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
    q = REGISTRY["zipf_fit_report"]
    got = {r.cohort: r for r in q.spark_fn(spark, str(tmp_path)).collect()}
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


def test_exact_power_law_recovers_its_exponent(spark, tmp_path):
    # token w_r occurs floor(1024 / r^1) times for ranks 1..32: an
    # exact slope -1 corpus (up to the floor's rounding)
    toks = []
    for r in range(1, 33):
        toks += [f"w{r:02d}"] * (1024 // r)
    text = " ".join(toks)
    _write_docs(spark, tmp_path, [text])
    got = _run(spark, tmp_path)
    s = got["s"]
    assert s.n_types == 32
    assert -1.05 <= s.zipf_slope <= -0.95
    assert s.r2 > 0.99
    assert abs(s.top_share - 1024 / s.n_tokens) < 1e-4


def test_single_type_cohort_yields_null_slope_and_r2(spark, tmp_path):
    # one vocabulary type: no rank variance, so BOTH slope and R^2 are
    # NULL — gated on the exact integer n_types = 1, not on whether a
    # cancelled float moment happened to land on the right side of 0
    _write_docs(spark, tmp_path, ["solo solo solo solo solo"])
    got = _run(spark, tmp_path)
    s = got["s"]
    assert s.n_types == 1
    assert s.zipf_slope is None and s.r2 is None
    assert s.top_share == 1.0


def test_uniform_counts_yield_null_fit(spark, tmp_path):
    # every token exactly 4 times: zero y-variance -> the least-squares
    # slope is exactly 0 (flat) and R^2 is undefined (NULL)
    text = " ".join(f"u{i}" for i in range(20)) + " "
    _write_docs(spark, tmp_path, [(text * 4).strip()])
    got = _run(spark, tmp_path)
    s = got["s"]
    assert s.zipf_slope == 0.0 and s.r2 is None
    assert s.top_share == round(4 / s.n_tokens, 4)
