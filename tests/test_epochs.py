"""Planted semantics for epochs_per_source_report: uniform sources run
exactly the budget multiple, temperature upsampling pushes tail sources
over the 4-epoch knee, and parity holds on every planting."""

from __future__ import annotations

import math

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

_RSTAR = 15.4


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["epochs_per_source_report"]
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


def test_uniform_sources_run_exactly_the_budget(spark, tmp_path):
    # equal token mass: sample_prob == token_share, so every source
    # runs exactly budget-mult epochs; the knee flag is strict >
    text = " ".join(f"t{i}" for i in range(10))
    _write_docs(spark, tmp_path, [("a", text), ("b", text), ("c", text)])
    got = _run(spark, tmp_path)
    eff = round(1 + _RSTAR * (1 - math.exp(-3 / _RSTAR)), 4)
    for s in "abc":
        assert got[s].epochs == 4.0
        assert not got[s].over_knee
        assert got[s].effective_epochs == eff


def test_temperature_upsampling_pushes_tail_over_knee(spark, tmp_path):
    # a 100:1 skew: alpha = 0.3 upsamples the tail source far past the
    # knee while the head source trains under-budget
    big = " ".join(f"b{i}" for i in range(200))
    small = "s0 s1"
    _write_docs(spark, tmp_path, [("head", big), ("tail", small)])
    got = _run(spark, tmp_path)
    assert got["tail"].over_knee and got["tail"].epochs > 4
    assert not got["head"].over_knee and got["head"].epochs < 4
    # diminishing returns: effective epochs always <= nominal epochs
    # once past 1 (the decay only shaves value off repetition)
    assert got["tail"].effective_epochs < got["tail"].epochs


def test_single_source_is_the_budget_identity(spark, tmp_path):
    _write_docs(spark, tmp_path, [("only", "x y z w")])
    got = _run(spark, tmp_path)
    assert got["only"].token_share == 1.0 and got["only"].epochs == 4.0
