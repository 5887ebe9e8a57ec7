"""Planted semantics for gopher_repetition_report: the synthetic corpus
never trips the duplicated-{5..10}-gram gates (short random docs), so
the thresholds' exactness and the fold's run-closing logic are pinned
here on constructed documents, with oracle parity on every planting."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["gopher_repetition_report"]
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


def test_pure_repetition_trips_every_gate(spark, tmp_path):
    # "x" * 20: every n-gram is the same gram, so top-gram mass and
    # duplicated mass both exceed the text (occurrence-sum form) and
    # all nine gates flag. total = 39 chars; e.g. top-2 mass =
    # 19 occurrences * 3 chars = 57 > 0.20 * 39.
    _write_docs(spark, tmp_path, [("rep", " ".join(["x"] * 20))])
    r = _run(spark, tmp_path)["rep"]
    assert r.n_docs == 1 and r.n_keep == 0
    for c in (
        "n_bad_top2 n_bad_top3 n_bad_top4 n_bad_dup5 n_bad_dup6 "
        "n_bad_dup7 n_bad_dup8 n_bad_dup9 n_bad_dup10"
    ).split():
        assert getattr(r, c) == 1, c
    # top-2 fraction exactly 57/39; dup-5 mass = 16 occurrences * 9 chars
    assert abs(r.avg_top2_frac - 57 / 39) < 1e-4
    assert abs(r.avg_dup5_frac - 144 / 39) < 1e-4


def test_all_unique_tokens_keep(spark, tmp_path):
    # 30 distinct tokens: no gram repeats anywhere, top-n mass is one
    # gram's length — far under every threshold
    _write_docs(spark, tmp_path, [("u", " ".join(f"tok{i:02d}" for i in range(30)))])
    r = _run(spark, tmp_path)["u"]
    assert r.n_keep == 1
    assert r.avg_dup5_frac == 0.0 and r.avg_dup10_frac == 0.0


def test_single_duplicated_5gram_flags_only_dup5(spark, tmp_path):
    # tokens p q r s t u p q r s t v: the 5-gram "p q r s t" occurs
    # twice (mass 2*9=18 of 23 chars, 100*18 > 15*23) but no 6-gram
    # repeats, so dup5 flags and dup6..dup10 stay clean. The top-2
    # gates also trip ("p q" mass 2*3=6, 100*6 > 20*23) — asserted so
    # the planting stays honest.
    _write_docs(spark, tmp_path, [("d5", "p q r s t u p q r s t v")])
    r = _run(spark, tmp_path)["d5"]
    assert r.n_bad_dup5 == 1
    assert r.n_bad_dup6 == 0 and r.n_bad_dup10 == 0
    assert abs(r.avg_dup5_frac - 18 / 23) < 1e-4


def test_empty_and_short_docs_keep_with_zero_fractions(spark, tmp_path):
    # empty text: no grams, total = 0, integer gates 0 > 0 all false;
    # a one-token doc has no 2-grams at all
    _write_docs(spark, tmp_path, [("e", ""), ("e", "solo")])
    r = _run(spark, tmp_path)["e"]
    assert r.n_docs == 2 and r.n_keep == 2
    assert r.avg_top2_frac == 0.0 and r.avg_dup5_frac == 0.0


def test_null_text_rows_are_excluded(spark, tmp_path):
    spark.createDataFrame(
        [(1, None, "en", "n", 0), (2, "a b c d e f", "en", "n", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = _run(spark, tmp_path)["n"]
    assert r.n_docs == 1


def test_threshold_boundary_is_strict(spark, tmp_path):
    # exact-equality boundary: top-2 mass == 20% of total must NOT
    # flag (strict >). tokens "aa bb" once: top-2 gram "aa bb" mass 5,
    # total 5 -> 100*5 > 20*5 flags (frac 1.0). Build instead a doc
    # where 100 * mass == pct * total exactly: mass 3 ("a b"), need
    # total 15 with no other repeated 2-gram contributing more mass:
    # "a b" once in a 15-char text -> 100*3 = 20*15. Tokens:
    # a b ccc ddd eee -> text "a b ccc ddd eee" = 15 chars, top-2 mass
    # max(len("a b")=3, len("b ccc")=5, ...) = 7 ("ddd eee")... use
    # single-char fillers: a b c d e f g h -> total 15, every 2-gram
    # mass 3 -> 100*3 == 20*15 -> NOT flagged.
    # (top3/top4 legitimately flag here — a single 5-char 3-gram is
    # already a third of 15 chars — so only the boundary gate is pinned)
    _write_docs(spark, tmp_path, [("b", "a b c d e f g h")])
    r = _run(spark, tmp_path)["b"]
    assert r.n_bad_top2 == 0
    assert abs(r.avg_top2_frac - 3 / 15) < 1e-4


def test_plan_is_shuffle_minimal_and_jvm_only(spark):
    # per-doc work is array-native: no explode-side aggregation, no
    # Python eval; the only wide ops are the final (source) aggregate
    # and the presentation sort
    df = REGISTRY["gopher_repetition_report"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 3  # partial->final agg + orderBy range
    assert "Generate" not in plan  # no explode anywhere
