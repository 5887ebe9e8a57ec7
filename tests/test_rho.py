"""Planted semantics for rho_excess_loss_report: hand-computed excess
on a two-doc corpus, the empty-reference edge (all OOV, NULL shares),
and oracle parity on every planting."""

from __future__ import annotations

import math

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, s, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["rho_excess_loss_report"]
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


def test_hand_computed_excess(spark, tmp_path):
    # doc 0 (reference slice, id % 5 == 0): "a b a b"
    #   c2R(a,b)=2 c1R(a)=2 -> nllR(a,b)=0; c2R(b,a)=1 c1R(b)=1 -> 0
    # doc 1 (corpus only): "a c a c"
    # corpus: c2C(a,b)=2 c1C(a)=4 -> nllC(a,b)=ln 2; (b,a): 1/1 -> 0
    # excess(a,b) = ln 2 > 0.25 (kept, 2 occurrences); (b,a) = 0;
    # (a,c)/(c,a) are reference-OOV (3 occurrences)
    _write_docs(spark, tmp_path, [(0, "s", "a b a b"), (1, "s", "a c a c")])
    r = _run(spark, tmp_path)["s"]
    assert r.n_pairs == 6 and r.n_scored == 3 and r.n_oov == 3
    assert r.n_kept == 2
    assert r.kept_share == round(2 / 3, 4)
    grid_ln2 = round(math.log(2) * 1_000_000)  # 693147
    assert r.mean_excess == round(2 * grid_ln2 / 1_000_000 / 3, 4)


def test_empty_reference_slice_is_all_oov(spark, tmp_path):
    # no doc_id % 5 == 0 docs: the reference model is empty, every
    # occurrence is unscorable, shares are NULL not crashes
    _write_docs(spark, tmp_path, [(1, "s", "a b a b"), (2, "s", "a c a c")])
    r = _run(spark, tmp_path)["s"]
    assert r.n_pairs == 6 and r.n_scored == 0 and r.n_oov == 6
    assert r.n_kept == 0
    assert r.kept_share is None and r.mean_excess is None


def test_sources_are_independent_cohorts(spark, tmp_path):
    # the models are corpus-global but the report is per source: a
    # source whose text matches the reference distribution has zero
    # excess everywhere; one that diverges gets OOV + kept mass
    _write_docs(
        spark,
        tmp_path,
        [
            (0, "clean", "x y x y x y"),
            (1, "clean", "x y x y x y"),
            (2, "weird", "p q p q p q"),
        ],
    )
    got = _run(spark, tmp_path)
    assert got["clean"].n_oov == 0 and got["clean"].n_kept == 0
    assert got["weird"].n_scored == 0 and got["weird"].n_oov == 5
