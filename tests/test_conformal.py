"""Planted semantics for conformal_threshold_report: the whole table
must replay exactly in plain Python (split rule, logistic score, grid,
k-th-smallest threshold, realized coverage), unattainably small alpha
must yield the NULL keep-everything threshold, identical scores must
give full coverage, and Spark/DuckDB parity must hold on every planted
table."""

from __future__ import annotations

import hashlib
import math

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.curation import (
    _CONF_ALPHAS,
    _CONF_CAL_PCT,
    _CONF_GRID,
    _STOPWORDS,
    _W0,
    _WL,
    _WS,
    _WU,
)
from tests.oracle import compare


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["conformal_threshold_report"]
    sdf = q.spark_fn(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        ok, msg = compare(sdf, con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return {r.alpha: r for r in sdf.collect()}


def _grid_score(text: str) -> int:
    toks = text.split(" ")
    n = len(toks)
    uniq = len(set(toks)) / n
    stop = sum(1 for t in toks if t in _STOPWORDS) / n
    z = _W0 + _WU * uniq + _WS * stop + _WL * math.log(n)
    s = 1.0 / (1.0 + math.exp(-z))
    return int(math.floor(s * _CONF_GRID + 0.5))


def _is_cal(doc_id: int) -> bool:
    h = int(hashlib.md5(f"conf|{doc_id}".encode()).hexdigest()[:15], 16)
    return h % 100 < _CONF_CAL_PCT


def test_matches_python_reference(spark, tmp_path):
    # 120 docs with varying uniqueness/stopword mix -> a spread of
    # scores on the grid
    texts = [
        " ".join(
            (["join", "hash"] * (i % 4 + 1))
            + [f"w{j}" for j in range(i % 17 + 3)]
        )
        for i in range(120)
    ]
    _write_docs(spark, tmp_path, texts)
    got = _run(spark, tmp_path)
    cal = sorted(
        _grid_score(t) for i, t in enumerate(texts) if _is_cal(i)
    )
    ev = [_grid_score(t) for i, t in enumerate(texts) if not _is_cal(i)]
    for a_pct in _CONF_ALPHAS:
        r = got[round(a_pct / 100.0, 2)]
        k = (a_pct * (len(cal) + 1)) // 100
        assert r.n_cal == len(cal) and r.k_rank == k
        if k < 1:
            assert r.threshold is None
            kept = len(ev)
        else:
            qt = cal[k - 1]
            assert r.threshold == round(qt / _CONF_GRID, 4)
            kept = sum(1 for q in ev if q >= qt)
        assert r.n_kept_eval == kept
        assert r.coverage_eval == round(kept / len(ev), 6)


def test_small_calibration_yields_null_threshold(spark, tmp_path):
    # ~20% of 30 docs calibrate: alpha = 0.01 gives k = 0 -> the
    # conformal keep-everything threshold
    _write_docs(spark, tmp_path, ["alpha beta gamma"] * 30)
    got = _run(spark, tmp_path)
    assert got[0.01].k_rank == 0
    assert got[0.01].threshold is None
    assert got[0.01].coverage_eval == 1.0


def test_identical_scores_keep_everything_at_any_attainable_alpha(
    spark, tmp_path
):
    _write_docs(spark, tmp_path, ["one two three four five six"] * 200)
    got = _run(spark, tmp_path)
    for r in got.values():
        if r.k_rank >= 1:
            assert r.coverage_eval == 1.0  # q >= qt holds with equality


def test_empty_eval_split_still_reports_every_alpha(spark, tmp_path):
    """ADVICE r08: with an empty eval bucket table (here: every text is
    NULL, so BOTH splits are empty) the oracle's LEFT JOIN ... ON true
    still yields the 4 alpha rows with n_kept_eval = 0, while an inner
    Spark join would return 0 rows. Pin the left-join fix: 4 rows, all
    n_kept_eval = 0, NULL thresholds (k < 1) and NULL coverage."""
    spark.createDataFrame(
        [(i, None, "en", "s", 0) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = _run(spark, tmp_path)
    assert len(rows) == len(_CONF_ALPHAS)
    for r in rows.values():
        assert r.n_kept_eval == 0
        assert r.n_eval == 0
        assert r.threshold is None
        assert r.coverage_eval is None
