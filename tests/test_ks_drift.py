"""Planted-distribution semantics for ks_drift_report: the statistic
must equal the textbook two-sample KS / Wasserstein-1 on hand-checkable
inputs (identical windows -> 0; disjoint supports -> 1; a known shift
-> the exact ECDF gap), and the Spark/DuckDB parity must hold on the
planted tables too."""

from __future__ import annotations

import datetime as dt

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.analytics import _PSI_SPLIT_DAY
from tests.oracle import compare


def _write_events(spark, tmp_path, rows):
    """rows: (event_type, value, is_ref). Ref rows land on day 1,
    current rows on day 20 (the query splits at day {_PSI_SPLIT_DAY})."""
    data = [
        (
            et,
            float(v),
            dt.datetime(2024, 3, 1 if is_ref else 20, 12, 0, 0),
            0,
        )
        for et, v, is_ref in rows
    ]
    spark.createDataFrame(
        data, "event_type string, value double, ts timestamp, user_id long"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _run(spark, tmp_path):
    got = {
        r.cohort: r
        for r in REGISTRY["ks_drift_report"].spark_fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet/*.parquet'"
        )
        ok, msg = compare(
            REGISTRY["ks_drift_report"].spark_fn(spark, str(tmp_path)),
            con.execute(REGISTRY["ks_drift_report"].oracle).df(),
        )
        assert ok, msg
    finally:
        con.close()
    return got


def test_identical_windows_have_zero_drift(spark, tmp_path):
    vals = [0.10, 0.25, 0.40, 0.80]
    rows = [("a", v, True) for v in vals] + [("a", v, False) for v in vals]
    _write_events(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    assert got["a"].ks == 0.0 and got["a"].w1_cents == 0.0
    assert not got["a"].reject_h0
    assert got["ALL"].ks == 0.0


def test_disjoint_supports_have_ks_one_and_w1_equals_mean_shift(spark, tmp_path):
    # ref uniformly on {10,20} cents, cur on {110,120}: KS = 1, and
    # W1 = |mean shift| = 100 cents for a pure translation
    rows = [("a", 0.10, True), ("a", 0.20, True), ("a", 1.10, False), ("a", 1.20, False)]
    _write_events(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    assert got["a"].ks == 1.0
    assert got["a"].w1_cents == 100.0
    assert got["a"].ks_at == 20  # the gap first reaches its max at ref's top
    # n=2 vs 2 is far below the 5% critical value's power... KS=1 with
    # crit = 1.358*sqrt(4/4) = 1.358: not rejected at this tiny n —
    # exactly what the asymptotic formula says
    assert not got["a"].reject_h0


def test_known_shift_gap_and_pooled_cohort(spark, tmp_path):
    # ref: 4 points at 10; cur: 1 at 10, 3 at 30 -> ECDF gap at 10 is
    # |1 - 0.25| = 0.75; W1 = 0.75 * (30-10) = 15 cents
    rows = (
        [("a", 0.10, True)] * 4
        + [("a", 0.10, False)]
        + [("a", 0.30, False)] * 3
    )
    # a second, drift-free cohort keeps the pooled ALL honest
    rows += [("b", 0.50, True), ("b", 0.50, False)]
    _write_events(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    assert got["a"].ks == 0.75
    assert got["a"].ks_at == 10
    assert got["a"].w1_cents == 15.0
    assert got["b"].ks == 0.0
    # pooled: ref = {10:4, 50:1} (n=5), cur = {10:1, 30:3, 50:1} (n=5);
    # max gap at 10: |4/5 - 1/5| = 0.6
    assert got["ALL"].ks == 0.6
    assert got["ALL"].n_ref == 5 and got["ALL"].n_cur == 5
