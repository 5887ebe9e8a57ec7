"""Planted semantics for sequential_patterns: subsequence containment
(gaps allowed, order enforced, once per session), the greedy
earliest-occurrence witness, repeat handling, session boundaries, and
Spark/DuckDB parity on every planted table."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

_T0 = datetime(2024, 3, 1, 12, 0, 0)


def _write_events(spark, tmp_path, sessions):
    """sessions: list of (user_id, [event_type, ...]) — events 1 s
    apart within a session, sessions 2 h apart per user."""
    rows = []
    eid = 0
    per_user_session = {}
    for user, types in sessions:
        k = per_user_session.get(user, 0)
        per_user_session[user] = k + 1
        for j, t in enumerate(types):
            rows.append(
                (eid, _T0 + timedelta(hours=2 * k, seconds=j), user, t, 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["sequential_patterns"]
    sdf = q.spark_fn(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet/*.parquet'"
        )
        ok, msg = compare(sdf, con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return {
        (r.pattern_len, r.e1, r.e2, r.e3): r.n_sessions for r in sdf.collect()
    }


def test_gaps_allowed_order_enforced(spark, tmp_path):
    # one session [a, x, b]: supports (a,b) across the gap but not
    # (b,a); every 3-pattern consistent with the order appears
    _write_events(spark, tmp_path, [(1, ["a", "x", "b"])])
    got = _run(spark, tmp_path)
    assert got[(2, "a", "b", None)] == 1
    assert (2, "b", "a", None) not in got
    assert got[(3, "a", "x", "b")] == 1
    assert (3, "b", "x", "a") not in got


def test_repeats_need_two_occurrences(spark, tmp_path):
    _write_events(spark, tmp_path, [(1, ["a"]), (2, ["a", "a"])])
    got = _run(spark, tmp_path)
    assert got[(1, "a", None, None)] == 2
    assert got[(2, "a", "a", None)] == 1  # only user 2's session


def test_support_counts_once_per_session(spark, tmp_path):
    # [a,b,a,b] contains (a,b) three ways but supports it ONCE
    _write_events(spark, tmp_path, [(1, ["a", "b", "a", "b"])])
    got = _run(spark, tmp_path)
    assert got[(2, "a", "b", None)] == 1
    assert got[(3, "a", "b", "a")] == 1
    assert got[(3, "a", "a", "b")] == 1
    assert got[(3, "b", "a", "b")] == 1


def test_greedy_witness_finds_interleaved_pattern(spark, tmp_path):
    # [a, c, b, c]: (a,b,c) needs the SECOND c — the greedy
    # earliest-a, earliest-b-after, any-c-after witness finds it
    _write_events(spark, tmp_path, [(1, ["a", "c", "b", "c"])])
    got = _run(spark, tmp_path)
    assert got[(3, "a", "b", "c")] == 1
    assert (3, "c", "a", "b") not in got


def test_sessions_do_not_leak_across_the_gap(spark, tmp_path):
    # same user, two sessions 2 h apart: (a,b) never spans the gap
    _write_events(spark, tmp_path, [(1, ["a"]), (1, ["b"])])
    got = _run(spark, tmp_path)
    assert got[(1, "a", None, None)] == 1
    assert got[(1, "b", None, None)] == 1
    assert (2, "a", "b", None) not in got
