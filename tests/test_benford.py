"""Planted semantics for benford_first_digit_report: a log-uniform
corpus must conform, a single-digit corpus must not, all nine digit
rows always appear, NULL/non-positive amounts are excluded, the MAD
matches a plain-Python replay exactly, and Spark/DuckDB parity holds
on every planted table."""

from __future__ import annotations

from datetime import date

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.analytics import _BENFORD_EXP
from tests.oracle import compare


def _write_orders(spark, tmp_path, totals):
    spark.createDataFrame(
        [
            (i, i, "O", t, date(1995, 1, 1), "1-URGENT")
            for i, t in enumerate(totals)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["benford_first_digit_report"]
    sdf = q.spark_fn(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"'{tmp_path}/orders.parquet/*.parquet'"
        )
        ok, msg = compare(sdf, con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return {r.digit: r for r in sdf.collect()}


def _python_mad(cents_list):
    n = len(cents_list)
    counts = {d: 0 for d in range(1, 10)}
    for c in cents_list:
        counts[int(str(c)[0])] += 1
    return sum(
        abs((counts[d] * 1_000_000) // max(n, 1) - _BENFORD_EXP[d])
        for d in range(1, 10)
    ) // 9


def test_log_uniform_corpus_conforms(spark, tmp_path):
    # totals log-uniform over three decades — the multiplicative
    # regime Benford's law describes
    totals = [round(10 ** (1 + 3 * i / 4000), 2) for i in range(4000)]
    _write_orders(spark, tmp_path, totals)
    got = _run(spark, tmp_path)
    assert got[0].conformity in ("close", "acceptable")
    cents = [round(t * 100) for t in totals]
    assert got[0].abs_dev == round(_python_mad(cents) / 1e6, 6)
    assert got[1].obs_share > got[9].obs_share  # the log-law shape


def test_single_digit_corpus_is_nonconforming(spark, tmp_path):
    _write_orders(spark, tmp_path, [50.0 + i * 0.01 for i in range(100)])
    got = _run(spark, tmp_path)
    assert got[5].obs_share == 1.0
    assert got[0].conformity == "nonconformity"
    # zero-count digits still present as deviation rows
    assert sorted(got) == list(range(10))
    assert got[1].n_obs == 0 and got[1].abs_dev == round(
        _BENFORD_EXP[1] / 1e6, 6
    )


def test_null_and_nonpositive_amounts_are_excluded(spark, tmp_path):
    spark.createDataFrame(
        [
            (0, 0, "O", 19.99, date(1995, 1, 1), "x"),
            (1, 1, "O", None, date(1995, 1, 1), "x"),
            (2, 2, "O", 0.0, date(1995, 1, 1), "x"),
            (3, 3, "O", -5.0, date(1995, 1, 1), "x"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = _run(spark, tmp_path)
    assert got[0].n_obs == 1
    assert got[1].n_obs == 1 and got[1].obs_share == 1.0
