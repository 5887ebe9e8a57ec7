"""Changepoint detection: a planted mean shift must be found exactly,
and the gain must match a float reference within fixed-point slack —
independent of the DuckDB parity that test_registry_oracle enforces."""

from __future__ import annotations

import datetime as dt

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _write_orders(spark, tmpdir, series):
    """series: list of (date, [prices...]) -> orders parquet at tmpdir."""
    rows = []
    key = 0
    for d, prices in series:
        for p in prices:
            key += 1
            rows.append((key, key % 97, "O", float(p), d, "1-URGENT"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/orders.parquet")
    return str(tmpdir)


def test_planted_mean_shift_is_top_split(spark, tmp_path):
    # 20 days at mean $100, then 20 days at mean $500: the optimal
    # binary-segmentation split is the last low day.
    d0 = dt.date(2024, 1, 1)
    series = []
    for i in range(40):
        base = 100.0 if i < 20 else 500.0
        day = d0 + dt.timedelta(days=i)
        series.append((day, [base - 1.0, base, base + 1.0]))
    sf_dir = _write_orders(spark, tmp_path, series)
    top = REGISTRY["changepoint_revenue"].spark_fn(spark, sf_dir).collect()
    assert top[0].split_date == d0 + dt.timedelta(days=19)
    assert top[0].n_left == 60 and top[0].n_right == 60
    assert top[0].mean_left_cents == 10000
    assert top[0].mean_right_cents == 50000

    # Float reference for the winning gain (cents^2): daily sums are
    # 3*mean exactly, so SSE reduction = n_l*n_r/n * (mu_l - mu_r)^2
    # over DAILY means... the query works on per-order cents: compute
    # directly.
    cents = [int(p * 100) for _, ps in series for p in ps]
    nl = 60
    sl, st = sum(cents[:nl]), sum(cents)
    want = sl * sl / nl + (st - sl) ** 2 / (len(cents) - nl) - st * st / len(cents)
    assert abs(top[0].sse_gain_cents2 - want) <= 3  # fixed-point slack


def test_flat_series_has_zero_gain(spark, tmp_path):
    d0 = dt.date(2024, 3, 1)
    series = [(d0 + dt.timedelta(days=i), [250.0, 250.0]) for i in range(10)]
    sf_dir = _write_orders(spark, tmp_path, series)
    rows = REGISTRY["changepoint_revenue"].spark_fn(spark, sf_dir).collect()
    assert all(r.sse_gain_cents2 == 0 for r in rows)  # clamp + exactness


def test_runs_on_real_corpus(spark):
    rows = REGISTRY["changepoint_revenue"].spark_fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert all(r.sse_gain_cents2 >= 0 for r in rows)
    gains = [r.sse_gain_cents2 for r in rows]
    assert gains == sorted(gains, reverse=True)
