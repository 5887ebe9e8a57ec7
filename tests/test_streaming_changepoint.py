"""Streaming changepoint monitor: fed the orders table in micro-batches
the report() must EQUAL the batch changepoint_revenue report row for
row; the fold must be replay-safe and batch-boundary invariant; the
alarm must page on a planted regime shift and stay silent on a flat
feed."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.streaming.changepoint import (
    StreamingChangepointMonitor,
)

SF = "/root/testdata/sf0.001"


def test_stream_fold_equals_batch_report(spark, tmp_path):
    d = load_table(spark, SF, "orders").persist()
    mon = StreamingChangepointMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(d.filter(F.col("o_orderkey") % 4 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.report(spark).collect()]
    want = [
        tuple(r) for r in REGISTRY["changepoint_revenue"].spark_fn(spark, SF).collect()
    ]
    assert got == want and len(got) == 5


def test_replay_and_boundaries_do_not_change_the_readout(spark, tmp_path):
    d = load_table(spark, SF, "orders").persist()
    one = StreamingChangepointMonitor(str(tmp_path / "one"))
    one.write(d, 0)
    many = StreamingChangepointMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(d.filter(F.col("o_orderkey") % 3 == b), b)
    many.write(d.filter(F.col("o_orderkey") % 3 == 2), 2)  # replay
    many.write(d.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.report(spark).collect()] == [
        tuple(r) for r in many.report(spark).collect()
    ]
    d.unpersist()


def _orders(spark, series):
    rows = []
    key = 0
    for d, prices in series:
        for p in prices:
            key += 1
            rows.append((key, key % 7, "O", float(p), d, "1-URGENT"))
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )


def test_alarm_pages_on_planted_shift_and_not_on_flat(spark, tmp_path):
    d0 = dt.date(2024, 1, 1)
    flat = _orders(
        spark, [(d0 + dt.timedelta(days=i), [100.0, 100.0]) for i in range(10)]
    )
    mon = StreamingChangepointMonitor(str(tmp_path / "flat"))
    mon.write(flat, 0)
    assert mon.alarms(spark, min_gain_cents2=1).count() == 0

    # the low days arrive first, the shift arrives in a LATER batch —
    # the alarm must fire only once the high regime has been observed
    low = _orders(
        spark, [(d0 + dt.timedelta(days=i), [100.0, 100.0]) for i in range(10)]
    )
    high = _orders(
        spark,
        [(d0 + dt.timedelta(days=10 + i), [900.0, 900.0]) for i in range(10)],
    )
    shift = StreamingChangepointMonitor(str(tmp_path / "shift"))
    shift.write(low, 0)
    assert shift.alarms(spark, min_gain_cents2=10**6).count() == 0
    shift.write(high, 1)
    top = shift.report(spark).collect()[0]
    assert top.split_date == d0 + dt.timedelta(days=9)
    assert shift.alarms(spark, min_gain_cents2=10**6).count() >= 1


def test_empty_state_report_is_empty(spark, tmp_path):
    mon = StreamingChangepointMonitor(str(tmp_path / "none"))
    assert mon.report(spark).count() == 0


def test_trend_readout_equals_batch_theilsen(spark, tmp_path):
    d = load_table(spark, SF, "orders").persist()
    mon = StreamingChangepointMonitor(str(tmp_path / "trend"))
    for b in range(3):
        mon.write(d.filter(F.col("o_orderkey") % 3 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.trend(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["theilsen_trend_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want and len(got) == 1
