"""Streaming storage monitor: fed the corpus in micro-batches the
report() grid must EQUAL the batch storage_estimate_report row for
row; the fold must be replay-safe and batch-boundary invariant; the
observed-rate projection must replay exactly in plain Python; the
budget alarm must page on a planted over-budget feed."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.http_log import (
    _STORAGE_COMP_PERMILLE,
    _STORAGE_FIXED_BYTES,
    http_log_view,
)
from http_log_anonymizer_spark.streaming.storage import StreamingStorageMonitor

SF = "/root/testdata/sf0.001"


def test_stream_fold_equals_batch_grid(spark, tmp_path):
    d = http_log_view(spark, SF).persist()
    mon = StreamingStorageMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(d.filter(F.col("request_time_milli") % 4 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.report(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["storage_estimate_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want


def test_replay_and_boundaries_do_not_change_the_readout(spark, tmp_path):
    d = http_log_view(spark, SF).persist()
    one = StreamingStorageMonitor(str(tmp_path / "one"))
    one.write(d, 0)
    many = StreamingStorageMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(d.filter(F.col("request_time_milli") % 3 == b), b)
    many.write(d.filter(F.col("request_time_milli") % 3 == 2), 2)  # replay
    many.write(d.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.observed(spark).collect()] == [
        tuple(r) for r in many.observed(spark).collect()
    ]
    assert [tuple(r) for r in one.report(spark).collect()] == [
        tuple(r) for r in many.report(spark).collect()
    ]
    d.unpersist()


def _planted(spark, n, span_s, addr="198.51.7.0", url="/r/7"):
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (t0 + datetime.timedelta(seconds=i * span_s / max(1, n - 1)), addr, url)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "timestamp timestamp, remote_addr string, url string"
    )


def test_observed_projection_replays_in_plain_python(spark, tmp_path):
    # 101 rows over exactly 100 s -> 1.01 rows/s = 1010 milli-rows/s
    mon = StreamingStorageMonitor(str(tmp_path / "state"), retention_days=30)
    mon.write(_planted(spark, 101, 100), 0)
    row = mon.observed(spark).collect()[0]
    bpr = _STORAGE_FIXED_BYTES + len("198.51.7.0") + len("/r/7")  # anonymizing regexp is a no-op
    assert row.n_rows == 101
    assert row.bytes_per_row_milli == bpr * 1000
    rate_milli = 101 * 1_000_000_000 // (100 * 1_000_000)
    assert row.observed_rate_milli_per_s == rate_milli
    want = (
        rate_milli * 86400 * 30 * (bpr * 1000) * _STORAGE_COMP_PERMILLE
    ) // 1_000_000_000
    assert row.projected_disk_bytes == want


def test_observed_equals_batch_capacity_twin(spark, tmp_path):
    # The monitor's observed() row must EQUAL the batch
    # capacity_observed_report row for its retention tier on the same
    # corpus, column for column (the report adds projected_rows; the
    # shared columns must match exactly).
    d = http_log_view(spark, SF).persist()
    mon = StreamingStorageMonitor(str(tmp_path / "state"), retention_days=365)
    for b in range(3):
        mon.write(d.filter(F.col("request_time_milli") % 3 == b), b)
    d.unpersist()
    got = mon.observed(spark).collect()[0].asDict()
    batch = (
        REGISTRY["capacity_observed_report"]
        .spark_fn(spark, SF)
        .filter(F.col("retention_days") == 365)
        .collect()[0]
        .asDict()
    )
    for col in got:
        assert got[col] == batch[col], col


def test_observed_rate_is_floor_exact(spark, tmp_path):
    # Exactly 10 rows over exactly 9 s -> 10e9/9e6 = 1111.11... ->
    # floor 1111 milli-rows/s. Pins the 1e9 scaling of the rate term
    # against silent drift (a wrong scale or a float division would
    # miss this exact integer).
    mon = StreamingStorageMonitor(str(tmp_path / "state"))
    mon.write(_planted(spark, 10, 9), 0)
    row = mon.observed(spark).collect()[0]
    assert row.observed_rate_milli_per_s == 1111


def test_high_rate_projection_does_not_overflow_int64(spark, tmp_path):
    # 10 rows over exactly 9 us -> 10e9/9 = 1_111_111_111 milli-rows/s
    # (~1.1M rows/s). The projection product rate_milli * 86400 * 365
    # * bytes_per_row_milli * permille reaches ~5e23 — far past int64
    # (~9.2e18) — so an all-bigint chain wraps or raises under ANSI
    # mode; the DECIMAL(38,0) chain must return the exact floor
    # replayed here in unbounded plain-Python ints.
    mon = StreamingStorageMonitor(str(tmp_path / "state"), retention_days=365)
    mon.write(_planted(spark, 10, 9e-6), 0)
    row = mon.observed(spark).collect()[0]
    rate_milli = 10 * 1_000_000_000 // 9
    assert row.observed_rate_milli_per_s == rate_milli
    bpr_milli = row.bytes_per_row_milli
    product = rate_milli * 86400 * 365 * bpr_milli * _STORAGE_COMP_PERMILLE
    assert product > 2**63  # the intermediate genuinely exceeds int64
    want = product // 1_000_000_000  # ...while the final floor fits
    assert want < 2**63
    assert row.projected_disk_bytes == want
    # and the alarm predicate sees the un-wrapped (positive) number
    loud = StreamingStorageMonitor(
        str(tmp_path / "state"), retention_days=365, disk_budget_bytes=want
    )
    assert loud.alarms(spark) == ["storage_budget"]


def test_single_instant_stream_yields_null_rate_not_a_crash(spark, tmp_path):
    mon = StreamingStorageMonitor(str(tmp_path / "state"))
    mon.write(_planted(spark, 1, 0), 0)
    row = mon.observed(spark).collect()[0]
    assert row.n_rows == 1
    assert row.observed_rate_milli_per_s is None
    assert row.projected_disk_bytes is None
    assert mon.alarms(spark) == []  # budget 0 = paging disabled anyway


def test_budget_alarm_pages_exactly_at_the_threshold(spark, tmp_path):
    mon = StreamingStorageMonitor(
        str(tmp_path / "state"), retention_days=30, disk_budget_bytes=1
    )
    assert mon.alarms(spark) == []  # no state yet
    mon.write(_planted(spark, 101, 100), 0)
    proj = mon.observed(spark).collect()[0].projected_disk_bytes
    assert mon.alarms(spark) == ["storage_budget"]  # 1 byte budget
    quiet = StreamingStorageMonitor(
        str(tmp_path / "state"),
        retention_days=30,
        disk_budget_bytes=proj + 1,
    )
    assert quiet.alarms(spark) == []
    exact = StreamingStorageMonitor(
        str(tmp_path / "state"), retention_days=30, disk_budget_bytes=proj
    )
    assert exact.alarms(spark) == ["storage_budget"]  # >= is the contract
