"""Streaming bootstrap monitor: fed the orders table in micro-batches
the report() replica table must EQUAL the batch
poisson_bootstrap_report row for row; the fold must be replay-safe and
batch-boundary invariant; the CI row must replay in plain Python from
the replica table; the uncertainty alarm must page on a planted
too-wide band."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.streaming.bootstrap import StreamingBootstrapMonitor

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")


def test_stream_fold_equals_batch_replicas(spark, tmp_path):
    d = _orders(spark).persist()
    mon = StreamingBootstrapMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(d.filter(F.col("o_orderkey") % 4 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.report(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["poisson_bootstrap_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want


def test_replay_and_boundaries_do_not_change_the_readout(spark, tmp_path):
    d = _orders(spark).persist()
    one = StreamingBootstrapMonitor(str(tmp_path / "one"))
    one.write(d, 0)
    many = StreamingBootstrapMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(d.filter(F.col("o_orderkey") % 3 == b), b)
    many.write(d.filter(F.col("o_orderkey") % 3 == 2), 2)  # replay
    many.write(d.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.report(spark).collect()] == [
        tuple(r) for r in many.report(spark).collect()
    ]
    d.unpersist()


def test_ci_row_replays_from_the_replica_table(spark, tmp_path):
    mon = StreamingBootstrapMonitor(str(tmp_path / "state"))
    mon.write(_orders(spark), 0)
    reps = {r.replica_id: r.mean_microcents for r in mon.report(spark).collect()}
    row = mon.ci(spark).collect()[0]
    boot = [v for k, v in reps.items() if k > 0]
    assert row.point_microcents == reps[0]
    assert row.ci_lo_microcents == min(boot)
    assert row.ci_hi_microcents == max(boot)
    assert row.rel_width_permille == (
        1000 * (max(boot) - min(boot))
    ) // reps[0]
    assert row.ci_lo_microcents <= row.point_microcents <= row.ci_hi_microcents


def test_uncertainty_alarm_pages_exactly_at_the_bound(spark, tmp_path):
    mon = StreamingBootstrapMonitor(str(tmp_path / "state"), max_rel_width_permille=1)
    assert mon.alarms(spark) == []  # no state yet
    mon.write(_orders(spark), 0)
    w = mon.ci(spark).collect()[0].rel_width_permille
    assert w >= 1
    assert mon.alarms(spark) == ["bootstrap_uncertainty"]
    quiet = StreamingBootstrapMonitor(
        str(tmp_path / "state"), max_rel_width_permille=w + 1
    )
    assert quiet.alarms(spark) == []
    exact = StreamingBootstrapMonitor(
        str(tmp_path / "state"), max_rel_width_permille=w
    )
    assert exact.alarms(spark) == ["bootstrap_uncertainty"]  # >= contract
