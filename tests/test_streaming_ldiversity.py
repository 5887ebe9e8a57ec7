"""Streaming l-diversity: fed the batch query's own anon-stage rows in
micro-batches, l_report() must EQUAL the 'anon' rows of the batch
l_diversity_report; the additive merge must be replay-safe and
batch-boundary invariant; a planted homogeneous class must surface in
l() and alarms()."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions import anonymize_ip_fast
from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.http_log import http_log_view
from http_log_anonymizer_spark.streaming.ldiversity import StreamingLDiversityMonitor

SF = "/root/testdata/sf0.001"

QI = ("remote_addr", "cache_status")


def _anon_rows(spark):
    return http_log_view(spark, SF).select(
        anonymize_ip_fast("remote_addr").alias("remote_addr"),
        "cache_status",
        "response_status",
    )


def test_stream_fold_equals_batch_anon_stage(spark, tmp_path):
    rows = _anon_rows(spark).persist()
    mon = StreamingLDiversityMonitor(str(tmp_path / "state"), QI, "response_status")
    # 4 arbitrary micro-batches split by status hash
    for b in range(4):
        mon.write(
            rows.filter(F.crc32(F.col("response_status").cast("string")) % 4 == b), b
        )
    rows.unpersist()

    got = [tuple(r) for r in mon.l_report(spark).collect()]
    want = [
        tuple(r)[1:]  # drop the stage column
        for r in REGISTRY["l_diversity_report"].spark_fn(spark, SF).collect()
        if r.stage == "anon"
    ]
    assert got == want
    assert len(got) >= 1


def test_replay_and_boundaries_do_not_change_counts(spark, tmp_path):
    rows = _anon_rows(spark).persist()
    one = StreamingLDiversityMonitor(str(tmp_path / "one"), QI, "response_status")
    one.write(rows, 0)

    many = StreamingLDiversityMonitor(str(tmp_path / "many"), QI, "response_status")
    for b in range(3):
        many.write(rows.filter(F.crc32(F.col("remote_addr")) % 3 == b), b)
    many.write(rows.filter(F.crc32(F.col("remote_addr")) % 3 == 2), 2)  # replay
    many.write(rows.filter(F.lit(False)), 3)  # empty slice

    assert [tuple(r) for r in one.l_report(spark).collect()] == [
        tuple(r) for r in many.l_report(spark).collect()
    ]
    rows.unpersist()


def test_planted_homogeneous_class_trips_the_alarm(spark, tmp_path):
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "remote_addr string, cache_status string, response_status long"
    )
    mon = StreamingLDiversityMonitor(str(tmp_path / "state"), QI, "response_status")
    # healthy classes: 2 distinct sensitive values each
    mon.write(
        mk(
            [("a.x", "HIT", 200), ("a.x", "HIT", 500)] * 5
            + [("b.x", "MISS", 200), ("b.x", "MISS", 404)] * 5
        ),
        0,
    )
    assert mon.l(spark) == 2
    assert mon.alarms(spark).count() == 0
    # the homogeneity attack: a sizable class, every row one status —
    # k-anonymity is blind to it, l must drop to 1 and alarm
    mon.write(mk([("c.x", "HIT", 500)] * 20), 1)
    assert mon.l(spark) == 1
    bad = mon.alarms(spark).collect()
    assert [(r.remote_addr, r.l, r.sz) for r in bad] == [("c.x", 1, 20)]
    # a later batch giving c.x a second value clears the alarm: state
    # is additive, l can only grow per class
    mon.write(mk([("c.x", "HIT", 200)] * 2), 2)
    assert mon.l(spark) == 2
    assert mon.alarms(spark).count() == 0


def test_before_first_batch_readouts_are_none(spark, tmp_path):
    mon = StreamingLDiversityMonitor(str(tmp_path / "state"), QI, "response_status")
    assert mon.l_report(spark) is None
    assert mon.l(spark) is None
    assert mon.alarms(spark) is None
