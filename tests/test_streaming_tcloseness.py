"""Streaming t-closeness: fed the batch query's own anon-stage rows in
micro-batches, t_report() must EQUAL the 'anon' rows of the batch
t_closeness_report; the additive merge must be replay-safe and
batch-boundary invariant; a planted skewed class must surface in t()."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions import anonymize_ip_fast
from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.http_log import http_log_view
from http_log_anonymizer_spark.streaming.tcloseness import StreamingTClosenessMonitor

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
    mon = StreamingTClosenessMonitor(str(tmp_path / "state"), QI, "response_status")
    # 4 arbitrary micro-batches split by status hash
    for b in range(4):
        mon.write(rows.filter(F.crc32(F.col("response_status").cast("string")) % 4 == b), b)
    rows.unpersist()

    got = [tuple(r) for r in mon.t_report(spark).collect()]
    want = [
        tuple(r)[1:]  # drop the stage column
        for r in REGISTRY["t_closeness_report"].spark_fn(spark, SF).collect()
        if r.stage == "anon"
    ]
    assert got == want
    assert len(got) >= 1


def test_replay_and_boundaries_do_not_change_counts(spark, tmp_path):
    rows = _anon_rows(spark).persist()
    one = StreamingTClosenessMonitor(str(tmp_path / "one"), QI, "response_status")
    one.write(rows, 0)

    many = StreamingTClosenessMonitor(str(tmp_path / "many"), QI, "response_status")
    for b in range(3):
        many.write(rows.filter(F.crc32(F.col("remote_addr")) % 3 == b), b)
    many.write(rows.filter(F.crc32(F.col("remote_addr")) % 3 == 2), 2)  # replay
    many.write(rows.filter(F.lit(False)), 3)  # empty slice

    assert [tuple(r) for r in one.t_report(spark).collect()] == [
        tuple(r) for r in many.t_report(spark).collect()
    ]
    rows.unpersist()


def test_planted_skewed_class_raises_t(spark, tmp_path):
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "remote_addr string, cache_status string, response_status long"
    )
    mon = StreamingTClosenessMonitor(str(tmp_path / "state"), QI, "response_status")
    # balanced classes: every class mirrors the global 50/50 mixture
    bal = [("a.x", "HIT", 200), ("a.x", "HIT", 500)] * 10 + [
        ("b.x", "MISS", 200),
        ("b.x", "MISS", 500),
    ] * 10
    mon.write(mk(bal), 0)
    assert mon.t(spark) == 0.0
    # a new all-error class appears: its TVD from the mixture jumps
    mon.write(mk([("c.x", "HIT", 500)] * 20), 1)
    t = mon.t(spark)
    assert t is not None and t > 0.3
    # and the drill-down table points at the class
    worst = (
        mon.class_tvd(spark).orderBy(F.desc("tvd")).limit(1).collect()[0]
    )
    assert worst.remote_addr == "c.x" and worst.tvd == t
