"""Streaming Benford monitor: fed the orders in micro-batches the
readout must EQUAL the batch benford_first_digit_report row for row;
the fold must be replay-safe and batch-boundary invariant; a
conforming feed that flips to constant-digit amounts must page through
a real availableNow stream."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.streaming.benford import StreamingBenfordMonitor

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")


def test_stream_fold_equals_batch_report(spark, tmp_path):
    d = _orders(spark).persist()
    mon = StreamingBenfordMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(d.filter(F.col("o_orderkey") % 4 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.report(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["benford_first_digit_report"]
        .spark_fn(spark, SF)
        .collect()
    ]
    assert got == want


def test_replay_and_boundaries_do_not_change_the_report(spark, tmp_path):
    d = _orders(spark).persist()
    one = StreamingBenfordMonitor(str(tmp_path / "one"))
    one.write(d, 0)
    many = StreamingBenfordMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(d.filter(F.col("o_orderkey") % 3 == b), b)
    many.write(d.filter(F.col("o_orderkey") % 3 == 2), 2)  # replay
    many.write(d.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.report(spark).collect()] == [
        tuple(r) for r in many.report(spark).collect()
    ]
    d.unpersist()


def test_digit_shift_alarms_through_real_stream(spark, tmp_path):
    """A log-uniform (conforming) feed stays quiet; when a capped
    generator floods constant-leading-digit amounts, the pooled MAD
    crosses Nigrini's nonconformity line and the monitor pages —
    through an actual readStream -> foreachBatch -> availableNow
    query."""
    src = tmp_path / "src"
    src.mkdir()
    good = [round(10 ** (1 + 3 * i / 400), 2) for i in range(400)]
    (src / "f0.json").write_text(
        "\n".join(
            json.dumps({"o_orderkey": i, "o_totalprice": t})
            for i, t in enumerate(good)
        )
    )
    (src / "f1.json").write_text(
        "\n".join(
            json.dumps({"o_orderkey": 1000 + i, "o_totalprice": 50.0 + i})
            for i in range(2000)
        )
    )
    mon = StreamingBenfordMonitor(str(tmp_path / "state"))
    assert mon.report(spark) is None
    assert mon.alarms(spark) == []
    stream = (
        spark.readStream.schema("o_orderkey long, o_totalprice double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(mon.write)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    alarms = mon.alarms(spark)
    assert alarms and alarms[0].startswith("benford_deviation:")
    pooled = mon.report(spark).filter("digit = 0").collect()[0]
    assert pooled.conformity == "nonconformity"
