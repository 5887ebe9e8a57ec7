"""Streaming watermark monitor: fed the corpus in micro-batches the
readout must EQUAL the batch watermark_greenlist_report row for row;
the fold must be replay-safe and batch-boundary invariant; a planted
watermarked feed must raise the alarm through a real availableNow
stream."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.streaming.watermark import StreamingWatermarkMonitor
from tests.test_watermark import _random_text, _watermarked_text

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("source", "doc_id", "text")


def test_stream_fold_equals_batch_report(spark, tmp_path):
    d = _docs(spark).persist()
    mon = StreamingWatermarkMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(d.filter(F.col("doc_id") % 4 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.report(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["watermark_greenlist_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want


def test_replay_and_boundaries_do_not_change_evidence(spark, tmp_path):
    d = _docs(spark).persist()
    one = StreamingWatermarkMonitor(str(tmp_path / "one"))
    one.write(d, 0)
    many = StreamingWatermarkMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(d.filter(F.col("doc_id") % 3 == b), b)
    many.write(d.filter(F.col("doc_id") % 3 == 2), 2)  # same-batch-id replay
    many.write(d.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.report(spark).collect()] == [
        tuple(r) for r in many.report(spark).collect()
    ]
    d.unpersist()


def test_watermark_leak_alarms_through_real_stream(spark, tmp_path):
    """A clean feed stays quiet; the day an upstream source starts
    delivering watermarked model output, its cohort pages — driven
    through an actual readStream -> foreachBatch -> availableNow
    query."""
    import json

    rng = random.Random(3)
    src = tmp_path / "src"
    src.mkdir()
    # batch 0: clean text from two sources
    (src / "f0.json").write_text(
        "\n".join(
            json.dumps(
                {"source": s, "doc_id": i, "text": _random_text(rng, 300)}
            )
            for i, s in enumerate(["siteA", "siteB"] * 4)
        )
    )
    # batch 1: siteB turns into a watermarked-LM mirror
    (src / "f1.json").write_text(
        "\n".join(
            json.dumps(
                {
                    "source": "siteB",
                    "doc_id": 100 + i,
                    "text": _watermarked_text(rng, 300),
                }
            )
            for i in range(6)
        )
    )

    mon = StreamingWatermarkMonitor(str(tmp_path / "state"))
    assert mon.report(spark) is None
    assert mon.alarms(spark) == []
    stream = (
        spark.readStream.schema("source string, doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(mon.write)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rep = {r.cohort: r for r in mon.report(spark).collect()}
    assert not rep["siteA"].wm_flag and abs(rep["siteA"].z) < 4
    assert rep["siteB"].wm_flag and rep["siteB"].z > 10
    assert rep["siteB"].n_docs_flagged >= 6  # every watermarked doc screens
    alarms = mon.alarms(spark)
    assert "siteB" in alarms and "siteA" not in alarms
