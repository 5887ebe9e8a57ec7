"""Streaming repetition monitor: fed the corpus in micro-batches the
readout must EQUAL the batch gopher_repetition_report row for row; the
fold must be replay-safe and batch-boundary invariant; a source that
degrades into repeated boilerplate must page through a real
availableNow stream."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.streaming.repetition import (
    StreamingRepetitionMonitor,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("source", "doc_id", "text")


def test_stream_fold_equals_batch_report(spark, tmp_path):
    d = _docs(spark).persist()
    mon = StreamingRepetitionMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(d.filter(F.col("doc_id") % 4 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.report(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["gopher_repetition_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want


def test_replay_and_boundaries_do_not_change_counters(spark, tmp_path):
    d = _docs(spark).persist()
    one = StreamingRepetitionMonitor(str(tmp_path / "one"))
    one.write(d, 0)
    many = StreamingRepetitionMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(d.filter(F.col("doc_id") % 3 == b), b)
    many.write(d.filter(F.col("doc_id") % 3 == 2), 2)  # same-batch-id replay
    many.write(d.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.report(spark).collect()] == [
        tuple(r) for r in many.report(spark).collect()
    ]
    d.unpersist()


def test_boilerplate_regression_alarms_through_real_stream(spark, tmp_path):
    """A healthy feed stays quiet; the day an upstream extractor starts
    flattening siteB's pages into repeated boilerplate, its keep rate
    collapses and the cohort pages — driven through an actual
    readStream -> foreachBatch -> availableNow query."""
    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(400)]
    clean = lambda: " ".join(rng.choice(vocab) for _ in range(80))
    boiler = " ".join(["click here to subscribe now"] * 16)

    src = tmp_path / "src"
    src.mkdir()
    (src / "f0.json").write_text(
        "\n".join(
            json.dumps({"source": s, "doc_id": i, "text": clean()})
            for i, s in enumerate(["siteA", "siteB"] * 4)
        )
    )
    (src / "f1.json").write_text(
        "\n".join(
            json.dumps({"source": "siteB", "doc_id": 100 + i, "text": boiler})
            for i in range(12)
        )
    )

    mon = StreamingRepetitionMonitor(str(tmp_path / "state"))
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

    rep = {r.source: r for r in mon.report(spark).collect()}
    assert rep["siteA"].n_keep == rep["siteA"].n_docs  # random text passes
    assert rep["siteB"].n_docs == 16 and rep["siteB"].n_keep <= 4
    alarms = mon.alarms(spark)
    assert "siteB" in alarms and "siteA" not in alarms
