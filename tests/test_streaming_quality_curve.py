"""Streaming quality-curve monitor: fed the corpus in micro-batches the
readout must EQUAL the batch quality_filter_tradeoff row for row; the
fold must be replay-safe and batch-boundary invariant; a feed whose
quality collapses must page through a real availableNow stream."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.streaming.quality_curve import (
    StreamingQualityCurveMonitor,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def test_stream_fold_equals_batch_curve(spark, tmp_path):
    d = _docs(spark).persist()
    mon = StreamingQualityCurveMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(d.filter(F.col("doc_id") % 4 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.report(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["quality_filter_tradeoff"].spark_fn(spark, SF).collect()
    ]
    assert got == want


def test_replay_and_boundaries_do_not_change_the_curve(spark, tmp_path):
    d = _docs(spark).persist()
    one = StreamingQualityCurveMonitor(str(tmp_path / "one"))
    one.write(d, 0)
    many = StreamingQualityCurveMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(d.filter(F.col("doc_id") % 3 == b), b)
    many.write(d.filter(F.col("doc_id") % 3 == 2), 2)  # same-batch-id replay
    many.write(d.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.report(spark).collect()] == [
        tuple(r) for r in many.report(spark).collect()
    ]
    d.unpersist()


def test_quality_collapse_alarms_through_real_stream(spark, tmp_path):
    """A healthy feed stays quiet; when the feed flips to repetitive
    low-quality text, the deployed 0.5 cutoff's keep rate collapses and
    the monitor pages — through an actual readStream -> foreachBatch ->
    availableNow query."""
    rng = random.Random(11)
    vocab = ["join", "hash", "row", "batch", "scan"] + [
        f"w{i:03d}" for i in range(300)
    ]
    good = lambda: " ".join(rng.choice(vocab) for _ in range(120))
    junk = " ".join(["spam"] * 40)

    src = tmp_path / "src"
    src.mkdir()
    (src / "f0.json").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": good()}) for i in range(8))
    )
    (src / "f1.json").write_text(
        "\n".join(
            json.dumps({"doc_id": 100 + i, "text": junk}) for i in range(40)
        )
    )

    mon = StreamingQualityCurveMonitor(str(tmp_path / "state"))
    assert mon.report(spark) is None
    assert mon.alarms(spark) == []
    stream = (
        spark.readStream.schema("doc_id long, text string")
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

    rep = {r.threshold: r for r in mon.report(spark).collect()}
    assert rep[0.5].n_docs_kept <= 8  # junk all falls below the cutoff
    assert rep[0.5].pct_docs_kept < 0.25
    assert mon.alarms(spark) == ["keep_rate_collapsed"]
