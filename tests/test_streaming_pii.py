"""Streaming PII monitor: fed the corpus in micro-batches the readout
must EQUAL the batch pii_source_summary row for row; the fold must be
replay-safe and batch-boundary invariant; a clean feed that starts
leaking must page through a real availableNow stream."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.text import _pii_view
from http_log_anonymizer_spark.streaming.pii import StreamingPIIMonitor

SF = "/root/testdata/sf0.001"


def test_stream_fold_equals_batch_summary(spark, tmp_path):
    d = _pii_view(spark, SF).persist()
    mon = StreamingPIIMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(d.filter(F.col("doc_id") % 4 == b), b)
    d.unpersist()
    got = [tuple(r) for r in mon.report(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["pii_source_summary"].spark_fn(spark, SF).collect()
    ]
    assert got == want


def test_replay_and_boundaries_do_not_change_the_summary(spark, tmp_path):
    d = _pii_view(spark, SF).persist()
    one = StreamingPIIMonitor(str(tmp_path / "one"))
    one.write(d, 0)
    many = StreamingPIIMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(d.filter(F.col("doc_id") % 3 == b), b)
    many.write(d.filter(F.col("doc_id") % 3 == 2), 2)  # same-batch-id replay
    many.write(d.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.report(spark).collect()] == [
        tuple(r) for r in many.report(spark).collect()
    ]
    d.unpersist()


def test_leak_in_a_clean_feed_alarms_through_real_stream(spark, tmp_path):
    """A post-scrub feed must be PII-free; the default 0% budget pages
    on the FIRST leaked marker — through an actual readStream ->
    foreachBatch -> availableNow query."""
    src = tmp_path / "src"
    src.mkdir()
    clean = "scan join row batch filter merge"
    (src / "f0.json").write_text(
        "\n".join(
            json.dumps({"source": "scrubbed", "t": clean}) for _ in range(6)
        )
    )
    (src / "f1.json").write_text(
        json.dumps(
            {"source": "scrubbed", "t": clean + " ping admin@leak.example.org"}
        )
    )

    mon = StreamingPIIMonitor(str(tmp_path / "state"))
    assert mon.report(spark) is None
    assert mon.alarms(spark) == []
    stream = (
        spark.readStream.schema("source string, t string")
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
    assert mon.alarms(spark) == ["pii_exposure:scrubbed"]
    row = mon.report(spark).collect()[0]
    assert (row.n_docs, row.docs_with_pii, row.total_emails) == (7, 1, 1)
    # A raw-intake budget above the observed share stays quiet: 1 of 7
    # docs ~ 14%.
    assert StreamingPIIMonitor(str(tmp_path / "state"), alarm_pct=50).alarms(
        spark
    ) == []


def test_text_col_parameter_scans_the_named_column(spark, tmp_path):
    """ADVICE r08: the docstring promised a ``text_col`` parameter the
    constructor didn't take, forcing callers to withColumnRenamed. Pin
    the parameter: a monitor built with text_col='text' must produce
    the same readout as the default-column monitor fed renamed rows."""
    d = _pii_view(spark, SF).persist()
    renamed = StreamingPIIMonitor(str(tmp_path / "renamed"))
    renamed.write(d, 0)
    direct = StreamingPIIMonitor(str(tmp_path / "direct"), text_col="text")
    direct.write(d.withColumnRenamed("t", "text"), 0)
    assert [tuple(r) for r in direct.report(spark).collect()] == [
        tuple(r) for r in renamed.report(spark).collect()
    ]
    d.unpersist()
