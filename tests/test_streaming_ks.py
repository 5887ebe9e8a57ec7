"""Streaming KS monitor: fed the batch query's own ref/cur split in
micro-batches, the readout must EQUAL ks_drift_report row for row;
counts must be replay-safe and batch-boundary invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.analytics import _PSI_SPLIT_DAY
from http_log_anonymizer_spark.streaming.ks import StreamingKSSink

SF = "/root/testdata/sf0.001"


def _events(spark):
    from http_log_anonymizer_spark.sources.batch import load_table

    return load_table(spark, SF, "events").select(
        "event_type", "value", F.dayofmonth("ts").alias("day")
    )


def test_stream_fold_equals_batch_ks_report(spark, tmp_path):
    ev = _events(spark).persist()
    ref = ev.filter(F.col("day") < _PSI_SPLIT_DAY)
    cur = ev.filter(F.col("day") >= _PSI_SPLIT_DAY)

    sink = StreamingKSSink(str(tmp_path / "state"), ref)
    for b in range(5):
        sink.write(cur.filter(F.col("day") % 5 == b), b)
    ev.unpersist()

    got = [tuple(r) for r in sink.ks(spark).collect()]
    want = [
        tuple(r) for r in REGISTRY["ks_drift_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 1


def test_batch_boundaries_and_replay_do_not_change_counts(spark, tmp_path):
    ev = _events(spark).persist()
    ref = ev.filter(F.col("day") < _PSI_SPLIT_DAY)
    cur = ev.filter(F.col("day") >= _PSI_SPLIT_DAY).persist()

    one = StreamingKSSink(str(tmp_path / "one"), ref)
    one.write(cur, 0)

    many = StreamingKSSink(str(tmp_path / "many"), ref)
    for b in range(3):
        many.write(cur.filter(F.col("day") % 3 == b), b)
    many.write(cur.filter(F.col("day") % 3 == 2), 2)  # replayed tail batch
    many.write(cur.filter(F.lit(False)), 3)  # empty slice: no-op

    assert [tuple(r) for r in one.ks(spark).collect()] == [
        tuple(r) for r in many.ks(spark).collect()
    ]
    cur.unpersist()
    ev.unpersist()


def test_planted_disjoint_supports_alarm(spark, tmp_path):
    ref = spark.createDataFrame(
        [("a", 0.10)] * 40 + [("a", 0.20)] * 40,
        "event_type string, value double",
    )
    sink = StreamingKSSink(str(tmp_path / "state"), ref)
    cur = spark.createDataFrame(
        [("a", 1.10)] * 40 + [("a", 1.20)] * 40,
        "event_type string, value double",
    )
    sink.write(cur, 0)
    rows = {r.cohort: r for r in sink.ks(spark).collect()}
    # disjoint supports: KS = 1, W1 = the 100-cent translation, and at
    # n=80 vs 80 Smirnov's critical value (~0.215) is decisively beaten
    assert rows["a"].ks == 1.0 and rows["a"].w1_cents == 100.0
    assert rows["a"].reject_h0
    assert [r.cohort for r in sink.alarms(spark).collect()] == ["ALL", "a"]


def test_real_stream_availablenow_matches_batch(spark, tmp_path):
    """Drive the KS monitor through an actual readStream ->
    foreachBatch -> availableNow query: the readout must still equal
    the batch ks_drift_report."""
    import json

    ev = _events(spark).persist()
    ref = ev.filter(F.col("day") < _PSI_SPLIT_DAY)
    cur = ev.filter(F.col("day") >= _PSI_SPLIT_DAY)

    src = tmp_path / "src"
    src.mkdir()
    rows = cur.select("event_type", "value").collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        (src / f"f{i}.json").write_text(
            "\n".join(
                json.dumps({"event_type": r.event_type, "value": r.value})
                for r in chunk
            )
        )

    sink = StreamingKSSink(str(tmp_path / "state"), ref)
    stream = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink.write)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    ev.unpersist()

    got = [tuple(r) for r in sink.ks(spark).collect()]
    want = [
        tuple(r) for r in REGISTRY["ks_drift_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want


def test_degenerate_cohorts_alarm_instead_of_nan(spark, tmp_path):
    """A cohort with zero rows on either side (before the first batch,
    a vanished cohort, or a brand-new one) has an undefined two-sample
    statistic; it must surface as ks NULL + reject_h0 = true — an
    alarm — not a NaN that alarms() silently skips (ADVICE r07)."""
    ref = spark.createDataFrame(
        [("a", 0.10), ("a", 0.20)], "event_type string, value double"
    )
    sink = StreamingKSSink(str(tmp_path / "state"), ref)
    # before any batch: every reference cohort is current-empty
    pre = {r.cohort: r for r in sink.ks(spark).collect()}
    assert set(pre) == {"a", "ALL"}
    assert pre["a"].n_cur == 0 and pre["a"].ks is None and pre["a"].reject_h0
    assert {r.cohort for r in sink.alarms(spark).collect()} == {"a", "ALL"}
    # a cohort the reference never saw appears in the stream: same deal
    sink.write(
        spark.createDataFrame([("b", 0.15)], "event_type string, value double"), 0
    )
    rows = {r.cohort: r for r in sink.ks(spark).collect()}
    assert rows["b"].n_ref == 0 and rows["b"].ks is None and rows["b"].reject_h0
    # cohort 'a' is still one-sided (all its current rows are missing)
    assert rows["a"].n_cur == 0 and rows["a"].reject_h0
    # ALL is now two-sided and well-defined
    assert rows["ALL"].ks is not None
