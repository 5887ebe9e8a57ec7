"""Streaming PSI monitor: fed the batch query's own ref/cur split and
corpus-derived bucket edges in micro-batches, the readout must EQUAL
psi_drift_report row for row; counts must be replay-safe and
batch-boundary invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.analytics import _PSI_SPLIT_DAY
from http_log_anonymizer_spark.streaming.psi import StreamingPSISink

SF = "/root/testdata/sf0.001"


def _events(spark):
    from http_log_anonymizer_spark.sources.batch import load_table

    return load_table(spark, SF, "events").select(
        "event_type", "value", F.dayofmonth("ts").alias("day")
    )


def _edges(ev):
    # the batch query's corpus-wide integer min/max (both windows)
    r = ev.select(F.round(F.col("value") * 100).cast("long").alias("c")).agg(
        F.min("c"), F.max("c")
    ).collect()[0]
    return int(r[0]), int(r[1])


def test_stream_fold_equals_batch_psi_report(spark, tmp_path):
    ev = _events(spark).persist()
    lo, hi = _edges(ev)
    ref = ev.filter(F.col("day") < _PSI_SPLIT_DAY)
    cur = ev.filter(F.col("day") >= _PSI_SPLIT_DAY)

    sink = StreamingPSISink(str(tmp_path / "state"), ref, lo, hi)
    # stream the current window in 5 arbitrary micro-batches
    for b in range(5):
        sink.write(cur.filter(F.col("day") % 5 == b), b)
    ev.unpersist()

    got = [tuple(r) for r in sink.psi(spark).collect()]
    want = [
        tuple(r) for r in REGISTRY["psi_drift_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 1  # per-cohort rows plus pooled ALL


def test_batch_boundaries_and_replay_do_not_change_counts(spark, tmp_path):
    ev = _events(spark).persist()
    lo, hi = _edges(ev)
    ref = ev.filter(F.col("day") < _PSI_SPLIT_DAY)
    cur = ev.filter(F.col("day") >= _PSI_SPLIT_DAY).persist()

    one = StreamingPSISink(str(tmp_path / "one"), ref, lo, hi)
    one.write(cur, 0)  # everything in a single batch

    many = StreamingPSISink(str(tmp_path / "many"), ref, lo, hi)
    for b in range(3):
        many.write(cur.filter(F.col("day") % 3 == b), b)
    # replay the LAST batch (foreachBatch redelivers the uncommitted
    # tail): the epoch protocol must not double-count it
    many.write(cur.filter(F.col("day") % 3 == 2), 2)
    # an empty slice is a no-op for a count histogram
    many.write(cur.filter(F.lit(False)), 3)

    assert [tuple(r) for r in one.psi(spark).collect()] == [
        tuple(r) for r in many.psi(spark).collect()
    ]
    cur.unpersist()
    ev.unpersist()


def test_unseen_cohort_and_empty_state_behave(spark, tmp_path):
    ref = spark.createDataFrame(
        [("a", 0.1), ("a", 0.2)], "event_type string, value double"
    )
    sink = StreamingPSISink(str(tmp_path / "state"), ref, lo=10, hi=20, buckets=4)
    # before any batch: current side is all-zero, psi is finite
    pre = {r.cohort: r.psi for r in sink.psi(spark).collect()}
    assert set(pre) == {"a", "ALL"}
    # a cohort the reference never saw appears in the stream
    sink.write(
        spark.createDataFrame([("b", 0.15)], "event_type string, value double"), 0
    )
    rows = {r.cohort: r for r in sink.psi(spark).collect()}
    assert set(rows) == {"a", "b", "ALL"}
    assert rows["b"].n_ref == 0 and rows["b"].n_cur == 1


def test_out_of_range_values_land_in_edge_buckets(spark, tmp_path):
    """Deploy-time edges are FIXED; values outside [lo, hi] must clamp
    into the edge buckets (standard PSI practice) rather than take an
    out-of-grid bucket index that psi()'s grid join silently drops —
    out-of-range drift is the strongest signal a fixed-calibration
    monitor can see (ADVICE r07)."""
    ref = spark.createDataFrame(
        [("a", 0.10 + (i % 11) * 0.01) for i in range(60)],
        "event_type string, value double",
    )
    sink = StreamingPSISink(str(tmp_path / "state"), ref, lo=10, hi=20, buckets=4)
    # every current value is far outside the calibration range
    sink.write(
        spark.createDataFrame(
            [("a", 9.0 if i % 2 else -3.0) for i in range(60)],
            "event_type string, value double",
        ),
        0,
    )
    rows = {r.cohort: r for r in sink.psi(spark).collect()}
    # nothing dropped: all 60 out-of-range rows are counted
    assert rows["a"].n_cur == 60
    # and the mass sits in the edge buckets: heavy drift must alarm
    assert rows["a"].psi > 0.25 and rows["a"].drift_flag
    assert [r.cohort for r in sink.alarms(spark).collect()] == ["ALL", "a"]


def test_real_stream_availablenow_matches_batch(spark, tmp_path):
    """Drive the PSI monitor through an actual readStream ->
    foreachBatch -> availableNow query (not direct write() calls): the
    readout must still equal the batch psi_drift_report."""
    import json

    ev = _events(spark).persist()
    lo, hi = _edges(ev)
    ref = ev.filter(F.col("day") < _PSI_SPLIT_DAY)
    cur = ev.filter(F.col("day") >= _PSI_SPLIT_DAY)

    src = tmp_path / "src"
    src.mkdir()
    rows = cur.select("event_type", "value").collect()
    third = (len(rows) + 2) // 3
    for i in range(3):  # 3 source files -> 3 micro-batches
        chunk = rows[i * third : (i + 1) * third]
        (src / f"f{i}.json").write_text(
            "\n".join(
                json.dumps({"event_type": r.event_type, "value": r.value})
                for r in chunk
            )
        )

    sink = StreamingPSISink(str(tmp_path / "state"), ref, lo, hi)
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

    got = [tuple(r) for r in sink.psi(spark).collect()]
    want = [
        tuple(r) for r in REGISTRY["psi_drift_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want
