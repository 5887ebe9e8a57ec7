"""Streaming delivery-semantics tests: watermark late-data drop in
append mode, and batch replay after a sink failure (the reference's
'commit follows durable write' contract, sink.rs:337-349, under an
actual failure)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from http_log_anonymizer_spark.streaming.pipeline import json_decoder

_LOG = lambda minute, sec, rid: json.dumps(
    {
        "timestamp": f"2024-01-01 01:{minute:02d}:{sec:02d}",
        "resource_id": rid,
        "bytes_sent": 100,
        "request_time_milli": 1,
        "response_status": 200,
        "cache_status": "HIT",
        "method": "GET",
        "remote_addr": "1.2.3.4",
        "url": "/r/1",
    }
)


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """Append-mode windowed aggregation only emits finalized windows,
    and an event arriving after the watermark passed its window is
    DROPPED — bounded state requires discarding stragglers (a semantic
    extension over the reference, which has no lateness handling;
    SURVEY §7 hard part 5)."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: two events in minute 0
    (src / "a_first.txt").write_text("\n".join([_LOG(0, 10, 1), _LOG(0, 20, 1)]))
    time.sleep(1.05)  # file-source ordering is by modification time
    # batch 2: minute 30 -> watermark (computed at batch end) = 01:25
    (src / "b_second.txt").write_text(_LOG(30, 0, 2))
    time.sleep(1.05)
    # batch 3 runs WITH watermark 01:25: window 01:00 is finalized,
    # emitted, and purged at the end of this batch
    (src / "c_third.txt").write_text(_LOG(31, 0, 2))
    time.sleep(1.05)
    # batch 4: a straggler for minute 0 — its window state is purged,
    # so it MUST be dropped (Spark guarantees drops only after state
    # eviction; earlier-arriving stragglers may still merge)
    (src / "d_fourth.txt").write_text("\n".join([_LOG(0, 30, 1), _LOG(32, 0, 2)]))

    raw = spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(str(src))
    agg = (
        json_decoder()(raw)
        .withWatermark("timestamp", "5 minutes")
        .groupBy(F.window("timestamp", "1 minute").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ws"), "cnt")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = [
        (str(r.ws), r.cnt) for r in spark.sql("SELECT * FROM late_test").collect()
    ]
    # window 01:00 emitted exactly once, with only the on-time events;
    # the purged-window straggler neither re-emitted nor re-counted it
    assert emitted.count(("2024-01-01 01:00:00", 2)) == 1, emitted
    assert all(c == 2 or ws != "2024-01-01 01:00:00" for ws, c in emitted)


class FlakySink:
    """Writer that fails on its first invocation, then works — the
    'insert failed' path of the reference (which shuts down and relies
    on restart+replay, lib.rs:213-218 / source.rs:154-157)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.calls = 0

    def write(self, batch_df, batch_id: int) -> None:
        self.calls += 1
        if self.calls == 1:
            raise RuntimeError("simulated sink outage")
        batch_df.write.mode("append").parquet(self.path)


def test_failed_batch_replays_without_loss(spark, tmp_path):
    """Sink failure -> query dies BEFORE the checkpoint commits ->
    restart replays the same batch -> data lands exactly once (no loss,
    no duplicates: the failed attempt never wrote)."""
    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    src = tmp_path / "src"
    src.mkdir()
    (src / "data.txt").write_text("\n".join(_LOG(0, i, i % 5) for i in range(20)))
    out = str(tmp_path / "out")
    sink = FlakySink(out)

    def run():
        raw = spark.readStream.format("text").load(str(src))
        q = (
            json_decoder()(raw)
            .writeStream.foreachBatch(lambda df, bid: sink.write(df, bid))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises(StreamingQueryException, match="simulated sink outage"):
        run()
    run()  # restart: same checkpoint, batch replays, sink now healthy

    got = spark.read.parquet(out)
    assert got.count() == 20  # exactly once: no loss, no duplicates
    assert sink.calls == 2
