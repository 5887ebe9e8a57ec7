"""Stage-3 streaming tests: windowed totals with watermark, streaming
dedup, and the applyInPandasWithState running-totals operator — each
checked against its batch equivalent over the same data."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from http_log_anonymizer_spark.streaming.aggregates import streaming_dedup, streaming_totals
from http_log_anonymizer_spark.streaming.pipeline import json_decoder
from http_log_anonymizer_spark.streaming.stateful import running_ip_totals


def _log_line(i: int, minute: int, addr: str = "1.2.3.4") -> str:
    return json.dumps(
        {
            "timestamp": f"2024-01-01 00:{minute:02d}:{i % 60:02d}",
            "resource_id": i % 3,
            "bytes_sent": 100 + i,
            "request_time_milli": i,
            "response_status": 200 if i % 2 == 0 else 500,
            "cache_status": "HIT",
            "method": "GET",
            "remote_addr": addr,
            "url": f"/r/{i % 3}",
        }
    )


def _drain(spark, src_dir, ckpt, make_sink_df, max_files=None):
    source = spark.readStream.format("text")
    if max_files:
        source = source.option("maxFilesPerTrigger", str(max_files))
    raw = source.load(src_dir)
    out = make_sink_df(json_decoder()(raw))
    q = (
        out.writeStream.format("memory")
        .queryName("agg_test")
        .outputMode("complete" if getattr(out, "_agg_complete", False) else "update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_totals_match_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    lines = [_log_line(i, minute=i // 30) for i in range(90)]
    (src / "data.txt").write_text("\n".join(lines))

    def totals(rows):
        df = streaming_totals(rows, window="1 minute", dimensions=["response_status"])
        df._agg_complete = True
        return df

    _drain(spark, str(src), str(tmp_path / "ck1"), totals)
    got = {
        (str(r.window_start), r.response_status): (r.cnt, r.traffic)
        for r in spark.sql("SELECT * FROM agg_test").collect()
    }

    # batch equivalent over the same rows
    batch = (
        spark.read.json(str(src / "data.txt"))
        .select(
            F.col("timestamp").cast("timestamp").alias("timestamp"),
            "response_status",
            "bytes_sent",
        )
        .groupBy(F.window("timestamp", "1 minute").alias("w"), "response_status")
        .agg(F.count("*").alias("cnt"), F.sum("bytes_sent").alias("traffic"))
        .select(F.col("w.start").alias("window_start"), "response_status", "cnt", "traffic")
    )
    want = {
        (str(r.window_start), r.response_status): (r.cnt, r.traffic)
        for r in batch.collect()
    }
    assert got == want and len(got) >= 4


def test_streaming_dedup_drops_replays(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    lines = [_log_line(1, 0)] * 3 + [_log_line(2, 0)]
    (src / "data.txt").write_text("\n".join(lines))

    def dedup(rows):
        df = streaming_dedup(
            rows, keys=["resource_id", "response_status", "remote_addr", "timestamp"]
        ).select("timestamp", "resource_id", "bytes_sent")
        return df

    _drain(spark, str(src), str(tmp_path / "ck2"), dedup)
    assert spark.sql("SELECT count(*) c FROM agg_test").collect()[0].c == 2


def test_running_ip_totals_state_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two files -> two micro-batches (maxFilesPerTrigger=1); state carries
    (src / "a.txt").write_text("\n".join(_log_line(i, 0, "9.9.9.9") for i in range(5)))
    (src / "b.txt").write_text("\n".join(_log_line(i, 1, "9.9.9.9") for i in range(5, 8)))

    _drain(spark, str(src), str(tmp_path / "ck3"), running_ip_totals, max_files=1)
    rows = spark.sql(
        "SELECT * FROM agg_test ORDER BY total_requests DESC LIMIT 1"
    ).collect()
    assert rows[0].remote_addr == "9.9.9.9"
    assert rows[0].total_requests == 8  # 5 from batch 1 + 3 from batch 2
    assert rows[0].total_bytes == sum(100 + i for i in range(8))


def test_transform_with_state_matches_apply_in_pandas(spark, tmp_path):
    """Both stateful APIs (applyInPandasWithState and the Spark 4
    transformWithStateInPandas) produce identical running totals."""
    from http_log_anonymizer_spark.streaming.stateful import running_ip_totals_tws

    if running_ip_totals_tws is None:
        import pytest

        pytest.skip("transformWithStateInPandas unavailable")

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("\n".join(_log_line(i, 0, "7.7.7.7") for i in range(4)))
    (src / "b.txt").write_text("\n".join(_log_line(i, 1, "7.7.7.7") for i in range(4, 6)))

    _drain(spark, str(src), str(tmp_path / "ck_tws"), running_ip_totals_tws, max_files=1)
    rows = spark.sql(
        "SELECT * FROM agg_test ORDER BY total_requests DESC LIMIT 1"
    ).collect()
    assert rows[0].remote_addr == "7.7.7.7"
    assert rows[0].total_requests == 6
    assert rows[0].total_bytes == sum(100 + i for i in range(6))


def test_chained_windowed_aggregations(spark, tmp_path):
    """Multiple stateful operators in ONE streaming query (Spark 3.4+):
    minutely counts feed a 10-minute rollup (window-of-window). The
    hypertable hierarchy maintained incrementally, verified against the
    batch equivalent."""
    src = tmp_path / "src"
    src.mkdir()
    lines = [_log_line(i, minute=(i * 7) % 25) for i in range(200)]
    # watermark-advancing tail so the last windows finalize in append mode
    lines += [_log_line(900 + j, minute=55) for j in range(2)]
    (src / "data.txt").write_text("\n".join(lines))

    raw = spark.readStream.format("text").load(str(src))
    rows = json_decoder()(raw)
    minutely = (
        rows.withWatermark("timestamp", "2 minutes")
        .groupBy(F.window("timestamp", "1 minute").alias("w1"))
        .agg(F.count("*").alias("cnt"), F.sum("bytes_sent").alias("traffic"))
    )
    ten_minutely = (
        minutely.groupBy(F.window(F.col("w1"), "10 minutes").alias("w2"))
        .agg(F.sum("cnt").alias("cnt"), F.sum("traffic").alias("traffic"))
        .select(F.col("w2.start").alias("ws"), "cnt", "traffic")
    )
    q = (
        ten_minutely.writeStream.format("memory")
        .queryName("chained")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_chain"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r.ws): (r.cnt, r.traffic)
        for r in spark.sql("SELECT * FROM chained").collect()
    }

    batch = (
        spark.read.json(str(src / "data.txt"))
        .select(F.col("timestamp").cast("timestamp").alias("ts"), "bytes_sent")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), F.sum("bytes_sent").alias("traffic"))
        .select(F.col("w.start").alias("ws"), "cnt", "traffic")
    )
    want = {str(r.ws): (r.cnt, r.traffic) for r in batch.collect()}

    # every finalized window matches the batch rollup exactly; the
    # still-open tail window (minute 55) is allowed to be absent
    assert len(got) >= 3
    for ws, vals in got.items():
        assert want[ws] == vals, (ws, vals, want.get(ws))


def test_stream_static_join_enriches_like_batch(spark, tmp_path):
    """Streaming rows joined against a static dimension table must carry
    the same enrichment a batch join produces; rows with no dim match
    keep NULL (left join semantics)."""
    from http_log_anonymizer_spark.streaming.aggregates import enrich_with_static

    src = tmp_path / "src"
    src.mkdir()
    # status 500 deliberately absent from the dim table -> NULL class
    (src / "data.txt").write_text("\n".join(_log_line(i, minute=0) for i in range(60)))
    dim = spark.createDataFrame(
        [(200, "success"), (404, "client_error")],
        "response_status int, status_class string",
    )

    raw = spark.readStream.format("text").load(str(src))
    out = enrich_with_static(
        json_decoder()(raw).select("resource_id", "response_status", "bytes_sent"),
        dim,
        ["response_status"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM enriched").collect()
    assert len(got) == 60
    for r in got:
        if r.response_status == 200:
            assert r.status_class == "success"
        else:
            assert r.response_status == 500 and r.status_class is None


def test_streaming_dedup_within_watermark_drops_restamped_replays(spark, tmp_path):
    """Replays of the same business key arrive with DIFFERENT
    timestamps (re-stamped on retry): sort-key dedup would keep every
    copy; dropDuplicatesWithinWatermark keeps one per key within the
    watermark horizon."""
    import json as _json

    from http_log_anonymizer_spark.streaming.aggregates import (
        streaming_dedup_within_watermark,
    )

    src = tmp_path / "src"
    src.mkdir()
    lines = []
    for second in (0, 5, 10):  # same logical event re-stamped 3x
        rec = _json.loads(_log_line(1, 0))
        rec["timestamp"] = f"2024-01-01 00:00:{second:02d}"
        lines.append(_json.dumps(rec))
    other = _json.loads(_log_line(2, 0))
    lines.append(_json.dumps(other))
    (src / "data.txt").write_text("\n".join(lines))

    def dedup(rows):
        return streaming_dedup_within_watermark(
            rows, keys=["resource_id", "response_status", "remote_addr"]
        ).select("resource_id", "bytes_sent")

    _drain(spark, str(src), str(tmp_path / "ck_wwm"), dedup)
    got = spark.sql("SELECT count(*) c FROM agg_test").collect()[0].c
    assert got == 2  # one per business key, not one per (key, timestamp)


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """Streaming session_window aggregation equals the same grouping
    computed in batch over the full input: two bursts separated by more
    than the gap become two sessions per address."""
    from http_log_anonymizer_spark.streaming.aggregates import (
        streaming_session_totals,
    )

    src = tmp_path / "src"
    src.mkdir()
    # burst at minute 0-1 and a second burst at minute 20 (gap 5m)
    lines = [_log_line(i, minute=i % 2) for i in range(10)]
    lines += [_log_line(i, minute=20) for i in range(4)]
    (src / "data.txt").write_text("\n".join(lines))

    def sess(rows):
        df = streaming_session_totals(rows, gap="5 minutes")
        df._agg_complete = True
        return df

    _drain(spark, str(src), str(tmp_path / "ck_sess"), sess)
    got = {
        (str(r.session_start), r.remote_addr): (r.n_requests, r.bytes)
        for r in spark.sql("SELECT * FROM agg_test").collect()
    }

    batch = (
        json_decoder()(spark.read.text(str(src)))
        .groupBy(F.session_window("timestamp", "5 minutes").alias("w"), "remote_addr")
        .agg(F.count("*").alias("n"), F.sum("bytes_sent").alias("b"))
    )
    want = {
        (str(r["w"]["start"]), r.remote_addr): (r.n, r.b) for r in batch.collect()
    }
    assert got == want
    assert len(got) == 2  # two sessions for the single address
