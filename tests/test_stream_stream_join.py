"""Stream-stream join with watermarks: errors joined to purchases of
the same user within a +/-10 minute band — the streaming twin of the
batch range_join_error_context query, verified against the equivalent
batch join over the same data.

Watermarks bound the join state on both sides (Spark buffers each side
until watermark + band passes); without them a stream-stream join's
state grows forever (SURVEY §2.5: the reference has no lateness
handling at all — this is the engine-grade extension done right).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _event(i: int, etype: str, minute: int, user: int, value: float) -> str:
    return json.dumps(
        {
            "event_id": i,
            "ts": f"2024-01-01 00:{minute:02d}:{i % 60:02d}",
            "user_id": user,
            "event_type": etype,
            "value": value,
        }
    )


_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    lines = []
    i = 0
    for minute in range(0, 50, 5):
        for user in (1, 2, 3):
            lines.append(_event(i, "error", minute, user, 0.0)); i += 1
            # purchase 4 minutes later (inside band) and 20 later (outside)
            lines.append(_event(i, "purchase", minute + 4, user, 10.0)); i += 1
            if minute + 20 < 60:
                lines.append(_event(i, "purchase", minute + 20, user, 99.0)); i += 1
    (src / "events.txt").write_text("\n".join(lines))

    def parsed(stream_df):
        return stream_df.select(
            F.from_json(F.col("value"), _SCHEMA).alias("r")
        ).select("r.*")

    raw = spark.readStream.format("text").load(str(src))
    err = (
        parsed(raw)
        .filter(F.col("event_type") == "error")
        .withWatermark("ts", "30 minutes")
        .select("event_id", "user_id", F.col("ts").alias("ets"))
    )
    pur = (
        parsed(raw)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("pts"),
            F.col("value").alias("p_value"),
        )
    )
    joined = err.join(
        pur,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("pts") >= F.col("ets") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("pts") <= F.col("ets") + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id, p_value, pts FROM ssj").collect()

    # batch equivalent over the same file
    batch = spark.read.json(str(src / "events.txt")).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type", "value"
    )
    be = batch.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("ets")
    )
    bp = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts"), F.col("value").alias("p_value")
    )
    want = be.join(
        bp,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("pts") >= F.col("ets") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("pts") <= F.col("ets") + F.expr("INTERVAL 10 MINUTES")),
    ).select("event_id", "p_value", "pts").collect()

    key = lambda r: (r.event_id, r.p_value, r.pts)
    assert sorted(map(key, got)) == sorted(map(key, want))
    # every error has its same-cycle purchase (+4 min) in band
    assert len(got) >= 30


def test_stream_stream_left_outer_join_pads_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: errors with no purchase in the
    band get NULL padding — but only once the watermark proves no match
    can still arrive. Verified against the batch left join."""
    src = tmp_path / "src2"
    src.mkdir()
    lines = []
    i = 1000
    # users 1,2: error + in-band purchase; user 3: error with NO purchase
    for minute in (0, 10, 20):
        for user in (1, 2):
            lines.append(_event(i, "error", minute, user, 0.0)); i += 1
            lines.append(_event(i, "purchase", minute + 2, user, 5.0)); i += 1
        lines.append(_event(i, "error", minute, 3, 0.0)); i += 1
    # far-future events on BOTH sides to advance the global watermark —
    # each side's withWatermark sits after its event_type filter, so an
    # event of another type would never reach either watermark node and
    # the global watermark (min of both) would stay behind
    lines.append(_event(i, "error", 59, 8, 0.0)); i += 1
    lines.append(_event(i, "purchase", 59, 9, 0.0))

    (src / "events.txt").write_text("\n".join(lines))

    def parsed(df):
        return df.select(F.from_json(F.col("value"), _SCHEMA).alias("r")).select("r.*")

    raw = spark.readStream.format("text").load(str(src))
    err = (
        parsed(raw)
        .filter(F.col("event_type") == "error")
        .withWatermark("ts", "5 minutes")
        .select("event_id", "user_id", F.col("ts").alias("ets"))
    )
    pur = (
        parsed(raw)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "5 minutes")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("pts"))
    )
    joined = err.join(
        pur,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("pts") >= F.col("ets"))
        & (F.col("pts") <= F.col("ets") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id, pts FROM ssj_outer").collect()

    matched = [r for r in got if r.pts is not None]
    padded = [r for r in got if r.pts is None]
    assert len(matched) == 6  # users 1,2 x 3 cycles
    # user 3's errors emitted with NULL padding once the watermark
    # passed their band; the minute-59 error stays buffered (no pad)
    assert len(padded) == 3
