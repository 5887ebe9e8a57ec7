"""Streaming ingest-time near-dup dedup over embeddings
(streaming/embed_neardup.py): an embedding stream is LSH-deduped
against the persisted index of everything accepted so far —
within-batch, cross-batch, across a checkpoint restart, and under torn
state writes."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions.vectors import dot, norm_column, unit_from
from http_log_anonymizer_spark.streaming.embed_neardup import (
    EmbedNearDupSink,
    bucket_keys,
)

_DIM = 64


def _vec(rng: random.Random) -> list[float]:
    return [rng.gauss(0.0, 1.0) for _ in range(_DIM)]


def _rows(ids, rng: random.Random) -> list[dict]:
    return [{"vec_id": i, "embedding": _vec(rng)} for i in ids]


def _bdf(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _write(path, rows) -> None:
    path.write_text("\n".join(json.dumps(r) for r in rows))


def _drain(spark, src, sink, ckpt) -> None:
    rows = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        rows.writeStream.foreachBatch(sink.write)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _accepted(spark, base) -> set[int]:
    return {r.vec_id for r in spark.read.parquet(str(base / "docs")).collect()}


def test_streaming_embed_neardup_across_batches_and_restart(spark, tmp_path):
    rng = random.Random(21)
    src, base, ckpt = tmp_path / "src", tmp_path / "state", tmp_path / "ck"
    src.mkdir()
    sink = EmbedNearDupSink(str(base))

    originals = _rows(range(20), rng)
    _write(src / "b0.txt", originals)
    _drain(spark, src, sink, ckpt)
    assert _accepted(spark, base) == set(range(20))  # gaussians: all kept

    # batch 2: an exact copy of vec 3, a scaled copy of vec 5 (same
    # unit vector -> cosine 1), an intra-batch twin pair (200, 201),
    # and fresh vectors
    copy3 = {"vec_id": 100, "embedding": originals[3]["embedding"]}
    scaled5 = {"vec_id": 101, "embedding": [2.0 * x for x in originals[5]["embedding"]]}
    fresh = _rows((200, 300), rng)
    twin = {"vec_id": 201, "embedding": fresh[0]["embedding"]}
    _write(src / "b1.txt", [copy3, scaled5, fresh[0], twin, fresh[1]])
    _drain(spark, src, sink, ckpt)
    assert _accepted(spark, base) == set(range(20)) | {200, 300}

    # restart on the same checkpoint: history (incl. batch-2 accepts)
    # must persist
    replay = {"vec_id": 400, "embedding": fresh[0]["embedding"]}
    new = _rows([500], rng)
    _write(src / "b2.txt", [replay, *new])
    _drain(spark, src, sink, ckpt)
    assert _accepted(spark, base) == set(range(20)) | {200, 300, 500}

    # index/vector state rows exist exactly for accepted ids
    idx = {
        r.vec_id
        for r in spark.read.parquet(str(base / "index")).select("vec_id").distinct().collect()
    }
    assert idx == _accepted(spark, base)


def test_torn_batch_replay_repairs_state(spark, tmp_path):
    import shutil

    rng = random.Random(9)
    base = tmp_path / "state"
    sink = EmbedNearDupSink(str(base))
    b0 = _rows(range(8), rng)
    sink.write(_bdf(spark, b0), 0)

    near2 = {"vec_id": 12, "embedding": b0[2]["embedding"]}
    b1 = [*_rows((10, 11), rng), near2]
    sink.write(_bdf(spark, b1), 1)
    clean = sorted(_accepted(spark, base))
    assert 12 not in clean

    # tear: index rows for batch 1 survive, vec + doc rows do not (the
    # shape that would leave future dups unverifiable)
    shutil.rmtree(base / "vecs" / "_batch=b1")
    shutil.rmtree(base / "docs" / "_batch=b1")
    sink.write(_bdf(spark, b1), 1)  # checkpoint replay
    assert sorted(_accepted(spark, base)) == clean

    # repaired state still catches new dups of batch-1 vectors, and
    # replay contributed no duplicate doc rows (exactly-once)
    sink.write(_bdf(spark, [{"vec_id": 20, "embedding": b1[0]["embedding"]}]), 2)
    final = _accepted(spark, base)
    assert final == set(clean)
    assert spark.read.parquet(str(base / "docs")).count() == len(final)


def test_streaming_agrees_with_batch_greedy_policy(spark, tmp_path):
    """Streaming accept/drop must equal the batch greedy-by-id policy
    (drop any vector with a verified LSH pair to a lower id) when ids
    arrive ascending — the ingest-vs-backfill consistency contract."""
    rng = random.Random(33)
    rows = _rows(range(30), rng)
    # plant scaled dups (identical unit vectors) across the id range
    for src_i, dst_i in ((2, 17), (8, 23), (20, 29)):
        rows[dst_i] = {
            "vec_id": rows[dst_i]["vec_id"],
            "embedding": [1.5 * x for x in rows[src_i]["embedding"]],
        }

    src, base, ckpt = tmp_path / "src", tmp_path / "state", tmp_path / "ck"
    src.mkdir()
    sink = EmbedNearDupSink(str(base))
    for i, (lo, hi) in enumerate(((0, 10), (10, 20), (20, 30))):
        _write(src / f"b{i}.txt", rows[lo:hi])
        _drain(spark, src, sink, ckpt)
    streaming_kept = _accepted(spark, base)

    bdf = _bdf(spark, rows)
    u = bdf.select(
        "vec_id", unit_from("embedding", norm_column("embedding")).alias("ue")
    ).cache()
    keys = bucket_keys(bdf).cache()
    ka, kb = keys.alias("ka"), keys.alias("kb")
    cand = (
        ka.join(
            kb,
            (F.col("ka.t") == F.col("kb.t"))
            & (F.col("ka.bucket") == F.col("kb.bucket"))
            & (F.col("ka.vec_id") < F.col("kb.vec_id")),
        )
        .select(F.col("ka.vec_id").alias("a"), F.col("kb.vec_id").alias("b"))
        .distinct()
    )
    verified = (
        cand.join(u.select(F.col("vec_id").alias("a"), F.col("ue").alias("ua")), "a")
        .join(u.select(F.col("vec_id").alias("b"), F.col("ue").alias("ub")), "b")
        .filter(F.round(dot("ua", "ub"), 6) >= sink.threshold)
    )
    batch_dropped = {r.b for r in verified.select("b").distinct().collect()}
    assert streaming_kept == {r["vec_id"] for r in rows} - batch_dropped
    assert len(batch_dropped) >= 3  # the planted dups really drop
