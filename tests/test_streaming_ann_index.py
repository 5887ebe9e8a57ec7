"""Streaming IVF index maintenance (streaming/ann_index.py): the
stream-built inverted file must equal a batch build over everything
arrived, probe() must return BIT-IDENTICAL results to searching a
batch-built index with the same kernels, and the state must survive
replays, torn writes and compaction."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from http_log_anonymizer_spark.streaming.ann_index import (
    StreamingIVFIndexSink,
    assign_rows,
)

_DIM = 64


def _vec(rng):
    return [rng.gauss(0.0, 1.0) for _ in range(_DIM)]


def _rows(ids, rng):
    return [{"vec_id": i, "embedding": _vec(rng)} for i in ids]


def _bdf(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows))


def _drain(spark, src, sink, ckpt):
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


def _centroids(spark, rows):
    from http_log_anonymizer_spark.operators.kmeans import kmeans_quantized

    _, cents = kmeans_quantized(_bdf(spark, rows), k=8, rounds=2)
    return cents


def _queries(spark, rows):
    from http_log_anonymizer_spark.functions.vectors import norm_column, unit_from

    return _bdf(spark, rows).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qemb"),
        unit_from("embedding", norm_column("embedding")).alias("qe"),
    )


def test_stream_index_equals_batch_build_and_probe_parity(spark, tmp_path):
    rng = random.Random(11)
    boot = _rows(range(200), rng)
    cents = _centroids(spark, boot)

    src, base, ckpt = tmp_path / "src", tmp_path / "state", tmp_path / "ck"
    src.mkdir()
    sink = StreamingIVFIndexSink(str(base), cents, compact_every=3)

    batches = [_rows(range(i * 50, (i + 1) * 50), rng) for i in range(5)]
    for i, b in enumerate(batches):
        _write(src / f"b{i}.txt", b)
    _drain(spark, src, sink, ckpt)

    everything = [r for b in batches for r in b]
    got = {
        (r.vec_id, r.label): tuple(r.ue)
        for r in sink.index(spark).collect()
    }
    want = {
        (r.vec_id, r.label): tuple(r.ue)
        for r in assign_rows(_bdf(spark, everything), cents).collect()
    }
    assert got == want  # stream-built == batch-built, bit for bit

    # probe parity: same kernels over the stream index vs a fresh
    # batch index — identical top-k rows
    from http_log_anonymizer_spark.operators.ivf import ivf_probe_cells, ivf_scan_topk

    q = _queries(spark, _rows(range(900, 910), rng))
    stream_res = [tuple(r) for r in sink.probe(spark, q, nprobe=3, k=5).collect()]
    batch_u = assign_rows(_bdf(spark, everything), cents)
    batch_res = [
        tuple(r)
        for r in ivf_scan_topk(batch_u, ivf_probe_cells(q, cents, 3), 5).collect()
    ]
    assert stream_res == batch_res
    assert len({r[0] for r in stream_res}) == 10  # every query answered

    # compaction happened (compact_every=3 over 5 batches) and the
    # state file count stays bounded
    import os

    parts = os.listdir(base / "index")
    assert any(p.startswith("_batch=t1.") for p in parts)  # geometric tier-1 fold ran
    assert len(parts) < 2 * 3 + 1


def test_replay_and_torn_write_repair(spark, tmp_path):
    rng = random.Random(23)
    boot = _rows(range(100), rng)
    cents = _centroids(spark, boot)
    base = tmp_path / "state"
    sink = StreamingIVFIndexSink(str(base), cents)

    b0, b1 = _rows(range(0, 40), rng), _rows(range(40, 80), rng)
    sink.write(_bdf(spark, b0), 0)
    sink.write(_bdf(spark, b1), 1)
    clean = {r.vec_id for r in sink.index(spark).collect()}
    assert clean == set(range(80))

    # same-batch-id replay overwrites its own partition — no dupes
    sink.write(_bdf(spark, b1), 1)
    rows = sink.index(spark).collect()
    assert len(rows) == 80 and {r.vec_id for r in rows} == clean

    # torn write: clobber batch 1's partition, replay repairs it
    import shutil

    shutil.rmtree(base / "index" / "_batch=b1")
    sink.write(_bdf(spark, b1), 1)
    rows = sink.index(spark).collect()
    assert len(rows) == 80 and {r.vec_id for r in rows} == clean


def test_cold_probe_is_empty_typed(spark, tmp_path):
    rng = random.Random(5)
    cents = _centroids(spark, _rows(range(50), rng))
    sink = StreamingIVFIndexSink(str(tmp_path / "state"), cents)
    q = _queries(spark, _rows(range(3), rng))
    res = sink.probe(spark, q)
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        "query_id",
        "neighbor_id",
        "rank",
        "cos",
    ]


def test_readout_excludes_uncommitted_partition(spark, tmp_path):
    """ADVICE r05: an in-flight ``_batch=b*`` partition torn mid-write
    (no ``_SUCCESS``, no restart/replay yet) must NOT surface in
    index()/probe() readouts — partial files could yield partial rows
    or fail the read. Simulate the tear by dropping _SUCCESS from a
    written partition; the replay then repairs it and the rows
    reappear."""
    rng = random.Random(29)
    cents = _centroids(spark, _rows(range(100), rng))
    base = tmp_path / "state"
    sink = StreamingIVFIndexSink(str(base), cents)

    b0, b1 = _rows(range(0, 30), rng), _rows(range(30, 60), rng)
    sink.write(_bdf(spark, b0), 0)
    sink.write(_bdf(spark, b1), 1)

    # tear batch 1: remove the commit marker, leaving partial files
    (base / "index" / "_batch=b1" / "_SUCCESS").unlink()
    seen = {r.vec_id for r in sink.index(spark).collect()}
    assert seen == set(range(30)), "torn partition leaked into readout"
    probed = sink.probe(spark, _queries(spark, _rows([999], rng)), nprobe=8, k=5)
    assert {r.neighbor_id for r in probed.collect()} <= set(range(30))

    # replay repairs the tear; the rows come back
    sink.write(_bdf(spark, b1), 1)
    assert {r.vec_id for r in sink.index(spark).collect()} == set(range(60))
