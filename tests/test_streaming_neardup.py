"""Streaming ingest-time near-dup dedup (streaming/neardup.py): a
document stream is MinHash-LSH-deduped against the persisted index of
everything accepted so far — within-batch, cross-batch, and across a
checkpoint restart."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from http_log_anonymizer_spark.streaming.neardup import NearDupDedupSink

_WORDS = [f"w{i}" for i in range(400)]


def _doc(doc_id: int, rng: random.Random, n: int = 40) -> dict:
    return {"doc_id": doc_id, "text": " ".join(rng.choice(_WORDS) for _ in range(n))}


def _write(path, docs) -> None:
    path.write_text("\n".join(json.dumps(d) for d in docs))


def _drain(spark, src, base, ckpt) -> None:
    rows = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        rows.writeStream.foreachBatch(NearDupDedupSink(str(base)).write)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_streaming_neardup_dedup_across_batches_and_restart(spark, tmp_path):
    rng = random.Random(7)
    src, base, ckpt = tmp_path / "src", tmp_path / "state", tmp_path / "ck"
    src.mkdir()

    originals = [_doc(i, rng) for i in range(30)]
    _write(src / "b0.txt", originals)
    _drain(spark, src, base, ckpt)

    accepted0 = {
        r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()
    }
    assert accepted0 == set(range(30))  # distinct word salad: all kept

    # batch 2: exact copy of doc 3, a 1-token perturbation of doc 5
    # (jaccard ~0.8 > 0.5), an intra-batch identical pair (200, 201),
    # and fresh docs
    perturbed = dict(originals[5])
    toks = perturbed["text"].split()
    toks[10] = "zz_changed"
    copy3 = {"doc_id": 100, "text": originals[3]["text"]}
    near5 = {"doc_id": 101, "text": " ".join(toks)}
    fresh = [_doc(i, rng) for i in (200, 300)]
    twin = {"doc_id": 201, "text": fresh[0]["text"]}
    _write(src / "b1.txt", [copy3, near5, fresh[0], twin, fresh[1]])
    _drain(spark, src, base, ckpt)

    accepted1 = {
        r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()
    }
    # 100 (exact cross-batch dup) and 101 (near cross-batch dup) drop;
    # 201 drops within-batch against 200; 200 and 300 are accepted
    assert accepted1 == accepted0 | {200, 300}

    # restart from the same checkpoint with a new file: state must
    # still know everything accepted so far (including batch-2 docs)
    replay_200 = {"doc_id": 400, "text": fresh[0]["text"]}
    really_new = _doc(500, rng)
    _write(src / "b2.txt", [replay_200, really_new])
    _drain(spark, src, base, ckpt)

    accepted2 = {
        r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()
    }
    assert accepted2 == accepted1 | {500}

    # index/shingle state rows exist only for accepted docs
    idx_docs = {
        r.doc_id
        for r in spark.read.parquet(str(base / "index")).select("doc_id").distinct().collect()
    }
    assert idx_docs == accepted2


def test_streaming_neardup_agrees_with_batch_policy(spark, tmp_path):
    """Streaming accept/drop must equal the batch greedy-by-id policy
    (drop any doc with a verified pair to a lower id) when ids arrive
    in order — the backfill-vs-ingest consistency contract."""
    from http_log_anonymizer_spark.plans.dedup import (
        band_candidates,
        band_index,
        hashed_shingle_transform,
        minhash_signatures,
        verify_pairs,
    )

    rng = random.Random(13)
    docs = [_doc(i, rng) for i in range(40)]
    # plant near-dups across the id range
    for src_i, dst_i in ((2, 17), (8, 33), (20, 39)):
        toks = docs[src_i]["text"].split()
        toks[3] = "mut"
        docs[dst_i] = {"doc_id": docs[dst_i]["doc_id"], "text": " ".join(toks)}

    src, base, ckpt = tmp_path / "src", tmp_path / "state", tmp_path / "ck"
    src.mkdir()
    # stream in 3 id-ordered micro-batches; separate drains pin the
    # arrival order (a pre-populated file source may list files in any
    # order, and the contract below assumes ids arrive ascending)
    for i, (lo, hi) in enumerate(((0, 13), (13, 26), (26, 40))):
        _write(src / f"b{i}.txt", docs[lo:hi])
        _drain(spark, src, base, ckpt)
    streaming_kept = {
        r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()
    }

    bdf = spark.createDataFrame(docs, "doc_id long, text string")
    sh = hashed_shingle_transform(bdf).cache()
    bands = band_index(minhash_signatures(sh)).cache()
    pairs = verify_pairs(band_candidates(bands, bands), sh)
    batch_dropped = {r.doc_b for r in pairs.select("doc_b").distinct().collect()}
    batch_kept = {d["doc_id"] for d in docs} - batch_dropped

    assert streaming_kept == batch_kept
    assert len(batch_dropped) >= 3  # the planted near-dups really drop
