"""Streaming chunk (line) dedup: stream-order keep-first must equal the
batch C4 policy over everything arrived (plain-Python reference), torn
batches must repair, and redelivered documents must dedup against
themselves."""

from __future__ import annotations

import hashlib
import random

from http_log_anonymizer_spark.streaming.chunk_dedup import StreamingChunkDedupSink

L = 10


def _bdf(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _chunks(text: str):
    toks = text.split(" ")
    return [
        " ".join(toks[i * L : (i + 1) * L])
        for i in range((len(toks) + L - 1) // L or 1)
    ]


def _reference_keep_first(all_docs):
    """Plain-Python keep-first over (doc_id-ordered) chunk stream."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(all_docs):
        kept = []
        n = 0
        for ch in _chunks(text):
            n += 1
            hh = hashlib.md5(f"0|{ch}".encode()).hexdigest()
            if hh not in seen:
                seen.add(hh)
                kept.append(ch)
        out[doc_id] = (n, len(kept), " ".join(kept))
    return out


def _mk_docs(rng, ids, dup_pool):
    docs = []
    for i in ids:
        segs = []
        for _ in range(rng.randrange(1, 4)):
            if dup_pool and rng.random() < 0.5:
                segs.append(rng.choice(dup_pool))
            else:
                seg = " ".join(f"w{rng.randrange(500)}" for _ in range(L))
                dup_pool.append(seg)
                segs.append(seg)
        docs.append((i, " ".join(segs)))
    return docs


def test_stream_matches_batch_keep_first_policy(spark, tmp_path):
    rng = random.Random(11)
    pool: list[str] = []
    batches = [
        _mk_docs(rng, range(0, 20), pool),
        _mk_docs(rng, range(20, 40), pool),
        _mk_docs(rng, range(40, 60), pool),
    ]
    sink = StreamingChunkDedupSink(str(tmp_path / "state"), compact_every=4)
    for i, b in enumerate(batches):
        sink.write(_bdf(spark, b), i)

    everything = [d for b in batches for d in b]
    ref = _reference_keep_first(everything)
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_text)
        for r in sink.deduped_docs(spark).collect()
    }
    assert got == ref
    # something actually deduped (the pool guarantees repeats)
    assert any(k < n for n, k, _t in got.values())


def test_torn_batch_repair_and_replay(spark, tmp_path):
    rng = random.Random(23)
    pool: list[str] = []
    b0 = _mk_docs(rng, range(0, 10), pool)
    b1 = _mk_docs(rng, range(10, 20), pool)
    base = tmp_path / "state"
    sink = StreamingChunkDedupSink(str(base), compact_every=4)
    sink.write(_bdf(spark, b0), 0)
    sink.write(_bdf(spark, b1), 1)
    clean = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_text)
        for r in sink.deduped_docs(spark).collect()
    }

    # tear batch 1's chunk partition (simulated crash mid-write), replay
    import shutil

    shutil.rmtree(str(base / "chunks" / "_batch=b1"))
    sink.write(_bdf(spark, b1), 1)
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_text)
        for r in sink.deduped_docs(spark).collect()
    }
    assert got == clean
    assert got == _reference_keep_first(b0 + b1)


def test_redelivered_doc_dedups_against_itself(spark, tmp_path):
    # ADVICE r06: a doc redelivered under a NEW batch id must NOT add a
    # second (all-removed) docs row — aggregate readers would double-
    # count it. Exactly one row per doc_id, the first delivery's.
    text = " ".join(f"u{i}" for i in range(2 * L))
    sink = StreamingChunkDedupSink(str(tmp_path / "state"), compact_every=4)
    sink.write(_bdf(spark, [(1, text)]), 0)
    sink.write(_bdf(spark, [(1, text)]), 1)  # upstream duplicate delivery
    rows = sink.deduped_docs(spark).collect()
    assert len(rows) == 1
    assert rows[0].n_kept == 2 and rows[0].kept_text == text
    # and its chunks stayed deduped: the seen set holds 2 hashes, once
    seen = sink.seen_chunks(spark).collect()
    assert len(seen) == 2
    # aggregate consumer is now correct by default
    assert sum(r.n_chunks - r.n_kept for r in rows) == 0


def test_compaction_preserves_policy(spark, tmp_path):
    rng = random.Random(31)
    pool: list[str] = []
    sink = StreamingChunkDedupSink(str(tmp_path / "state"), compact_every=2)
    allb = []
    for i in range(7):  # enough batches to trigger tier folds
        b = _mk_docs(rng, range(10 * i, 10 * i + 10), pool)
        allb.extend(b)
        sink.write(_bdf(spark, b), i)
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_text)
        for r in sink.deduped_docs(spark).collect()
    }
    assert got == _reference_keep_first(allb)


def _reference_cdc_keep_first(all_docs):
    """Plain-Python keep-first over CDC chunks (the test_cdc_dedup
    boundary reference) in doc_id order."""
    K, D = 3, 8

    def _h64(s: str) -> int:
        return int(hashlib.md5(f"cdc|{s}".encode()).hexdigest()[:15], 16)

    def _cdc_chunks(text: str):
        toks = text.split(" ")
        n = len(toks)
        hs = (
            [_h64(" ".join(toks[p - 1 : p - 1 + K])) for p in range(1, n - K + 2)]
            if n >= K
            else []
        )
        bounds = (
            [1]
            + [p for p in range(2, len(hs) + 1) if hs[p - 1] % D == 0]
            + [n + 1]
        )
        return [
            " ".join(toks[bounds[i] - 1 : bounds[i + 1] - 1])
            for i in range(len(bounds) - 1)
        ]

    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(all_docs):
        kept, n = [], 0
        for ch in _cdc_chunks(text):
            n += 1
            hh = hashlib.md5(f"0|{ch}".encode()).hexdigest()
            if hh not in seen:
                seen.add(hh)
                kept.append(ch)
        out[doc_id] = (n, len(kept), " ".join(kept))
    return out


def test_cdc_chunker_mode_matches_cdc_policy(spark, tmp_path):
    """chunker="cdc": the stream applies the content-defined grain —
    including the shift-robustness the fixed grid lacks (a later doc
    with a junk prefix still dedups its shared suffix)."""
    rng = random.Random(47)
    shared = " ".join(f"w{rng.randrange(10_000)}" for _ in range(80))
    b0 = [(1, shared), (2, " ".join(f"x{i}" for i in range(25)))]
    b1 = [(10, "junk1 junk2 junk3 " + shared)]
    sink = StreamingChunkDedupSink(
        str(tmp_path / "state"), compact_every=4, chunker="cdc"
    )
    sink.write(_bdf(spark, b0), 0)
    sink.write(_bdf(spark, b1), 1)
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_text)
        for r in sink.deduped_docs(spark).collect()
    }
    assert got == _reference_cdc_keep_first(b0 + b1)
    # shift-robustness: doc 10 lost most of its chunks to doc 1
    n10, k10, _ = got[10]
    assert k10 < n10 / 2


def test_keep_first_survives_string_and_huge_doc_ids(spark, tmp_path):
    """ADVICE r06 regression: occ_key was doc_id*1e9+chunk_idx, which
    overflowed int64 past doc_id ~9.2e9 and NULLed out (dropping every
    chunk) for string doc_ids. The struct-min keep-first must handle
    both."""
    text = " ".join(f"s{i}" for i in range(2 * L))
    other = " ".join(f"t{i}" for i in range(L))
    # string ids: lexicographic keep-first ("a" < "b")
    sink = StreamingChunkDedupSink(str(tmp_path / "s1"), compact_every=4)
    df = spark.createDataFrame(
        [("b", text), ("a", text), ("c", other)], "doc_id string, text string"
    )
    sink.write(df, 0)
    got = {r.doc_id: (r.n_chunks, r.n_kept) for r in sink.deduped_docs(spark).collect()}
    assert got == {"a": (2, 2), "b": (2, 0), "c": (1, 1)}

    # numeric ids beyond the old packing bound (~9.2e9)
    sink2 = StreamingChunkDedupSink(str(tmp_path / "s2"), compact_every=4)
    big0, big1 = 10_000_000_000, 10_000_000_001
    sink2.write(_bdf(spark, [(big1, text), (big0, text)]), 0)
    got2 = {
        r.doc_id: (r.n_chunks, r.n_kept) for r in sink2.deduped_docs(spark).collect()
    }
    assert got2 == {big0: (2, 2), big1: (2, 0)}


def test_changed_text_redelivery_pins_the_documented_contract(spark, tmp_path):
    """VERDICT r08 item 8: the CONTRACT block (chunk_dedup.py docstring)
    documents what happens when an upstream redelivers a doc_id with
    CHANGED text — the docs row stays the FIRST delivery's (suppressed
    re-describe), while the new text's novel chunks still enter the
    seen set and dedup later arrivals. Pin it so the contract can't
    drift."""
    first = " ".join(f"a{i}" for i in range(2 * L))
    novel_seg = " ".join(f"b{i}" for i in range(L))
    changed = _chunks(first)[0] + " " + novel_seg  # keeps chunk 1, swaps chunk 2
    sink = StreamingChunkDedupSink(str(tmp_path / "state"), compact_every=4)
    sink.write(_bdf(spark, [(1, first)]), 0)
    sink.write(_bdf(spark, [(1, changed)]), 1)  # same key, mutated content

    # docs output: exactly one row per doc_id, the FIRST delivery's
    rows = sink.deduped_docs(spark).collect()
    assert len(rows) == 1
    assert rows[0].kept_text == first and rows[0].n_kept == 2

    # chunk-level state stays correct: the mutated text's novel chunk
    # entered the seen set (2 original + 1 novel = 3 hashes) ...
    assert len(sink.seen_chunks(spark).collect()) == 3

    # ... and it dedups later arrivals: a NEW doc made of the novel
    # segment plus fresh material keeps only the fresh chunk
    fresh = " ".join(f"c{i}" for i in range(L))
    sink.write(_bdf(spark, [(2, novel_seg + " " + fresh)]), 2)
    by_id = {r.doc_id: r for r in sink.deduped_docs(spark).collect()}
    assert len(by_id) == 2
    assert by_id[2].n_chunks == 2 and by_id[2].n_kept == 1
    assert by_id[2].kept_text == fresh
