"""Planted semantics for multimodal_phash_neardup: identical payloads
pair at hamming 0, a lightly-edited copy (one corrupted region) stays
inside the radius while unrelated media stays out, the fingerprint
matches a pure-Python reference, and oracle parity (vs the BRUTE
quadratic join) proves the banded join lossless on every planted
table."""

from __future__ import annotations

import random

import duckdb
import numpy as np

from http_log_anonymizer_spark.functions.multimodal import PHASH_BITS, perceptual_hash
from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _py_phash(payload: bytes) -> int:
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    n = len(b)
    if n == 0:
        return 0
    blk = (np.arange(n) * PHASH_BITS) // n
    s = np.bincount(blk, weights=b, minlength=PHASH_BITS).astype(np.int64)
    ln = np.bincount(blk, minlength=PHASH_BITS).astype(np.int64)
    bits = (s * n) > (int(b.sum()) * ln)
    return int((bits.astype(np.int64) << np.arange(PHASH_BITS)).sum())


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["multimodal_phash_neardup"]
    got = {(r.doc_a, r.doc_b): r.hamming for r in q.spark_fn(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        ok, msg = compare(q.spark_fn(spark, str(tmp_path)), con.execute(q.oracle).df())
        assert ok, msg  # brute oracle == banded plan -> banding lossless
    finally:
        con.close()
    return got


def _rand_text(rng, n_chars):
    return "".join(rng.choice(" abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(n_chars))


def test_identical_and_edited_copies_pair_but_unrelated_do_not(spark, tmp_path):
    rng = random.Random(5)
    base = _rand_text(rng, 600)
    # doc 1: byte-identical re-upload; doc 2: one corrupted region
    # (~2 blocks of 60); docs 3/4: unrelated media
    edited = base[:200] + "XXXXXXXXXXXXXXXXXXXX" + base[220:]
    texts = [base, base, edited, _rand_text(rng, 600), _rand_text(rng, 597)]
    _write_docs(spark, tmp_path, texts)
    got = _run(spark, tmp_path)
    assert got[(0, 1)] == 0  # exact re-upload: hamming 0
    assert (0, 2) in got and got[(0, 2)] <= 10  # edited copy: inside radius
    assert got[(1, 2)] == got[(0, 2)]
    assert not any(3 in p or 4 in p for p in got)  # unrelated stays out


def test_fingerprint_matches_python_reference(spark, tmp_path):
    rng = random.Random(9)
    texts = [_rand_text(rng, n) for n in (0, 1, 30, 59, 60, 61, 500, 2000)]
    df = spark.createDataFrame(
        [(i, t.encode("utf-8")) for i, t in enumerate(texts)],
        "doc_id long, data binary",
    )
    got = {r.doc_id: r.phash for r in perceptual_hash(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_phash(t.encode("utf-8")), f"doc {i} (len {len(t)})"
    # 60-bit discipline: always a non-negative single BIGINT
    assert all(0 <= v < (1 << 60) for v in got.values())


def test_wide_twin_same_semantics_finer_blocks(spark, tmp_path):
    """The 120-bit scale tier: identical payloads still pair at 0, an
    edited copy stays inside the same absolute radius (its corrupted
    region spans ~2x more of the finer blocks but the radius holds),
    and parity vs the brute two-word oracle proves the 11-band layout
    lossless."""
    rng = random.Random(13)
    base = _rand_text(rng, 600)
    edited = base[:300] + "QQQQQQQQQQ" + base[310:]
    _write_docs(spark, tmp_path, [base, base, edited, _rand_text(rng, 600)])
    q = REGISTRY["multimodal_phash_wide_neardup"]
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in q.spark_fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        ok, msg = compare(q.spark_fn(spark, str(tmp_path)), con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    assert got[(0, 1)] == 0
    assert (0, 2) in got and got[(0, 2)] <= 10
    assert not any(3 in p for p in got)


def test_wide_fingerprint_matches_python_reference(spark):
    from http_log_anonymizer_spark.functions.multimodal import (
        perceptual_hash_words,
    )

    rng = random.Random(17)
    texts = [_rand_text(rng, n) for n in (0, 59, 120, 121, 700)]
    df = spark.createDataFrame(
        [(i, t.encode("utf-8")) for i, t in enumerate(texts)],
        "doc_id long, data binary",
    )
    got = {r.doc_id: (r.sig0, r.sig1) for r in perceptual_hash_words(df).collect()}

    def py_words(payload: bytes) -> tuple[int, int]:
        b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
        n = len(b)
        if n == 0:
            return 0, 0
        blk = (np.arange(n) * 120) // n
        s = np.bincount(blk, weights=b, minlength=120).astype(np.int64)
        ln = np.bincount(blk, minlength=120).astype(np.int64)
        bits = (s * n) > (int(b.sum()) * ln)
        w0 = int((bits[:60].astype(np.int64) << np.arange(60)).sum())
        w1 = int((bits[60:].astype(np.int64) << np.arange(60)).sum())
        return w0, w1

    for i, t in enumerate(texts):
        assert got[i] == py_words(t.encode("utf-8")), f"doc {i}"
    assert all(0 <= v < (1 << 60) for pair in got.values() for v in pair)


def test_brightness_shift_invariance_property():
    """The aHash family's defining robustness, which exact hashes lack:
    adding a constant to EVERY byte (global brightness/exposure shift
    on real media) preserves every fingerprint bit, because the block
    inequality s_j*n > total*l_j gains c*l_j*n on both sides. Pure
    numpy property check over random payloads — no Spark needed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        data=st.binary(min_size=1, max_size=400),
        c=st.integers(min_value=1, max_value=60),
    )
    def prop(data: bytes, c: int):
        b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        if (b + c > 255).any():  # keep the shift a valid byte stream
            b = b % (256 - c)
        shifted = bytes((b + c).astype(np.uint8))
        assert _py_phash(bytes(b.astype(np.uint8))) == _py_phash(shifted)

    prop()


def test_empty_payloads_never_pair(spark, tmp_path):
    """Two zero-byte assets must NOT pair (an all-zero fingerprint
    would put every empty payload at hamming 0 of every other); the
    oracle's per-byte unnest drops them naturally, and the Spark side
    excludes them explicitly — parity on the planted table proves the
    exclusion agrees."""
    rng = random.Random(21)
    texts = ["", "", _rand_text(rng, 300), _rand_text(rng, 300)]
    _write_docs(spark, tmp_path, texts)
    got = _run(spark, tmp_path)
    assert not any(0 in p or 1 in p for p in got)
    q = REGISTRY["multimodal_phash_wide_neardup"]
    wide = {
        (r.doc_a, r.doc_b) for r in q.spark_fn(spark, str(tmp_path)).collect()
    }
    assert not any(0 in p or 1 in p for p in wide)
