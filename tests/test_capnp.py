"""Cap'n Proto codec tests: wire-format invariants, roundtrip, reject
semantics, and the full capnp -> decode -> anonymize -> sink pipeline
over a streaming source of real encoded payloads."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from http_log_anonymizer_spark.sources.capnp import decode_capnp_stream
from http_log_anonymizer_spark.sources.capnp_codec import (
    decode_http_log_record,
    encode_http_log_record,
)

GOLDEN = dict(
    timestamp_epoch_milli=1704067207999,
    resource_id=42,
    bytes_sent=1234,
    request_time_milli=56,
    response_status=200,
    cache_status="HIT",
    method="GET",
    remote_addr="1.2.3.4",
    url="/api/v1/data",
)


def test_roundtrip():
    assert decode_http_log_record(encode_http_log_record(**GOLDEN)) == GOLDEN


def test_roundtrip_edge_values():
    rec = dict(
        timestamp_epoch_milli=0,
        resource_id=2**64 - 1,
        bytes_sent=0,
        request_time_milli=2**63,
        response_status=65535,
        cache_status="",
        method="Ω-method",  # non-ascii utf-8
        remote_addr="2001:0db8:85a3:0000:0000:8a2e:0370:7334",
        url="x" * 100,
    )
    assert decode_http_log_record(encode_http_log_record(**rec)) == rec


def test_wire_layout_invariants():
    """Spot-check the encoding against the public spec, not just our own
    decoder: segment table, root struct pointer (C=5 data words, D=4
    pointer words), first data word."""
    raw = encode_http_log_record(**GOLDEN)
    nseg_m1, seg_words = struct.unpack_from("<II", raw, 0)
    assert nseg_m1 == 0 and len(raw) == 8 + seg_words * 8
    root = struct.unpack_from("<Q", raw, 8)[0]
    assert root & 3 == 0  # struct pointer
    assert (root >> 2) & 0x3FFFFFFF == 0  # struct immediately follows
    assert (root >> 32) & 0xFFFF == 5  # data words
    assert root >> 48 == 4  # pointer words
    assert struct.unpack_from("<Q", raw, 16)[0] == GOLDEN["timestamp_epoch_milli"]
    # first text pointer: byte list, count = len("HIT")+1
    p0 = struct.unpack_from("<Q", raw, 8 + 8 * 6)[0]
    assert p0 & 3 == 1 and (p0 >> 32) & 7 == 2 and p0 >> 35 == 4


@pytest.mark.parametrize(
    "mutant",
    [
        b"",
        b"\x00" * 7,  # not word-aligned
        b"\xff\xff\xff\xff" + b"\x00" * 12,  # absurd segment count
        struct.pack("<II", 0, 99) + b"\x00" * 8,  # size beyond buffer
        struct.pack("<IIQ", 0, 1, 1 | (2 << 32)),  # root is a list pointer
    ],
)
def test_malformed_payloads_rejected(mutant):
    assert decode_http_log_record(mutant) is None


def test_truncation_fuzz():
    raw = encode_http_log_record(**GOLDEN)
    for cut in range(0, len(raw) - 1, 3):
        assert decode_http_log_record(raw[:cut]) in (None,)  # never raises


def _frame(segments: list[bytes]) -> bytes:
    """Standard multi-segment framing: u32 count-1, u32 sizes, header
    padded to a word boundary."""
    header = struct.pack("<I", len(segments) - 1)
    for s in segments:
        assert len(s) % 8 == 0
        header += struct.pack("<I", len(s) // 8)
    header += b"\x00" * ((-len(header)) % 8)
    return header + b"".join(segments)


def _text_blobs(texts: list[str]) -> tuple[bytes, list[int]]:
    blobs, offsets = b"", []
    for t in texts:
        offsets.append(len(blobs) // 8)
        raw = t.encode() + b"\x00"
        blobs += raw + b"\x00" * ((-len(raw)) % 8)
    return blobs, offsets


_TEXTS = ["HIT", "GET", "1.2.3.4", "/api/v1/data"]
_DATA_WORDS = struct.pack(
    "<QQQQQ",
    GOLDEN["timestamp_epoch_milli"],
    GOLDEN["resource_id"],
    GOLDEN["bytes_sent"],
    GOLDEN["request_time_milli"],
    GOLDEN["response_status"],
)


def test_decode_multi_segment_far_pointers():
    """Texts live in segment 1 behind one-word far pointers: the landing
    pad (in the target segment) is an ordinary list pointer whose offset
    is relative to the pad's own position. Must decode identically to
    the single-segment encoding of the same record."""
    blobs, offs = _text_blobs(_TEXTS)
    # seg1: 4 landing-pad list pointers, then the blobs
    pads = b""
    for i, t in enumerate(_TEXTS):
        rel = (4 - i - 1) + offs[i]
        pads += struct.pack("<Q", 1 | (rel << 2) | (2 << 32) | ((len(t) + 1) << 35))
    seg1 = pads + blobs
    # seg0: root struct (5 data + 4 ptr words), far pointers to seg1 pads
    root = struct.pack("<Q", (5 << 32) | (4 << 48))
    fars = b"".join(
        struct.pack("<Q", 2 | (i << 3) | (1 << 32)) for i in range(4)
    )
    msg = _frame([root + _DATA_WORDS + fars, seg1])
    assert decode_http_log_record(msg) == GOLDEN


def test_decode_double_far_pointers():
    """Double-far: the two-word pad [far-to-content, tag-with-offset-0]
    sits in a third segment while the bytes live in another."""
    blobs, offs = _text_blobs(_TEXTS)
    seg1 = blobs  # content only
    # seg2: [far B=0 -> seg1 blob start][list tag, offset 0] per text
    pads = b""
    for i, t in enumerate(_TEXTS):
        pads += struct.pack("<Q", 2 | (offs[i] << 3) | (1 << 32))
        pads += struct.pack("<Q", 1 | (2 << 32) | ((len(t) + 1) << 35))
    root = struct.pack("<Q", (5 << 32) | (4 << 48))
    fars = b"".join(
        struct.pack("<Q", 2 | (1 << 2) | ((2 * i) << 3) | (2 << 32)) for i in range(4)
    )
    msg = _frame([root + _DATA_WORDS + fars, seg1, pads])
    assert decode_http_log_record(msg) == GOLDEN


def test_multi_segment_malformations_rejected():
    blobs, offs = _text_blobs(_TEXTS)
    root = struct.pack("<Q", (5 << 32) | (4 << 48))
    # far pointer to a nonexistent segment
    fars = b"".join(struct.pack("<Q", 2 | (i << 3) | (9 << 32)) for i in range(4))
    msg = _frame([root + _DATA_WORDS + fars, blobs])
    assert decode_http_log_record(msg) is None
    # double-far whose pad is truncated (points past the pad segment)
    fars = b"".join(
        struct.pack("<Q", 2 | (1 << 2) | (99 << 3) | (2 << 32)) for i in range(4)
    )
    msg = _frame([root + _DATA_WORDS + fars, blobs, b"\x00" * 8])
    assert decode_http_log_record(msg) is None
    # truncation fuzz over a valid multi-segment message (never raises)
    pads = b""
    for i, t in enumerate(_TEXTS):
        rel = (4 - i - 1) + offs[i]
        pads += struct.pack("<Q", 1 | (rel << 2) | (2 << 32) | ((len(t) + 1) << 35))
    good = _frame(
        [root + _DATA_WORDS + b"".join(struct.pack("<Q", 2 | (i << 3) | (1 << 32)) for i in range(4)), pads + blobs]
    )
    assert decode_http_log_record(good) == GOLDEN
    for cut in range(0, len(good) - 1, 3):
        assert decode_http_log_record(good[:cut]) is None


def test_decode_stream_batch(spark):
    payloads = [
        (encode_http_log_record(**{**GOLDEN, "resource_id": i}),) for i in range(10)
    ] + [(b"garbage",), (None,)]
    df = spark.createDataFrame(payloads, ["value"])
    out = decode_capnp_stream(df)
    rows = out.orderBy("resource_id").collect()
    assert len(rows) == 10  # garbage + null rejected
    assert rows[0].remote_addr == "1.2.3.4"
    assert str(rows[0].timestamp) == "2024-01-01 00:00:07.999000"  # epoch-ms kept


def test_capnp_streaming_pipeline_end_to_end(spark, tmp_path):
    """The reference's full hot path with REAL capnp bytes: encoded
    payloads in a streamed parquet binary column -> mapInPandas decode
    -> anonymize -> parquet sink via foreachBatch."""
    from http_log_anonymizer_spark.sinks.parquet import ParquetSink
    from http_log_anonymizer_spark.streaming.pipeline import (
        PipelineSpec,
        anonymize_transform,
        build_streaming_query,
    )

    src = tmp_path / "src"
    payloads = [
        (encode_http_log_record(**{**GOLDEN, "resource_id": i, "remote_addr": f"10.0.0.{i}"}),)
        for i in range(8)
    ] + [(b"not capnp",)]
    spark.createDataFrame(payloads, ["value"]).write.parquet(str(src))

    source = spark.readStream.schema("value binary").parquet(str(src))
    sink = ParquetSink(str(tmp_path / "out"))
    spec = PipelineSpec(
        decoder=decode_capnp_stream, transform=anonymize_transform, writer=sink.write
    )
    q = build_streaming_query(
        source, spec, checkpoint_dir=str(tmp_path / "ckpt"), trigger={"availableNow": True}
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 8  # invalid payload dropped
    addrs = {r[0] for r in got.select("remote_addr").collect()}
    assert addrs == {"10.0.0.x"}  # anonymized
