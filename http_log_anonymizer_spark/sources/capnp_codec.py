"""Pure-Python Cap'n Proto codec for ``HttpLogRecord``.

Implements the public Cap'n Proto wire encoding
(https://capnproto.org/encoding.html) for the one message shape the
reference pipeline uses (http_log.capnp:3-13) — no pycapnp needed.

Field layout (capnp slot-packing in ordinal order):

  data section, 5 words:
    word 0: timestampEpochMilli  UInt64   @0
    word 1: resourceId           UInt64   @1
    word 2: bytesSent            UInt64   @2
    word 3: requestTimeMilli     UInt64   @3
    word 4 bytes 0-1: responseStatus UInt16 @4   (rest zero padding)
  pointer section, 4 words (Text = byte lists with NUL terminator):
    ptr 0: cacheStatus @5   ptr 1: method @6
    ptr 2: remoteAddr  @7   ptr 3: url    @8

Scope: single-segment messages, struct + text-list pointers. Far
pointers (multi-segment) are rejected as invalid — the reference's
producer emits single-segment messages (one small struct per message
cannot span segments). Every bounds/shape violation returns None
(reject-and-continue, source.rs:109-123), never raises.
"""

from __future__ import annotations

import struct as _struct

_WORD = 8
_U32 = _struct.Struct("<I")
_U64 = _struct.Struct("<Q")

FIELDS = (
    "timestamp_epoch_milli",
    "resource_id",
    "bytes_sent",
    "request_time_milli",
    "response_status",
    "cache_status",
    "method",
    "remote_addr",
    "url",
)


def encode_http_log_record(
    timestamp_epoch_milli: int,
    resource_id: int,
    bytes_sent: int,
    request_time_milli: int,
    response_status: int,
    cache_status: str,
    method: str,
    remote_addr: str,
    url: str,
) -> bytes:
    """Serialize one HttpLogRecord (standard framing, single segment)."""
    texts = [t.encode("utf-8") for t in (cache_status, method, remote_addr, url)]

    data = bytearray(5 * _WORD)
    _U64.pack_into(data, 0, timestamp_epoch_milli & (2**64 - 1))
    _U64.pack_into(data, 8, resource_id & (2**64 - 1))
    _U64.pack_into(data, 16, bytes_sent & (2**64 - 1))
    _U64.pack_into(data, 24, request_time_milli & (2**64 - 1))
    _struct.pack_into("<H", data, 32, response_status & 0xFFFF)

    # text blobs, each padded to a word boundary, placed after the
    # pointer section in order
    blobs = bytearray()
    blob_word_offsets = []  # start of each blob, in words after pointer section
    for t in texts:
        blob_word_offsets.append(len(blobs) // _WORD)
        with_nul = t + b"\x00"
        pad = (-len(with_nul)) % _WORD
        blobs += with_nul + b"\x00" * pad

    ptrs = bytearray()
    n_ptrs = len(texts)
    for i, t in enumerate(texts):
        # list pointer: offset from END of this pointer word to content
        b_words = (n_ptrs - i - 1) + blob_word_offsets[i]
        word = 1 | ((b_words & 0x3FFFFFFF) << 2) | (2 << 32) | ((len(t) + 1) << 35)
        ptrs += _U64.pack(word)

    # root struct pointer: B=0 (struct follows), C=5 data words, D=4 ptrs
    root = _U64.pack(0 | (0 << 2) | (5 << 32) | (n_ptrs << 48))
    segment = root + bytes(data) + bytes(ptrs) + bytes(blobs)
    assert len(segment) % _WORD == 0
    # segment table: count-1 (=0), size in words
    header = _U32.pack(0) + _U32.pack(len(segment) // _WORD)
    return header + segment


def _signed30(v: int) -> int:
    return v - (1 << 30) if v & (1 << 29) else v


def decode_http_log_record(payload: bytes) -> dict | None:
    """Parse one HttpLogRecord message; None on any malformation."""
    try:
        if len(payload) < 8 or len(payload) % 4:
            return None
        (nseg_m1,) = _U32.unpack_from(payload, 0)
        nseg = nseg_m1 + 1
        if nseg != 1:  # far pointers unsupported; reject multi-segment
            return None
        (seg_words,) = _U32.unpack_from(payload, 4)
        seg_start = 8  # 4B count + 4B size already word-aligned
        seg = payload[seg_start : seg_start + seg_words * _WORD]
        if len(seg) != seg_words * _WORD or seg_words < 1:
            return None

        def word(i: int) -> int:
            return _U64.unpack_from(seg, i * _WORD)[0]

        root = word(0)
        if root & 3 != 0:  # must be a struct pointer
            return None
        b = _signed30((root >> 2) & 0x3FFFFFFF)
        c_words = (root >> 32) & 0xFFFF
        d_words = root >> 48
        data_start = 1 + b
        ptr_start = data_start + c_words
        if data_start < 0 or ptr_start + d_words > seg_words:
            return None

        def u64_field(w: int) -> int:
            return word(data_start + w) if w < c_words else 0

        def u16_field(w: int, byte: int) -> int:
            if w >= c_words:
                return 0
            return _struct.unpack_from("<H", seg, (data_start + w) * _WORD + byte)[0]

        def text_field(i: int) -> str | None:
            if i >= d_words:
                return ""
            p_idx = ptr_start + i
            p = word(p_idx)
            if p == 0:
                return ""  # null pointer -> default
            if p & 3 != 1:
                return None
            pb = _signed30((p >> 2) & 0x3FFFFFFF)
            elem_size = (p >> 32) & 7
            count = p >> 35
            if elem_size != 2 or count < 1:
                return None
            content_start = (p_idx + 1 + pb) * _WORD
            content_end = content_start + count
            if content_start < 0 or content_end > len(seg):
                return None
            raw = seg[content_start : content_end - 1]  # strip NUL
            if seg[content_end - 1] != 0:
                return None
            return raw.decode("utf-8")

        texts = [text_field(i) for i in range(4)]
        if any(t is None for t in texts):
            return None
        return {
            "timestamp_epoch_milli": u64_field(0),
            "resource_id": u64_field(1),
            "bytes_sent": u64_field(2),
            "request_time_milli": u64_field(3),
            "response_status": u16_field(4, 0),
            "cache_status": texts[0],
            "method": texts[1],
            "remote_addr": texts[2],
            "url": texts[3],
        }
    except Exception:
        return None
