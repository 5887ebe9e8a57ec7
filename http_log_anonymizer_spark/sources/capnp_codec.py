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

Scope: multi-segment messages with struct, text-list, far and
double-far pointers (encoding.html "Inter-Segment Pointers"). The
reference's producer emits single-segment messages (and so does
``encode_http_log_record``), but a compliant consumer must accept any
framing another Cap'n Proto writer produces — arena allocators
routinely spill large or reused messages across segments. Every
bounds/shape violation returns None (reject-and-continue,
source.rs:109-123), never raises.
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


_MAX_SEGMENTS = 512  # sanity cap; a record message never needs more


def _parse_segments(payload: bytes) -> list[bytes] | None:
    """Standard framing: u32 count-1, count u32 sizes (words), header
    padded to a word boundary, then the segments back to back."""
    if len(payload) < 8 or len(payload) % 4:
        return None
    (nseg_m1,) = _U32.unpack_from(payload, 0)
    nseg = nseg_m1 + 1
    if nseg < 1 or nseg > _MAX_SEGMENTS:
        return None
    header_len = 4 + 4 * nseg
    header_len += (-header_len) % _WORD
    if len(payload) < header_len:
        return None
    sizes = [_U32.unpack_from(payload, 4 + 4 * i)[0] for i in range(nseg)]
    segs, pos = [], header_len
    for w in sizes:
        if w < 1:
            return None
        end = pos + w * _WORD
        if end > len(payload):
            return None
        segs.append(payload[pos:end])
        pos = end
    if pos != len(payload):
        return None
    return segs


def _read_ptr(segs: list[bytes], seg_i: int, word_i: int, depth: int = 0):
    """Read the pointer at (seg_i, word_i), following far / double-far
    indirections. Returns one of:

      ("null",)
      ("struct", content_seg, content_word, data_words, ptr_words)
      ("list",   content_seg, content_word, elem_size, count)

    or None on malformation. Intra-segment offsets are relative to the
    word after the pointer; a far pointer's landing pad lives in the
    TARGET segment, and a double-far pad is [far-to-content, tag-with-
    offset-0] (encoding.html, Inter-Segment Pointers)."""
    if depth > 2 or seg_i >= len(segs):
        return None
    seg = segs[seg_i]
    if word_i < 0 or (word_i + 1) * _WORD > len(seg):
        return None
    p = _U64.unpack_from(seg, word_i * _WORD)[0]
    if p == 0:
        return ("null",)
    kind = p & 3
    if kind == 2:  # far pointer
        two_word_pad = (p >> 2) & 1
        off = (p >> 3) & 0x1FFFFFFF
        tseg = p >> 32
        if tseg >= len(segs):
            return None
        if not two_word_pad:
            # pad is an ordinary pointer located in the target segment
            return _read_ptr(segs, tseg, off, depth + 1)
        pad_seg = segs[tseg]
        if (off + 2) * _WORD > len(pad_seg):
            return None
        pad0 = _U64.unpack_from(pad_seg, off * _WORD)[0]
        tag = _U64.unpack_from(pad_seg, (off + 1) * _WORD)[0]
        if pad0 & 3 != 2 or (pad0 >> 2) & 1 != 0:
            return None  # pad0 must be a one-word far pointer
        cseg = pad0 >> 32
        coff = (pad0 >> 3) & 0x1FFFFFFF
        if cseg >= len(segs):
            return None
        tag_kind = tag & 3
        if tag_kind == 0:
            return ("struct", cseg, coff, (tag >> 32) & 0xFFFF, tag >> 48)
        if tag_kind == 1:
            return ("list", cseg, coff, (tag >> 32) & 7, tag >> 35)
        return None
    b = _signed30((p >> 2) & 0x3FFFFFFF)
    content = word_i + 1 + b
    if kind == 0:
        return ("struct", seg_i, content, (p >> 32) & 0xFFFF, p >> 48)
    if kind == 1:
        return ("list", seg_i, content, (p >> 32) & 7, p >> 35)
    return None  # kind 3: capability pointers unsupported


def decode_http_log_record(payload: bytes) -> dict | None:
    """Parse one HttpLogRecord message; None on any malformation."""
    try:
        segs = _parse_segments(payload)
        if segs is None:
            return None
        root = _read_ptr(segs, 0, 0)
        if not root or root[0] != "struct":
            return None
        _, rseg, data_start, c_words, d_words = root
        seg = segs[rseg]
        ptr_start = data_start + c_words
        if data_start < 0 or (ptr_start + d_words) * _WORD > len(seg):
            return None

        def u64_field(w: int) -> int:
            if w >= c_words:
                return 0
            return _U64.unpack_from(seg, (data_start + w) * _WORD)[0]

        def u16_field(w: int, byte: int) -> int:
            if w >= c_words:
                return 0
            return _struct.unpack_from("<H", seg, (data_start + w) * _WORD + byte)[0]

        def text_field(i: int) -> str | None:
            if i >= d_words:
                return ""
            t = _read_ptr(segs, rseg, ptr_start + i)
            if t is None:
                return None
            if t[0] == "null":
                return ""  # null pointer -> default
            if t[0] != "list":
                return None
            _, lseg, lstart, elem_size, count = t
            if elem_size != 2 or count < 1:
                return None
            content = segs[lseg]
            start = lstart * _WORD
            end = start + count
            if lstart < 0 or end > len(content):
                return None
            if content[end - 1] != 0:
                return None
            return content[start : end - 1].decode("utf-8")

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
