"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, decoded via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the actual pixel/sample
decode is STUBBED (import-gated; see ``_real_decode``). What IS real and
tested is everything Spark-side: the binary column plumbing, the
mapInPandas batch iteration, the output schema contract, and the
deterministic fallback decoder — which is pure arithmetic on the bytes
so the DuckDB oracle can verify the full pipeline end-to-end.

At 100 TB: binary payloads ride in parquet as BYTE_ARRAY; mapInPandas
streams Arrow batches so one task never holds more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` rows of media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("media_format", StringType()),
    ]
)

_FORMATS = ["jpeg", "png", "webp"]


def _real_decode(payload: bytes) -> tuple[int, int, str]:  # pragma: no cover
    """Real image decode — requires PIL, which this container lacks."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow; container provides no media libs — "
            "using the deterministic fake decoder instead"
        ) from exc
    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, (img.format or "unknown").lower()


def fake_decode(n_bytes: int) -> tuple[int, int, str]:
    """Deterministic fake decode from payload length (pure integer
    arithmetic — mirrored by the SQL oracle in plans/multimodal.py)."""
    width = n_bytes % 640 + 1
    height = (n_bytes * 7) % 480 + 1
    fmt = _FORMATS[n_bytes % 3]
    return width, height, fmt


def decode_media_meta(df: DataFrame) -> DataFrame:
    """mapInPandas decode of a (doc_id, source, data binary) DataFrame
    into typed media metadata. Batch shape: pandas DataFrames of Arrow
    batch size; constant memory per task regardless of corpus size."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["data"].map(len)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": n.astype("int64"),
                    "width": (n % 640 + 1).astype("int32"),
                    "height": ((n * 7) % 480 + 1).astype("int32"),
                    "media_format": (n % 3).map(dict(enumerate(_FORMATS))),
                }
            )
            yield out

    return df.mapInPandas(decode, DECODED_META_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)

FRAME_SIZE = 64  # bytes per fake "frame"
SAMPLE_EVERY = 4  # keep every 4th frame


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame-sampling for opaque video payloads: split the binary into
    fixed-size frames, keep every SAMPLE_EVERY-th, emit per-frame
    metadata (one input row -> many output rows via mapInPandas). The
    real codec decode is stubbed (no media libs — frames are byte
    slices, checksum is a byte sum); the Spark plumbing (binary
    chunking, fan-out row multiplication, Arrow batching) is real.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "frame_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["data"]):
                data = bytes(payload)
                n_frames = (len(data) + FRAME_SIZE - 1) // FRAME_SIZE
                for idx in range(0, n_frames, SAMPLE_EVERY):
                    chunk = data[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_checksum"].append(sum(chunk))
            yield pd.DataFrame(out)

    return df.mapInPandas(frames, FRAME_SCHEMA)


RESIZE_BOX = 64  # fit within RESIZE_BOX x RESIZE_BOX, aspect preserved
N_FEATURE_BINS = 8  # byte-value histogram bins (256 / 32)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("new_w", IntegerType()),
        StructField("new_h", IntegerType()),
        StructField("features", ArrayType(LongType())),
    ]
)


def extract_resize_features(df: DataFrame) -> DataFrame:
    """Resize + feature-extraction plumbing for binary media: decode the
    stub dimensions, downscale to fit RESIZE_BOX (integer math, aspect
    preserved — the thumbnailing step of an image pipeline), and emit a
    fixed-size feature vector (byte-value histogram, {N_FEATURE_BINS}
    bins) as ``array<long>`` — the typed-vector output contract a real
    CLIP/ViT feature extractor would fill. Real pixel work is stubbed
    (no media libs; see _real_decode); the binary-in / vector-out
    mapInPandas shape, batching, and schema are the real thing.
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["data"].map(len).astype("int64")
            w = (n % 640 + 1).astype("int64")
            h = ((n * 7) % 480 + 1).astype("int64")
            m = np.maximum(w, h)
            new_w = np.maximum(1, (w * RESIZE_BOX) // m)
            new_h = np.maximum(1, (h * RESIZE_BOX) // m)
            feats = [
                np.bincount(
                    np.frombuffer(bytes(p), dtype=np.uint8) // 32,
                    minlength=N_FEATURE_BINS,
                ).astype("int64").tolist()
                for p in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "new_w": new_w.astype("int32"),
                    "new_h": new_h.astype("int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)
