"""Hilbert-curve encoding — the locality-optimal alternative to Z-order
(operators/zorder.py) for multi-dimensional data layout.

Morton codes are a pure Catalyst expression but take long diagonal
jumps between quadrants: a contiguous code range can cover two distant
rectangles. The Hilbert curve visits every cell of the 2^k x 2^k grid
in unit steps (consecutive codes are always Manhattan-adjacent — the
defining property, asserted in tests), so range-partitioning on it
yields tighter per-file bounding boxes on both dimensions.

The per-bit rotate/reflect state makes Hilbert inherently iterative —
not reasonably expressible in Catalyst or SQL — so the encoder is a
vectorized numpy kernel over Arrow batches (mapInPandas): ~30 integer
ops per row, no Python-level loops over rows, constant memory per
batch. Layout queries over it are therefore rows-only registry entries;
correctness is pinned by bijectivity + adjacency + locality tests
instead of a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

_ORDER = 16  # 16 bits per dimension -> codes in [0, 2^32)


def hilbert_d(x: np.ndarray, y: np.ndarray, order: int = _ORDER) -> np.ndarray:
    """Vectorized (x, y) -> Hilbert distance for a 2^order grid
    (standard rotate/reflect walk, applied to whole arrays per bit)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate/reflect the sub-square so the next bit is in canonical frame
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x_f[flip] = s - 1 - x[flip]
        y_f[flip] = s - 1 - y[flip]
        x[swap], y[swap] = y_f[swap], x_f[swap]
        s >>= 1
    return d


def with_hilbert_code(
    df: DataFrame, x: str, y: str, out: str = "hcode", order: int = _ORDER
) -> DataFrame:
    """Append a Hilbert code column computed from two integer columns
    (low `order` bits of each). Arrow-batched; preserves all columns."""
    fields = df.schema.fields + [StructField(out, LongType())]
    schema = StructType(fields)
    mask = (1 << order) - 1

    def encode(batches):
        for pdf in batches:
            xs = pdf[x].to_numpy(dtype=np.int64) & mask
            ys = pdf[y].to_numpy(dtype=np.int64) & mask
            res = pdf.copy()
            res[out] = hilbert_d(xs, ys, order)
            yield res

    return df.mapInPandas(encode, schema)
