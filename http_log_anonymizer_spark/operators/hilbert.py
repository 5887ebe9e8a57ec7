"""Hilbert-curve encoding — the locality-optimal alternative to Z-order
(operators/zorder.py) for multi-dimensional data layout.

Morton codes are a pure Catalyst expression but take long diagonal
jumps between quadrants: a contiguous code range can cover two distant
rectangles. The Hilbert curve visits every cell of the 2^k x 2^k grid
in unit steps (consecutive codes are always Manhattan-adjacent — the
defining property, asserted in tests), so range-partitioning on it
yields tighter per-file bounding boxes on both dimensions.

The per-bit rotate/reflect state makes Hilbert inherently iterative,
so the encoder is a vectorized numpy kernel over Arrow batches
(mapInPandas): ~30 integer ops per row, no Python-level loops over
rows, constant memory per batch. The walk is pure integer arithmetic,
though, so it IS oracle-checkable: :func:`hilbert_sql` unrolls the 16
per-bit steps into a chain of MATERIALIZED DuckDB CTEs (materialized
to stop CTE inlining from exponentiating the expression tree) that
reproduces the kernel bit-for-bit — layout queries over it carry full
hash oracles (VERDICT r02). Bijectivity + adjacency + locality are
additionally pinned by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

_ORDER = 16  # 16 bits per dimension -> codes in [0, 2^32)


def hilbert_d(x: np.ndarray, y: np.ndarray, order: int = _ORDER) -> np.ndarray:
    """Vectorized (x, y) -> Hilbert distance for a 2^order grid
    (standard rotate/reflect walk, applied to whole arrays per bit).
    Inputs are masked to the low ``order`` bits — the same domain clamp
    hilbert_sql applies — so out-of-range coordinates (e.g.
    replica-shifted sf1 keys) agree between kernel and oracle instead
    of diverging in the s-1-x reflection (ADVICE r03)."""
    mask = (np.int64(1) << order) - 1
    x = x.astype(np.int64) & mask
    y = y.astype(np.int64) & mask
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


def hilbert_sql(
    source_sql: str,
    x: str,
    y: str,
    carry: list[str],
    out: str = "hcode",
    order: int = _ORDER,
) -> str:
    """DuckDB CTE chunk computing the same Hilbert walk as
    :func:`hilbert_d`, unrolled over ``order`` bits. ``source_sql`` is
    the FROM-able source; ``carry`` columns pass through. Exposes a
    final CTE ``hil{order}`` with (carry..., {out}). Every step is a
    MATERIALIZED CTE: referenced-once CTEs would otherwise inline, and
    16 nested rotate/reflect substitutions exponentiate the expression
    tree."""
    cols = ", ".join(carry)
    mask = (1 << order) - 1
    parts = [
        f"""hil0 AS MATERIALIZED (
  SELECT {cols},
         CAST({x} AS BIGINT) & {mask} AS hx,
         CAST({y} AS BIGINT) & {mask} AS hy,
         CAST(0 AS BIGINT) AS hd
  FROM {source_sql}
)"""
    ]
    step = 0
    s = 1 << (order - 1)
    while s > 0:
        step += 1
        parts.append(
            f"""hil{step} AS MATERIALIZED (
  SELECT {cols},
         CASE WHEN ry = 0
              THEN (CASE WHEN rx = 1 THEN {s - 1} - hy ELSE hy END)
              ELSE hx END AS hx,
         CASE WHEN ry = 0
              THEN (CASE WHEN rx = 1 THEN {s - 1} - hx ELSE hx END)
              ELSE hy END AS hy,
         hd + {s * s} * xor(3 * rx, ry) AS hd
  FROM (
    SELECT *,
           CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
           CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
    FROM hil{step - 1}
  )
)"""
        )
        s >>= 1
    parts.append(f"hilbert AS (SELECT {cols}, hd AS {out} FROM hil{step})")
    return ",\n".join(parts)


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
