"""Z-order (Morton) interleaving — multi-dimensional data layout for
scan locality.

At 100 TB, file skipping is the cheapest optimization there is: parquet
row-group min/max stats prune reads, but sorting by one column destroys
locality in every other. Interleaving the bits of two key columns into
one Morton code and range-partitioning on it gives every file a tight
min/max range on BOTH dimensions simultaneously — the same layout
Delta's OPTIMIZE ZORDER BY produces. This module provides the code as a
pure-Catalyst integer expression (exact, engine-reproducible) plus its
SQL rendering for the oracle.

Usage at write time::

    df.repartitionByRange(n, morton32("k1", "k2")).write.parquet(...)

Each output file then covers a contiguous z-range = a small rectangle
in (k1, k2) space, so predicates on EITHER column skip most files.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

_BITS = 16  # 16 bits per dimension -> 32-bit Morton code


def morton32(x: Column | str, y: Column | str) -> Column:
    """Interleave the low 16 bits of two integer columns into a 32-bit
    Morton code (x in even bit positions, y in odd). Pure integer
    arithmetic — bit-identical in any engine."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    terms = []
    for j in range(_BITS):
        terms.append(F.shiftleft(F.shiftright(xc, j).bitwiseAND(F.lit(1)), 2 * j))
        terms.append(F.shiftleft(F.shiftright(yc, j).bitwiseAND(F.lit(1)), 2 * j + 1))
    return reduce(lambda a, b: a + b, terms)


def morton32_sql(x: str, y: str) -> str:
    """DuckDB SQL mirror of :func:`morton32`."""
    terms = []
    for j in range(_BITS):
        terms.append(f"((({x} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({y} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"
