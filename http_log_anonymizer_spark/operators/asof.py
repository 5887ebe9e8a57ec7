"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches, to every left row, the most
recent right row with the same key and ``right_ts <= left_ts``
(backward direction, inclusive — the semantics of DuckDB's
``ASOF LEFT JOIN`` and kdb's ``aj``).

Implementation is the union-sort trick, NOT a range join:

  1. union the two inputs with a side tag (right rows sort before left
     rows at equal timestamps, making the match inclusive),
  2. one window over (key, ts, side) carrying the last non-null right
     attributes forward (``last(col, ignorenulls=True)``),
  3. keep only left rows.

Cost: a single shuffle+sort on the key — the same price as any windowed
aggregation, independent of time-range density. A naive
``left.join(right, key AND right_ts <= left_ts)`` + max-filter explodes
quadratically per key; this never does, which is what makes it safe at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward-inclusive as-of join.

    Args:
        on: equi-join key columns (present in both inputs).
        left_ts / right_ts: event-time columns.
        right_cols: right attributes to carry (default: all non-key,
            non-ts columns). Carried columns keep their names unless
            they collide with a left column, then ``suffix`` applies.
        suffix: collision suffix; the right timestamp is always emitted
            as ``right_ts + suffix`` so callers can compute the gap.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    carried_ts = right_ts + suffix if right_ts in left.columns or right_ts == left_ts else right_ts
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    lhs = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in set(on)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in set(on)],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    u = lhs.unionByName(rhs)

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(out_names[c]) for c in right_cols
    ] + [F.last("_r_ts", ignorenulls=True).over(w).alias(carried_ts)]

    return (
        u.select(
            *on,
            "_side",
            *[c for c in left.columns if c not in set(on)],
            *carried,
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
