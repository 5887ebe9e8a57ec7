"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches, to every left row, the most
recent right row with the same key and ``right_ts <= left_ts``
(backward direction, inclusive — the semantics of DuckDB's
``ASOF LEFT JOIN`` and kdb's ``aj``).

Implementation is the union-sort trick, NOT a range join:

  1. union the two inputs with a side tag (right rows sort before left
     rows at equal timestamps, making the match inclusive),
  2. one window over (key, ts, side) carrying the last right ROW
     forward as a single struct (``last(struct, ignorenulls=True)``),
  3. keep only left rows and unpack the struct.

Carrying one struct — not one ``last(col, ignorenulls=True)`` per
column — is a correctness requirement, not a style choice: per-column
carries would back-fill a NULL attribute of the matched right row from
an OLDER right row, silently mixing attributes of different rows.
DuckDB's ASOF LEFT JOIN returns the matched row's NULL as-is; the
struct carry reproduces that exactly (and does one window pass instead
of N).

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

    from pyspark.sql.types import StructField, StructType

    # One struct holds the entire candidate right row; NULL (whole
    # struct) on left rows, so last(ignorenulls=True) lands on the most
    # recent right ROW — never a column-wise mix of rows.
    row_type = StructType(
        [StructField("_asof_ts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    lhs = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in set(on)],
        F.lit(None).cast(row_type).alias("_r"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in set(on)],
        F.struct(
            F.col(right_ts).alias("_asof_ts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("_r"),
    )
    u = lhs.unionByName(rhs)

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("_r", ignorenulls=True).over(w)

    return (
        u.select(
            *on,
            "_side",
            *[c for c in left.columns if c not in set(on)],
            matched.alias("_m"),
        )
        .filter(F.col("_side") == 1)
        .select(
            *on,
            *[c for c in left.columns if c not in set(on)],
            *[F.col(f"_m.{c}").alias(out_names[c]) for c in right_cols],
            F.col("_m._asof_ts").alias(carried_ts),
        )
    )
