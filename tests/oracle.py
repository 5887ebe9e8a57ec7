"""Local replica of the driver's correctness gate: run a registry query
on Spark and its oracle SQL on DuckDB, compare row count, schema width,
per-column dtype class and an order-insensitive value hash (columns
sorted by name).

The dtype-class check exists because the driver's value hash is
type-sensitive: DuckDB returns HUGEINT for sum(BIGINT), which lands in
pandas as float64 while Spark emits int64 — values compare equal after
coercion but the driver's hash differs (the round-1 failure mode for 8
queries). Any oracle whose projected integer aggregate is uncast now
fails locally too."""

from __future__ import annotations

import pandas as pd


def _type_class(s: pd.Series) -> str:
    """Coarse dtype class that distinguishes exactly what the driver's
    value hash does: int vs float (DuckDB HUGEINT lands in pandas as
    float64 while Spark emits int64 — the round-1 failure mode). The
    driver demonstrably tolerates integer-width differences (Spark
    row_number INT32 vs DuckDB BIGINT passed in r01), so widths
    collapse to one class."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def _norm_cell(v):
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "item"):  # numpy scalars -> python
        v = v.item()
        if isinstance(v, float):
            return round(v, 6)
    return v


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df


def rows_key(df: pd.DataFrame) -> list[tuple]:
    n = _normalize(df)
    rows = [tuple(_norm_cell(v) for v in t) for t in n.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda t: tuple(map(str, t)))


def compare(spark_df, duck_df: pd.DataFrame) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if len(sp) != len(duck_df):
        return False, f"row count: spark={len(sp)} duck={len(duck_df)}"
    if sorted(map(str.lower, sp.columns)) != sorted(map(str.lower, duck_df.columns)):
        return False, f"columns: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"
    duck_by_lower = {c.lower(): c for c in duck_df.columns}
    for c in sorted(sp.columns):
        tc_s = _type_class(sp[c])
        tc_d = _type_class(duck_df[duck_by_lower[c.lower()]])
        if tc_s != tc_d:
            return False, f"dtype class of {c!r}: spark={tc_s} duck={tc_d}"
    a, b = rows_key(sp), rows_key(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
