"""Local replica of the driver's correctness gate: run a registry query
on Spark and its oracle SQL on DuckDB, compare row count, schema width
and an order-insensitive value hash (columns sorted by name)."""

from __future__ import annotations

import pandas as pd


def _norm_cell(v):
    if isinstance(v, (list, tuple)):
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
    a, b = rows_key(sp), rows_key(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
