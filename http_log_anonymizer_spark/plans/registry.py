"""Registry machinery for the engine's query surface.

Each query is a named pair: a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) the equivalent ANSI SQL the DuckDB
oracle runs over the same parquet tables. Column names and types must
match exactly between the two — the driver sorts columns by name and
hashes values (see __spark_entry__.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    doc: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, bench: bool = False
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, doc=(fn.__doc__ or "").strip(), spark_fn=fn, oracle=oracle, bench=bench
        )
        return fn

    return deco
