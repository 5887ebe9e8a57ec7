"""Registry machinery for the engine's query surface.

Each query is a named pair: a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) the equivalent ANSI SQL the DuckDB
oracle runs over the same parquet tables. Column names and types must
match exactly between the two — the driver sorts columns by name and
hashes values (see __spark_entry__.py docstring).
"""

from __future__ import annotations

import functools
import os
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ScaleGate:
    """Advisory input-size gate for queries that are QUADRATIC by
    declared design (brute-force oracles of record / demo-width
    tiers). These run fine at test scale and die at 100x — the
    textbook scale trap (VERDICT r07) — so the registry refuses to
    launch them above ``max_rows`` input rows and points at the
    registered sub-quadratic twin instead. The row count comes from
    parquet FOOTER metadata only (driver-side, O(#files), no data
    scan). Override with SPARK_GRAFT_ALLOW_QUADRATIC=1 for a
    deliberate large run."""

    table: str  # input table whose row count bounds the work
    max_rows: int  # advisory ceiling (measured-safe territory)
    wide_twin: str  # registered scale-path query to use instead
    # optional extra guidance appended to the error (e.g. "recall
    # audits run on a sampled stratum at scale")
    advice: str | None = None


class ScaleGateError(RuntimeError):
    """Raised when a declared-quadratic query is pointed at an input
    above its advisory ceiling."""


def parquet_num_rows(sf_dir: str, table: str) -> int:
    """Row count of ``<sf_dir>/<table>.parquet`` (file or directory of
    part files) from footer metadata alone — no Spark job, no scan."""
    import pyarrow.parquet as pq

    p = Path(sf_dir) / f"{table}.parquet"
    files = (
        [p]
        if p.is_file()
        else sorted(f for f in p.rglob("*.parquet") if f.is_file())
    )
    return sum(pq.ParquetFile(str(f)).metadata.num_rows for f in files)


def _check_scale_gate(name: str, gate: ScaleGate, sf_dir: str) -> None:
    if os.environ.get("SPARK_GRAFT_ALLOW_QUADRATIC") == "1":
        return
    n = parquet_num_rows(sf_dir, gate.table)
    if n > gate.max_rows:
        extra = f" {gate.advice}" if gate.advice else ""
        raise ScaleGateError(
            f"{name} is quadratic by design (a small-corpus oracle of "
            f"record) and {sf_dir}/{gate.table} has {n:,} rows — above "
            f"its {gate.max_rows:,}-row advisory ceiling. Use the "
            f"registered sub-quadratic twin {gate.wide_twin!r} at this "
            f"scale, or set SPARK_GRAFT_ALLOW_QUADRATIC=1 to force a "
            f"deliberate large run.{extra}"
        )


@dataclass(frozen=True)
class Query:
    name: str
    doc: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    bench: bool = False  # include in bench.py headline set
    scale_gate: ScaleGate | None = None  # advisory ceiling, if quadratic


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    scale_gate: ScaleGate | None = None,
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        run = fn
        if scale_gate is not None:

            @functools.wraps(fn)
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:  # type: ignore[misc]
                _check_scale_gate(name, scale_gate, sf_dir)
                return fn(spark, sf_dir)

        REGISTRY[name] = Query(
            name=name,
            doc=(fn.__doc__ or "").strip(),
            spark_fn=run,
            oracle=oracle,
            bench=bench,
            scale_gate=scale_gate,
        )
        return fn

    return deco
