"""Text-analysis column functions: tokenization, shingling, and a
cross-engine deterministic 60-bit hash.

Everything here is pure Catalyst (JVM, codegen) — no Python UDFs. The
md5-based ``hash64`` is the determinism workhorse for MinHash/SimHash/
LSH: Spark's ``conv(substr(md5(x),1,15),16,10)`` equals DuckDB's
``CAST('0x' || substr(md5(x),1,15) AS BIGINT)`` bit-for-bit (15 hex
chars = 60 bits, always positive), so signatures computed by the engine
can be verified by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_ws(col: Column | str) -> Column:
    """Whitespace tokenization."""
    return F.split(_c(col), " ")


def tokens_re(col: Column | str) -> Column:
    """BPE-ish regex tokenization: alphanumeric runs."""
    return F.split(_c(col), "[^a-z0-9]+")


def hash64(col: Column | str, seed: int | str = 0) -> Column:
    """Deterministic 60-bit hash of ``seed|value`` via md5 (JVM-side).

    Mirrors :func:`hash64_sql` — keep both in lockstep.
    """
    payload = F.concat(F.lit(f"{seed}|"), _c(col))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int | str = 0) -> str:
    """DuckDB SQL rendering of :func:`hash64` over ``expr``."""
    return f"CAST(('0x' || substr(md5('{seed}|' || {expr}), 1, 15)) AS BIGINT)"


def shingles(token_col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles over a *token array* column, computed
    array-natively (no explode/shuffle): ``transform(sequence(1, n-k+1),
    i -> ...)``. Documents shorter than k tokens yield an empty array.

    Callers must materialize the token array in its own projection
    first (``df.select(tokens_ws("text").alias("toks"))``) — embedding
    ``split()`` in the lambda re-evaluates it per element (~4x slower;
    Catalyst does not CSE through LambdaFunction).

    Mirrors :func:`shingles_sql`.
    """
    t = _c(token_col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j) for j in range(k)]
        ),
    )
    return F.when(F.size(t) >= k, make).otherwise(F.array().cast("array<string>"))


def shingles_sql(toks: str, k: int = 3) -> str:
    """DuckDB SQL rendering of :func:`shingles` over a token-list
    expression/column ``toks`` (1-based list indexing matches Spark's
    element_at). Use inside a CTE that materializes the token list."""
    gram = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} "
        f"THEN list_transform(generate_series(1, len({toks}) - {k - 1}), i -> {gram}) "
        f"ELSE [] END"
    )


def count_occurrences(col: Column | str, needle: str) -> Column:
    """Number of (possibly overlapping-free) occurrences of ``needle``,
    via the length-difference trick — identical in any SQL engine."""
    c = _c(col)
    return (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit("")))) / len(needle)


def count_occurrences_sql(expr: str, needle: str) -> str:
    return f"(length({expr}) - length(replace({expr}, '{needle}', ''))) / {len(needle)}"
