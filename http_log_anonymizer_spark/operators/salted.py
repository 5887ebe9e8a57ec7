"""Salted join — the skew-mitigation operator for joins whose key
distribution AQE can't fix (e.g. a single hot key holding >50% of a
100 TB fact table, where even AQE's skew-join split leaves one
straggler partition per subsplit).

Mechanics: the skewed (large) side gets a deterministic salt in
[0, n); the small side is replicated n ways with every salt value; the
join key becomes (key, salt). Each hot key now spreads over n tasks.

Cost model: n-fold replication of the small side vs. eliminating the
straggler — use for moderate n (4-32) and a genuinely small right side.
AQE's skew handling (on by default in session.py) should be tried
first; this operator is for the cases it can't split, and for
deterministic plans in benchmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (salted) with ``small`` (replicated n_salts ways).

    The salt is a deterministic hash of the full skewed row (xxhash64),
    so replays produce identical partitioning. Result equals
    ``skewed.join(small, on, how)`` exactly.
    """
    if _SALT in skewed.columns or _SALT in small.columns:
        raise ValueError(f"reserved column name {_SALT} already present")
    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return salted.join(replicated, on + [_SALT], how).drop(_SALT)
