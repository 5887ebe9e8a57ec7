"""Pareto frontier (skyline): the non-domination property must hold
against a brute-force check, and dominated rows must be absent —
independent of the DuckDB oracle parity that test_registry_oracle
already enforces."""

from __future__ import annotations

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def frontier(spark):
    return REGISTRY["pareto_frontier_parts"].spark_fn(spark, SF_SMOKE).collect()


@pytest.fixture(scope="module")
def parts(spark):
    from http_log_anonymizer_spark.sources.batch import load_table

    rows = load_table(spark, SF_SMOKE, "part").collect()
    return [
        (r.p_partkey, r.p_brand, r.p_size, int(round(r.p_retailprice * 100)))
        for r in rows
    ]


def _dominates(a, b):
    """a dominates b: same brand, >= size, <= price, strictly better once."""
    return (
        a[1] == b[1]
        and a[2] >= b[2]
        and a[3] <= b[3]
        and (a[2] > b[2] or a[3] < b[3])
    )


def test_frontier_rows_are_not_dominated(frontier, parts):
    fr = [(r.p_partkey, r.p_brand, r.p_size, r.price_cents) for r in frontier]
    assert fr, "frontier empty at sf0.001"
    for f in fr:
        dom = [p for p in parts if _dominates(p, f)]
        assert not dom, f"frontier row {f} dominated by {dom[:3]}"


def test_every_non_dominated_part_is_on_the_frontier(frontier, parts):
    fr = {(r.p_brand, r.p_size, r.price_cents, r.p_partkey) for r in frontier}
    for p in parts:
        if not any(_dominates(q, p) for q in parts):
            assert (p[1], p[2], p[3], p[0]) in fr, f"missing skyline row {p}"


def test_frontier_price_strictly_decreasing_in_size_per_brand(frontier):
    by_brand: dict[str, list] = {}
    for r in frontier:
        by_brand.setdefault(r.p_brand, []).append((r.p_size, r.price_cents))
    for brand, rows in by_brand.items():
        rows.sort()
        # among distinct sizes, larger size must cost strictly more
        for (s1, c1), (s2, c2) in zip(rows, rows[1:]):
            if s2 > s1:
                assert c2 > c1, f"{brand}: size {s2} not pricier than {s1}"
