"""Degree assortativity: the coefficient must match a brute-force
Pearson correlation over edge-endpoint degrees, a planted star must be
strongly disassortative, and a degree-regular graph's denominator-zero
case must be visible rather than crashing."""

from __future__ import annotations

import math

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _write_lineitem(spark, tmpdir, baskets):
    rows = []
    for ok, parts in enumerate(baskets, start=1):
        for ln, p in enumerate(parts, start=1):
            rows.append((ok, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate date",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/lineitem.parquet")
    return str(tmpdir)


def _pearson_over_edges(edges, deg):
    """Newman's r as the Pearson correlation of the degree pairs with
    each undirected edge counted in BOTH orientations (the standard
    formulation the closed form reduces to)."""
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    mx = sum(xs) / n
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs) / n)
    cov = sum((x - mx) * (y - mx) for x, y in zip(xs, ys)) / n
    return cov / (sx * sx)


def test_matches_bruteforce_pearson(spark):
    from collections import defaultdict

    from http_log_anonymizer_spark.sources.batch import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order = defaultdict(list)
    for r in li:
        by_order[r.l_orderkey].append(r.l_partkey)
    support = defaultdict(int)
    for parts in by_order.values():
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                if a != b:
                    support[(min(a, b), max(a, b))] += 1
    edges = [e for e, s in support.items() if s >= 2]
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    row = REGISTRY["graph_assortativity_report"].spark_fn(spark, SF_SMOKE).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(deg)
    want = _pearson_over_edges(edges, deg)
    assert abs(row.assortativity - round(want, 6)) <= 2e-6


def test_planted_star_is_disassortative(spark, tmp_path):
    # a hub co-purchased with 6 leaves (twice each for support >= 2):
    # every edge joins degree 6 to degree 1 -> r = -1
    baskets = []
    for leaf in range(101, 107):
        baskets += [[100, leaf], [100, leaf]]
    sf = _write_lineitem(spark, tmp_path, baskets)
    row = REGISTRY["graph_assortativity_report"].spark_fn(spark, sf).collect()[0]
    assert row.n_edges == 6 and row.n_nodes == 7
    assert abs(row.assortativity - (-1.0)) < 1e-9


def test_regular_graph_degenerates_to_nan(spark, tmp_path):
    # a 4-cycle is 2-regular: zero degree variance, denominator 0 —
    # the report must surface NULL/NaN, not crash (documented edge)
    baskets = []
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 1)]:
        baskets += [[a, b], [a, b]]
    sf = _write_lineitem(spark, tmp_path, baskets)
    row = REGISTRY["graph_assortativity_report"].spark_fn(spark, sf).collect()[0]
    assert row.n_edges == 4
    assert row.assortativity is None or math.isnan(row.assortativity)
