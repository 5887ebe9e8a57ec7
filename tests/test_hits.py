"""Planted semantics for hits_copurchase: a universally-bought part
must top the authorities, the heaviest buyer of authoritative parts
must top the hubs, the exact integer iteration must replay in plain
Python, and Spark/DuckDB parity must hold on every planted table."""

from __future__ import annotations

from datetime import date

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.analytics import (
    _HITS_ROUNDS,
    _HITS_SCALE,
)
from tests.oracle import compare


def _write_graph(spark, tmp_path, purchases):
    """purchases: list of (customer, part) edges; one order per
    customer holding all their lineitems."""
    custs = sorted({c for c, _ in purchases})
    orders = [
        (c, c, "O", 1.0, date(1995, 1, 1), "1-URGENT") for c in custs
    ]
    lines = [
        (c, p, 0, i, 1.0, 1.0, 0.0, 0.0, "N", "O", date(1995, 1, 2))
        for i, (c, p) in enumerate(purchases)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["hits_copurchase"]
    sdf = q.spark_fn(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{tmp_path}/{t}.parquet/*.parquet'"
            )
        ok, msg = compare(sdf, con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return sdf.collect()


def test_universal_part_tops_authorities(spark, tmp_path):
    # part 100 is in every basket; customer 1 also buys two niche
    # parts, making it the strongest hub
    purchases = [(1, 100), (2, 100), (3, 100), (1, 200), (1, 300)]
    _write_graph(spark, tmp_path, purchases)
    rows = _run(spark, tmp_path)
    auth = [r for r in rows if r.kind == "authority"]
    hub = [r for r in rows if r.kind == "hub"]
    assert auth[0].node == 100 and auth[0].score_scaled == _HITS_SCALE
    assert hub[0].node == 1 and hub[0].score_scaled == _HITS_SCALE


def test_matches_python_reference(spark, tmp_path):
    purchases = [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12), (4, 13)]
    _write_graph(spark, tmp_path, purchases)
    rows = _run(spark, tmp_path)
    # plain-Python replay of the exact max-normalized integer HITS
    edges = {(c, p): 1 for c, p in purchases}
    custs = sorted({c for c, _ in edges})
    parts = sorted({p for _, p in edges})
    hub = {c: _HITS_SCALE for c in custs}
    for _ in range(_HITS_ROUNDS):
        araw = {
            p: sum(w * hub[c] for (c2, p2), w in edges.items()
                   if p2 == p for c in [c2])
            for p in parts
        }
        mx = max(max(araw.values()), 1)
        auth = {p: (v * _HITS_SCALE) // mx for p, v in araw.items()}
        hraw = {
            c: sum(w * auth[p] for (c2, p), w in edges.items() if c2 == c)
            for c in custs
        }
        mx = max(max(hraw.values()), 1)
        hub = {c: (v * _HITS_SCALE) // mx for c, v in hraw.items()}
    got_auth = {r.node: r.score_scaled for r in rows if r.kind == "authority"}
    got_hub = {r.node: r.score_scaled for r in rows if r.kind == "hub"}
    assert got_auth == auth
    assert got_hub == hub


def test_empty_graph_yields_empty_output(spark, tmp_path):
    _write_graph(spark, tmp_path, [])
    q = REGISTRY["hits_copurchase"]
    sdf = q.spark_fn(spark, str(tmp_path))
    assert sdf.count() == 0
    assert sdf.columns == ["kind", "node", "score_scaled", "pos"]
