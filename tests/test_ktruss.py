"""k-truss peeling: a planted clique must survive every round, a
triangle-free cycle must die in round 1, and survivor counts must be
monotone; truss membership must imply core membership (every 4-truss
lies inside a 3-core)."""

from __future__ import annotations

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


def test_clique_survives_cycle_dies(spark, tmp_path):
    # 5-clique (each edge in 3 triangles) + disjoint 6-cycle (none);
    # every pair twice for support >= 2
    baskets = []
    clique = [100, 101, 102, 103, 104]
    for i, a in enumerate(clique):
        for b in clique[i + 1 :]:
            baskets += [[a, b], [a, b]]
    cyc = [200, 201, 202, 203, 204, 205]
    for i, a in enumerate(cyc):
        b = cyc[(i + 1) % len(cyc)]
        baskets += [[a, b], [a, b]]
    sf = _write_lineitem(spark, tmp_path, baskets)
    rows = {r.round: r for r in REGISTRY["ktruss_peeling_report"].spark_fn(spark, sf).collect()}
    assert rows[0].n_edges == 10 + 6 and rows[0].n_nodes == 11
    # round 1 on: only the clique remains, and it is a fixpoint
    for t in (1, 2, 3):
        assert rows[t].n_edges == 10 and rows[t].n_nodes == 5, t


def test_survivors_monotone_on_corpus(spark):
    rows = sorted(
        REGISTRY["ktruss_peeling_report"].spark_fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.round,
    )
    assert rows[0].round == 0 and len(rows) == 4
    for a, b in zip(rows, rows[1:]):
        assert b.n_edges <= a.n_edges
        assert b.n_nodes <= a.n_nodes
