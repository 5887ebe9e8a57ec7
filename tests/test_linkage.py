"""Planted semantics for record_linkage_em: the EM fit must separate
the match class on corpora where the right answer is known by
construction, the blocked pair universe must classify exactly the
planted diagonal, single-feature corruption must still link through
the surviving features, double corruption must honestly fall below the
posterior threshold, and Spark/DuckDB parity must hold on every
planted table (the EM arithmetic is one shared SQL text)."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _cust(k: int) -> tuple:
    """One deterministic customer row; balances are spread >$2 apart
    so non-match pairs never agree on g_bal by accident."""
    return (
        k,
        f"Customer#{k:09d}",
        k % 25,
        round(10.0 * k + (k % 7) * 0.11, 2),
        _SEGS[k % 5],
    )


def _write_customers(spark, tmp_path, keys):
    spark.createDataFrame(
        [_cust(k) for k in keys],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["record_linkage_em"]
    sdf = q.spark_fn(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM "
            f"'{tmp_path}/customer.parquet/*.parquet'"
        )
        ok, msg = compare(sdf, con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return {(r.custkey_a, r.custkey_b): r for r in sdf.collect()}


def test_clean_block_links_exactly_the_diagonal(spark, tmp_path):
    # Keys avoid every perturbation residue (k % 3, % 4, % 5 all
    # nonzero), so side B re-observes each record unchanged: every
    # true pair agrees on all three features and every non-match pair
    # disagrees on all three. The fit must classify exactly the
    # diagonal, with near-certain posteriors and near-1 m parameters.
    keys = [1, 2, 7, 11, 13, 17, 19, 23, 29, 31]
    _write_customers(spark, tmp_path, keys)
    got = _run(spark, tmp_path)
    assert sorted(got) == [(k, k) for k in keys]
    for r in got.values():
        assert (r.g_name, r.g_bal, r.g_seg) == (1, 1, 1)
        assert r.w9 > 900_000_000
    any_row = next(iter(got.values()))
    assert any_row.m_name9 > 950_000_000
    assert any_row.u_name9 < 50_000_000


def test_single_corrupted_feature_still_links(spark, tmp_path):
    # Two full blocks (all residues present). k=5: corrupted name,
    # links through balance+segment. k=3: re-labelled segment, links
    # through name+balance. k=4: shifted balance, links through
    # name+segment.
    keys = list(range(100))
    _write_customers(spark, tmp_path, keys)
    got = _run(spark, tmp_path)
    for k, gamma in [(5, (0, 1, 1)), (3, (1, 1, 0)), (4, (1, 0, 1))]:
        r = got[(k, k)]
        assert (r.g_name, r.g_bal, r.g_seg) == gamma, k
        assert r.w9 >= 500_000_000, k


def test_double_corruption_is_an_honest_false_negative(spark, tmp_path):
    # k = 0 mod 20 corrupts BOTH name and balance; only the (weak,
    # u_seg ~ 0.2) segment feature survives, so the posterior falls
    # below 0.5 — the documented Fellegi–Sunter behavior, not a bug.
    keys = list(range(100))
    _write_customers(spark, tmp_path, keys)
    got = _run(spark, tmp_path)
    assert (20, 20) not in got
    assert (40, 40) not in got
    # ...while every pair with at most one corrupted feature links.
    missing = [k for k in keys if k % 20 and k % 60 and (k, k) not in got]
    assert missing == [
        k for k in keys if k % 20 and (k % 12 == 0 or k % 15 == 0)
    ], missing


def test_null_attributes_are_handled_and_parity_holds(spark, tmp_path):
    rows = [_cust(k) for k in [1, 2, 7]]
    rows.append((11, None, 3, None, None))  # all comparison fields NULL
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = _run(spark, tmp_path)
    # NULL name/seg compare null-safe-equal on the diagonal (both
    # sides NULL); NULL balance disagrees. One corrupted-ish feature
    # still links.
    r = got[(11, 11)]
    assert (r.g_name, r.g_bal, r.g_seg) == (1, 0, 1)


def test_empty_input_yields_empty_output(spark, tmp_path):
    _write_customers(spark, tmp_path, [])
    q = REGISTRY["record_linkage_em"]
    sdf = q.spark_fn(spark, str(tmp_path))
    assert sdf.count() == 0
    assert len(sdf.columns) == 13
