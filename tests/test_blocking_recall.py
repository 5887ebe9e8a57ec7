"""Planted semantics for linkage_blocking_recall_report: recalls and
candidate volumes must replay exactly in plain Python over a planted
customer set, the block50 pass must stay at recall 1.0 and a constant
candidates/record, the union must dominate its members, and
Spark/DuckDB parity must hold on every planted table."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.linkage import (
    _RL_BAL_BUCKET,
    _RL_BAL_SHIFT,
    _RL_BLOCK,
)
from tests.test_linkage import _cust, _write_customers
from tests.oracle import compare


def _run(spark, tmp_path):
    q = REGISTRY["linkage_blocking_recall_report"]
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
    return {r.strategy: r for r in sdf.collect()}


def _python_rows(keys):
    """Exact replay of recall + candidate volume per strategy."""
    rows = [_cust(k) for k in keys]

    def b_side(r):
        k, name, _, bal, seg = r
        name_b = name[:-1] + "X" if k % 5 == 0 else name
        cents_b = round(bal * 100) + (237 if k % 4 == 0 else 0)
        return name_b, cents_b

    def bucket(cents):
        return (cents + _RL_BAL_SHIFT) // _RL_BAL_BUCKET

    out = {}
    strat = {
        "block50": (
            lambda r: r[0] // _RL_BLOCK,
            lambda r: r[0] // _RL_BLOCK,
        ),
        "name_exact": (lambda r: r[1], lambda r: b_side(r)[0]),
        "bal_bucket": (
            lambda r: bucket(round(r[3] * 100)),
            lambda r: bucket(b_side(r)[1]),
        ),
    }
    for name, (ka, kb) in strat.items():
        caught = sum(1 for r in rows if ka(r) == kb(r))
        ca, cb = {}, {}
        for r in rows:
            ca[ka(r)] = ca.get(ka(r), 0) + 1
            cb[kb(r)] = cb.get(kb(r), 0) + 1
        cand = sum(n * cb.get(k, 0) for k, n in ca.items())
        out[name] = (caught, cand)
    out["name_or_bal_union"] = (
        sum(
            1
            for r in rows
            if strat["name_exact"][0](r) == strat["name_exact"][1](r)
            or strat["bal_bucket"][0](r) == strat["bal_bucket"][1](r)
        ),
        None,
    )
    return len(rows), out


def test_matches_python_reference(spark, tmp_path):
    keys = list(range(100))
    _write_customers(spark, tmp_path, keys)
    got = _run(spark, tmp_path)
    n, want = _python_rows(keys)
    for name, (caught, cand) in want.items():
        r = got[name]
        assert (r.n_true_pairs, r.n_caught) == (n, caught), name
        assert r.recall == round(caught / n, 6), name
        if cand is None:
            assert r.n_candidates is None
        else:
            assert r.n_candidates == cand, name
            assert r.candidates_per_record == round(cand / n, 2), name


def test_block50_is_lossless_at_constant_volume(spark, tmp_path):
    keys = list(range(100))
    _write_customers(spark, tmp_path, keys)
    got = _run(spark, tmp_path)
    assert got["block50"].recall == 1.0
    assert got["block50"].candidates_per_record == float(_RL_BLOCK)
    # name loses exactly the corrupted fifth
    assert got["name_exact"].recall == 0.8
    # the union dominates both realistic members
    assert got["name_or_bal_union"].recall >= got["name_exact"].recall
    assert got["name_or_bal_union"].recall >= got["bal_bucket"].recall


def test_empty_table_reports_nulls_not_errors(spark, tmp_path):
    _write_customers(spark, tmp_path, [])
    got = _run(spark, tmp_path)
    assert set(got) == {
        "block50",
        "name_exact",
        "bal_bucket",
        "name_or_bal_union",
    }
    for r in got.values():
        assert r.n_true_pairs == 0 and r.recall is None
