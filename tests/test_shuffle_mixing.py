"""Planted semantics for shuffle_mixing_report: source labels are
assigned ADVERSARIALLY relative to the known shuffle-key order (the
same md5 hash64 rule as the samplers, replayed in Python), so the
report must flag clustered orders (ratio >> 1), flag anti-random
orders (ratio ~ 0), reproduce a brute-force Python reference exactly,
and hold Spark/DuckDB parity on every planted table."""

from __future__ import annotations

import hashlib

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY

from tests.oracle import compare

_N_SHARDS = 16


def _skey(doc_id: int) -> int:
    return int(hashlib.md5(f"shuf|{doc_id}".encode()).hexdigest()[:15], 16)


def _shard_orders(ids):
    """doc ids per shard, in the shard's read (skey, doc_id) order."""
    by = {}
    for i in ids:
        by.setdefault(_skey(i) % _N_SHARDS, []).append(i)
    return {
        s: [i for _, i in sorted((_skey(i), i) for i in v)]
        for s, v in by.items()
    }


def _write_docs(spark, tmp_path, src_of, ids):
    spark.createDataFrame(
        [(i, "text", "en", src_of(i), 4) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["shuffle_mixing_report"]
    sdf = q.spark_fn(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        ok, msg = compare(sdf, con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return {r.shard: r for r in sdf.collect()}


def test_clustered_order_flags_high_ratio(spark, tmp_path):
    # Within each shard's read order, the first half is source 'a' and
    # the second half 'b' — two long runs, so nearly every adjacent
    # pair agrees while a random permutation would agree about half the
    # time: pooled ratio ~ 2.
    ids = list(range(200))
    orders = _shard_orders(ids)
    label = {}
    for order in orders.values():
        for pos, i in enumerate(order):
            label[i] = "a" if pos < len(order) // 2 else "b"
    _write_docs(spark, tmp_path, label.__getitem__, ids)
    got = _run(spark, tmp_path)
    assert got[-1].mixing_ratio > 1.5
    assert got[-1].same_src_pairs > got[-1].expected_same


def test_alternating_order_flags_anti_random(spark, tmp_path):
    # Sources strictly alternate along every shard's read order:
    # observed adjacency is exactly zero — "too well mixed to be a
    # random shuffle" (round-robin leakage).
    ids = list(range(200))
    orders = _shard_orders(ids)
    label = {}
    for order in orders.values():
        for pos, i in enumerate(order):
            label[i] = "a" if pos % 2 == 0 else "b"
    _write_docs(spark, tmp_path, label.__getitem__, ids)
    got = _run(spark, tmp_path)
    assert got[-1].same_src_pairs == 0
    assert got[-1].mixing_ratio == 0.0


def test_matches_brute_force_reference(spark, tmp_path):
    ids = [0, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144]
    src = lambda i: f"s{i % 3}"
    _write_docs(spark, tmp_path, src, ids)
    got = _run(spark, tmp_path)
    # Python reference: per shard, observed adjacency and the exact
    # expectation sum_s c_s(c_s-1) // n on the 1e-6 grid.
    obs_tot = exp_tot = pairs_tot = 0
    for shard, order in _shard_orders(ids).items():
        obs = sum(
            1 for x, y in zip(order, order[1:]) if src(x) == src(y)
        )
        counts = {}
        for i in order:
            counts[src(i)] = counts.get(src(i), 0) + 1
        exp_micro = (
            sum(c * (c - 1) for c in counts.values()) * 1_000_000
        ) // len(order)
        r = got[shard]
        assert r.same_src_pairs == obs
        assert r.expected_same == round(exp_micro / 1e6, 6)
        obs_tot += obs
        exp_tot += exp_micro
        pairs_tot += len(order) - 1
    assert got[-1].same_src_pairs == obs_tot
    assert got[-1].n_pairs == pairs_tot
    assert got[-1].expected_same == round(exp_tot / 1e6, 6)


def test_degenerate_shards_report_null_ratio(spark, tmp_path):
    # One document: its shard has no adjacent pairs and zero expected
    # agreement — the ratio is NULL, not a division error.
    _write_docs(spark, tmp_path, lambda i: "only", [7])
    got = _run(spark, tmp_path)
    shard = _skey(7) % _N_SHARDS
    assert got[shard].n_pairs == 0
    assert got[shard].mixing_ratio is None
    assert got[-1].mixing_ratio is None
