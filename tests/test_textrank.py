"""Planted semantics for textrank_keywords: hub tokens must rank
first, rank must be invariant to uniform edge-weight scaling
(normalization by wout), self-loops must be dropped, the exact integer
iteration must replay in plain Python, and Spark/DuckDB parity must
hold on every planted table."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.text import _TR_BASE, _TR_ROUNDS, _TR_SCALE
from tests.oracle import compare


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["textrank_keywords"]
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
    return sdf.collect()


def test_hub_token_ranks_first(spark, tmp_path):
    # star graph: 'hub' is adjacent to six distinct spokes, each spoke
    # only to the hub — centrality concentrates on the hub
    _write_docs(spark, tmp_path, [f"hub x{i}" for i in range(6)])
    rows = _run(spark, tmp_path)
    assert rows[0].token == "hub" and rows[0].pos == 1
    assert rows[0].rank_scaled > rows[1].rank_scaled


def test_rank_invariant_to_uniform_weight(spark, tmp_path):
    # two disconnected pairs, one repeated 10x: flow normalizes by
    # wout, so a heavier but structurally identical component gets the
    # SAME rank — ties break on token
    _write_docs(spark, tmp_path, ["a b"] * 10 + ["c d"])
    rows = _run(spark, tmp_path)
    ranks = {r.token: r.rank_scaled for r in rows}
    assert len(set(ranks.values())) == 1
    assert [r.token for r in rows] == ["a", "b", "c", "d"]


def test_self_loops_are_dropped(spark, tmp_path):
    # 'a a a' alone yields no edges at all; with a tail 'b c' only the
    # (a,b) and (b,c) adjacencies count
    _write_docs(spark, tmp_path, ["a a a b c"])
    rows = _run(spark, tmp_path)
    assert {r.token for r in rows} == {"a", "b", "c"}
    assert {r.token for r in rows if r.pos == 1} == {"b"}  # the bridge


def test_matches_python_reference(spark, tmp_path):
    texts = ["a b c", "b c d", "d a"]
    _write_docs(spark, tmp_path, texts)
    rows = _run(spark, tmp_path)
    # plain-Python replay of the exact integer iteration
    edges: dict[tuple[str, str], int] = {}
    for t in texts:
        ts = t.split(" ")
        for x, y in zip(ts, ts[1:]):
            if x == y:
                continue
            edges[(x, y)] = edges.get((x, y), 0) + 1
            edges[(y, x)] = edges.get((y, x), 0) + 1
    nodes = sorted({s for s, _ in edges})
    wout = {n: sum(w for (s, _), w in edges.items() if s == n) for n in nodes}
    r = {n: _TR_SCALE for n in nodes}
    for _ in range(_TR_ROUNDS):
        nxt = {n: _TR_BASE for n in nodes}
        for (s, d), w in edges.items():
            nxt[d] += (r[s] * 85 * w) // (100 * wout[s])
        r = nxt
    want = sorted(((-v, k) for k, v in r.items()))
    got = [(r_.token, r_.rank_scaled) for r_ in rows]
    assert got == [(k, -v) for v, k in want]
