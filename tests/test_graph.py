"""Graph analytics (pagerank_copurchase, triangle_counts): the
fixed-point PageRank fold and the degree-ordered triangle join must
match plain-Python references on a hand-built order/part table — the
oracle gate re-checks both against DuckDB at sf0.01; here the failure
surface is readable."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _orders(spark, baskets: list[list[int]]):
    rows = [(oid, p) for oid, parts in enumerate(baskets) for p in parts]
    return spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")


def _write_sf(spark, tmp_path, baskets) -> str:
    d = tmp_path / "sf"
    _orders(spark, baskets).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def _reference_pagerank(baskets, rounds=5, scale=10**9):
    edges: dict[tuple[int, int], int] = {}
    for parts in baskets:
        for a in parts:
            for b in parts:
                if a != b:
                    edges[(a, b)] = edges.get((a, b), 0) + 1
    nodes = sorted({p for parts in baskets for p in parts})
    wout: dict[int, int] = {}
    for (a, _b), w in edges.items():
        wout[a] = wout.get(a, 0) + w
    base = int(0.15 * scale)
    r = {n: scale for n in nodes}
    for _ in range(rounds):
        nxt = {n: base for n in nodes}
        for (a, b), w in edges.items():
            nxt[b] += (r[a] * 85 * w) // (100 * wout[a])
        r = nxt
    return r


def test_pagerank_matches_python_reference(spark, tmp_path):
    from http_log_anonymizer_spark.plans import REGISTRY

    baskets = [[1, 2, 3], [1, 2], [2, 3, 4], [4, 5], [1, 5, 6], [6], [2, 4]]
    sf = _write_sf(spark, tmp_path, baskets)
    got = {
        r.node: r.rank_scaled
        for r in REGISTRY["pagerank_copurchase"].spark_fn(spark, sf).collect()
    }
    ref = _reference_pagerank(baskets)
    top = dict(sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:25])
    assert got == top


def _reference_triangles(baskets, minsup=2):
    # pair weight = ordered co-occurrences / 2, like the query
    pair_w: dict[tuple[int, int], int] = {}
    for parts in baskets:
        for a in parts:
            for b in parts:
                if a < b:
                    pair_w[(a, b)] = pair_w.get((a, b), 0) + 1
    edges = {e for e, w in pair_w.items() if w >= minsup}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (t, len(adj[n])) for n, t in tri.items() if t > 0}


def test_triangles_match_python_reference(spark, tmp_path):
    from http_log_anonymizer_spark.plans import REGISTRY

    # repeated baskets so edges clear the support-2 threshold
    baskets = [
        [1, 2, 3],
        [1, 2, 3],
        [2, 3, 4],
        [2, 3, 4],
        [1, 3, 4],
        [1, 3, 4],
        [1, 2, 4, 5],
        [1, 2, 4, 5],
        [5, 6],
    ]
    sf = _write_sf(spark, tmp_path, baskets)
    got = {
        r.node: (r.n_triangles, r.degree)
        for r in REGISTRY["triangle_counts"].spark_fn(spark, sf).collect()
    }
    ref = _reference_triangles(baskets)
    top = dict(
        sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    )
    assert got == top


def test_pagerank_mass_is_conserved_up_to_truncation(spark, tmp_path):
    """Total rank never exceeds initial mass (integer div only leaks
    downward) and every node retains at least the base rank."""
    from http_log_anonymizer_spark.plans import REGISTRY
    from http_log_anonymizer_spark.plans.analytics import _PR_SCALE

    baskets = [[1, 2], [2, 3], [3, 1], [1, 2, 3]]
    sf = _write_sf(spark, tmp_path, baskets)
    rows = REGISTRY["pagerank_copurchase"].spark_fn(spark, sf).collect()
    n = 3
    assert sum(r.rank_scaled for r in rows) <= n * _PR_SCALE
    assert all(r.rank_scaled >= int(0.15 * _PR_SCALE) for r in rows)


def test_personalized_pagerank_properties(spark):
    """PPR invariants: deterministic; per-seed top list bounded; every
    seed retains restart mass at its own node (the seed must appear in
    its own result — teleportation guarantees nonzero self-mass); and
    per-seed total reported mass stays under the SCALE/0.15 geometric
    bound that the overflow argument relies on."""
    from http_log_anonymizer_spark.plans import REGISTRY
    from http_log_anonymizer_spark.plans.analytics import (
        _PPR_SEEDS,
        _PPR_TOP,
        _PR_SCALE,
    )

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["personalized_pagerank"].spark_fn(spark, sf).collect()
    rows2 = REGISTRY["personalized_pagerank"].spark_fn(spark, sf).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]

    by_seed: dict[int, list] = {}
    for r in rows:
        by_seed.setdefault(r.seed, []).append(r)
    assert len(by_seed) == _PPR_SEEDS
    for seed, rs in by_seed.items():
        assert len(rs) <= _PPR_TOP
        assert [r.pos for r in rs] == list(range(1, len(rs) + 1))
        assert any(r.node == seed for r in rs), f"seed {seed} lost its restart mass"
        assert all(r.rank_scaled > 0 for r in rs)
        assert sum(r.rank_scaled for r in rs) < _PR_SCALE / 0.15


def _reference_lpa(baskets, rounds=4, minsup=2):
    edges: dict[tuple[int, int], int] = {}
    for parts in baskets:
        for a in parts:
            for b in parts:
                if a != b:
                    edges[(a, b)] = edges.get((a, b), 0) + 1
    edges = {k: w for k, w in edges.items() if w >= minsup}
    nodes = sorted({a for a, _ in edges})
    inertia = {n: max(w for (a, _b), w in edges.items() if a == n) for n in nodes}
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        votes: dict[int, dict[int, int]] = {n: {} for n in nodes}
        for (a, b), w in edges.items():
            votes[b][lbl[a]] = votes[b].get(lbl[a], 0) + w
        for n in nodes:  # inertia self-vote for the current label
            votes[n][lbl[n]] = votes[n].get(lbl[n], 0) + inertia[n]
        lbl = {
            n: min(v, key=lambda c: (-v[c], c))
            for n, v in votes.items()
        }
    sizes: dict[int, int] = {}
    for c in lbl.values():
        sizes[c] = sizes.get(c, 0) + 1
    return sizes


def test_lpa_matches_python_reference_and_splits_cliques(spark, tmp_path):
    """Two 3-cliques (repeated baskets so edges clear the support
    threshold) joined by one support-2 bridge: deterministic LPA must
    keep them as separate communities, and the operator must match the
    plain-Python rule exactly."""
    from http_log_anonymizer_spark.plans import REGISTRY

    baskets = (
        [[1, 2, 3]] * 3 + [[10, 11, 12]] * 3 + [[3, 10]] * 2 + [[1, 2], [11, 12]]
    )
    sf = _write_sf(spark, tmp_path, baskets)
    got = {
        r.community: r.n_nodes
        for r in REGISTRY["label_propagation_communities"].spark_fn(spark, sf).collect()
    }
    ref = _reference_lpa(baskets)
    assert got == ref
    # the bridge must not merge the cliques
    assert len(got) >= 2
    assert sorted(got.values(), reverse=True)[:2] == [3, 3]


def _reference_kcore(baskets, k=3, rounds=4, minsup=2):
    edges: dict[tuple[int, int], int] = {}
    for parts in baskets:
        for a in parts:
            for b in parts:
                if a != b:
                    edges[(a, b)] = edges.get((a, b), 0) + 1
    e = {p for p, w in edges.items() if w >= minsup}
    alive = {a for a, _ in e}
    out = []
    for t in range(rounds):
        deg: dict[int, int] = {}
        for a, b in e:
            if a in alive and b in alive:
                deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        n_edges = sum(1 for a, b in e if a in alive and b in alive) // 2
        out.append((t + 1, len(alive), n_edges))
    return out


def test_kcore_keeps_clique_drops_path(spark, tmp_path):
    """A 4-clique survives 3-core peeling; a path (max degree 2) is
    fully peeled in round 1; and the operator matches the plain-Python
    peel exactly, round by round."""
    from http_log_anonymizer_spark.plans import REGISTRY

    clique = [[1, 2, 3, 4]] * 2          # every pair at support 2
    path = [[10, 11], [11, 12], [12, 13]] * 2
    baskets = clique + path
    sf = _write_sf(spark, tmp_path, baskets)
    got = [
        (r.round, r.n_nodes, r.n_edges)
        for r in REGISTRY["kcore_peeling_report"].spark_fn(spark, sf).collect()
    ]
    assert got == _reference_kcore(baskets)
    # the clique is the terminal core: 4 nodes, 6 undirected edges
    assert got[-1] == (4, 4, 6)
