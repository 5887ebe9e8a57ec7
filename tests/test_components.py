"""Connected components: min-label propagation vs large-star/small-star.

The two distributed algorithms must produce identical (node -> min-id)
labelings; the star variant must additionally converge in few rounds on
high-diameter graphs where min-label needs O(diameter) rounds.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from http_log_anonymizer_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _labels(df) -> dict[int, int]:
    return {r["node"]: r["cluster"] for r in df.collect()}


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],
        [(1, 2), (2, 3), (4, 5)],
        [(10, 20), (20, 30), (30, 10), (40, 50)],  # cycle + pair
        [(i, i + 1) for i in range(1, 8)],  # short path
    ],
    ids=["edge", "path+pair", "cycle+pair", "path8"],
)
def test_star_matches_brute_force(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    assert _labels(connected_components_star(e)) == _brute_components(edges)


def test_star_handles_long_path_where_minlabel_would_need_linear_rounds(spark):
    """64-node path: min-label needs 63 rounds (it raises past its
    default max_iter); the star algorithm's O(log^2 n) bound lands it
    comfortably inside 20."""
    edges = [(i, i + 1) for i in range(1, 64)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = _labels(connected_components_star(e))
    assert got == {i: 1 for i in range(1, 65)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iter=10)


def test_star_matches_minlabel_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(1, 201))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "src long, dst long")
    star = _labels(connected_components_star(e))
    minlabel = _labels(connected_components(e))
    assert star == minlabel == _brute_components(edges)


def test_star_label_is_component_minimum(spark):
    edges = [(5, 9), (9, 3), (100, 42), (42, 77), (8, 8)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = _labels(connected_components_star(e))
    # self-loop-only node 8 is dropped (no real edge) — same contract
    # as the min-label variant, which also only sees a != b pairs.
    assert got == {5: 3, 9: 3, 3: 3, 100: 42, 42: 42, 77: 42}


def test_registered_star_clusters_match_minlabel_clusters(spark):
    from http_log_anonymizer_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    a = REGISTRY["dedup_clusters"].spark_fn(spark, sf).collect()
    b = REGISTRY["dedup_clusters_star"].spark_fn(spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0


def test_pca_power_matches_numpy_eigendecomposition(spark):
    """The integer power iteration must converge to the true leading
    eigenvector of the (float) covariance: |cos| between the returned
    loading vector and numpy's top eigenvector >= 0.99 at sf0.01, and
    the Rayleigh quotient must be positive."""
    import numpy as np

    from http_log_anonymizer_spark.plans import REGISTRY
    from http_log_anonymizer_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.01"
    rows = REGISTRY["embedding_pca_power"].spark_fn(spark, sf).collect()
    y = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    assert rows[0].eig_q > 0

    emb = np.array(
        [r.embedding for r in load_table(spark, sf, "embeddings").select("embedding").collect()],
        dtype=np.float64,
    )
    cov = np.cov(emb, rowvar=False)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    cos = abs(float(np.dot(y, top) / (np.linalg.norm(y) * np.linalg.norm(top))))
    assert cos >= 0.99, cos
