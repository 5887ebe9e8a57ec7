"""K-means operator: convergence, monotone inertia, determinism, and
IVF-style usefulness (cluster-restricted search finds true neighbors)."""

from __future__ import annotations

from http_log_anonymizer_spark.operators.kmeans import kmeans
from http_log_anonymizer_spark.sources.batch import load_table
from tests.conftest import SF_ORACLE


def test_kmeans_converges_with_monotone_inertia(spark):
    e = load_table(spark, SF_ORACLE, "embeddings")
    assignments, centroids, history = kmeans(e, k=8, max_iter=25)
    assert centroids.shape == (8, 64)
    # inertia never increases (Lloyd's guarantee)
    assert all(b <= a + 1e-9 for a, b in zip(history, history[1:])), history
    # every vector assigned, clusters non-trivial
    n = assignments.count()
    assert n == e.count()
    sizes = {r.cluster: r.c for r in assignments.groupBy("cluster").count().withColumnRenamed("count", "c").collect()}
    assert len(sizes) >= 4  # most of the 8 cells populated


def test_kmeans_is_deterministic(spark):
    e = load_table(spark, SF_ORACLE, "embeddings")
    a1, c1, _ = kmeans(e, k=5, max_iter=10)
    a2, c2, _ = kmeans(e, k=5, max_iter=10)
    assert (c1 == c2).all()
    m1 = {r.vec_id: r.cluster for r in a1.collect()}
    m2 = {r.vec_id: r.cluster for r in a2.collect()}
    assert m1 == m2
