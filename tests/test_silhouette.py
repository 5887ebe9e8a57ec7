"""Planted semantics for kmeans_silhouette_report: geometrically
separated blobs must score near-perfect silhouette, degenerate
(all-identical) corpora must score exactly zero, per-cluster sizes
must agree with kmeans_cluster_sizes on real data, and Spark/DuckDB
parity must hold on every planted table."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

_DIM = 64


def _axis(i: int, scale: float) -> list[float]:
    v = [0.0] * _DIM
    v[i] = scale
    return v


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["kmeans_silhouette_report"]
    sdf = q.spark_fn(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{tmp_path}/embeddings.parquet/*.parquet'"
        )
        ok, msg = compare(sdf, con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return {r.cluster: r for r in sdf.collect()}


def test_one_point_per_blob_scores_exactly_one(spark, tmp_path):
    # 8 vectors on 8 distant axes: the 8 seeds are one per blob, every
    # vector sits ON its centroid (a = 0) far from all others (b > 0),
    # so s = (b - 0)/b = 1 exactly, per cluster and pooled.
    _write_embeddings(
        spark, tmp_path, [(i, _axis(i, 10.0 * (i + 1))) for i in range(8)]
    )
    got = _run(spark, tmp_path)
    assert len(got) == 9  # 8 clusters + pooled
    for r in got.values():
        assert r.mean_silhouette == 1.0
        assert r.min_silhouette == 1.0 and r.max_silhouette == 1.0
    assert got[-1].n_vectors == 8


def test_tight_blobs_score_high(spark, tmp_path):
    # 8 blobs of 3 near-identical points each; whatever seeding does,
    # blob diameter (0.05) is tiny against blob spacing (>= 10), so
    # the pooled silhouette stays high. Deterministic via md5 seeding.
    rows = []
    vid = 0
    for b in range(8):
        center = 10.0 * (b + 1)
        for j in range(3):
            v = _axis(b, center)
            v[(b + 8 + j) % _DIM] = 0.05 * j
            rows.append((vid, v))
            vid += 1
    _write_embeddings(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    assert got[-1].n_vectors == 24
    assert got[-1].mean_silhouette > 0.5


def test_identical_vectors_score_zero(spark, tmp_path):
    # Fewer vectors than k and all identical: every centroid collapses
    # to the same point, a = b = 0, and s is defined as 0 (not a
    # division error).
    _write_embeddings(spark, tmp_path, [(i, _axis(0, 1.0)) for i in range(5)])
    got = _run(spark, tmp_path)
    assert got[-1].mean_silhouette == 0.0
    assert got[-1].min_silhouette == 0.0 and got[-1].max_silhouette == 0.0


def test_sizes_agree_with_kmeans_cluster_sizes(spark):
    sf = "/root/testdata/sf0.001"
    sil = {
        r.cluster: r.n_vectors
        for r in REGISTRY["kmeans_silhouette_report"].spark_fn(spark, sf).collect()
        if r.cluster >= 0
    }
    sizes = {
        r.cluster: r.n_vectors
        for r in REGISTRY["kmeans_cluster_sizes"].spark_fn(spark, sf).collect()
    }
    assert sil == sizes
