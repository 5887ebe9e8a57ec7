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


def test_kmeans_quantized_table_matches_literal_variant(spark):
    """The broadcast-table/numpy Lloyd variant (kmeans_quantized_table,
    used by the sqrt-scaled IVF tier) must produce the SAME learned
    index as the k-literal-branches variant the fixed-k queries use —
    identical assignments AND identical centroid floats, since both
    claim to replay kmeans_lloyd_sql bit-for-bit."""
    from pyspark.sql import functions as F

    from http_log_anonymizer_spark.operators.kmeans import (
        kmeans_quantized,
        kmeans_quantized_table,
    )

    e = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    a1, c1 = kmeans_quantized(e, k=8, rounds=2)
    a2, c2 = kmeans_quantized_table(e, k=8, rounds=2)
    assert c1 == c2  # same IEEE centroid values, component-for-component
    r1 = {r.vec_id: r.cluster for r in a1.collect()}
    r2 = {r.vec_id: r.cluster for r in a2.collect()}
    assert r1 == r2


def test_kmeans_quantized_multi_matches_per_subspace(spark):
    """The fused multi-subspace trainer (kmeans_quantized_multi, the
    r10 PQ-codebook path: one job per round for ALL subspaces, code
    table emitted without vec_id joins) must produce the SAME learned
    codebooks and assignments as training each dsub-dim slice
    separately with kmeans_quantized — identical centroid floats and
    identical per-subspace cluster codes, since the seeds, integer
    sums, and argmin comparator are shared."""
    from pyspark.sql import functions as F

    from http_log_anonymizer_spark.operators.kmeans import (
        kmeans_quantized,
        kmeans_quantized_multi,
    )

    n_sub, dsub, k, rounds = 4, 16, 8, 2
    e = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("r")
    )
    codes, cents = kmeans_quantized_multi(
        e, n_sub=n_sub, dsub=dsub, k=k, rounds=rounds, extra=("label",), vec_col="r"
    )
    got = {r.vec_id: r for r in codes.collect()}
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    for m in range(n_sub):
        sub = e.select(
            "vec_id", F.slice("r", m * dsub + 1, dsub).alias("embedding")
        )
        a_m, c_m = kmeans_quantized(sub, k=k, rounds=rounds)
        assert cents[m] == c_m, f"subspace {m} centroids diverge"
        want = {r.vec_id: r.cluster for r in a_m.collect()}
        assert {v: r[f"c{m}"] for v, r in got.items()} == want, f"codes c{m}"
    # extra columns pass through unchanged
    assert {v: r.label for v, r in got.items()} == labels


def test_sqrt_ivf_recall_vs_brute_force(spark):
    """ann_ivf_sqrt_topk (sqrt-scaled cells, kernel search) must be
    deterministic and recover a solid share of the true top-5 while
    scanning only nprobe*sqrt(n) candidates per query — and beat the
    wide-LSH tier's recall, which is the trade it exists to fix
    (VERDICT r04 item 2)."""
    from http_log_anonymizer_spark.plans import REGISTRY

    sf = SF_ORACLE
    sq = REGISTRY["ann_ivf_sqrt_topk"].spark_fn(spark, sf).collect()
    sq2 = REGISTRY["ann_ivf_sqrt_topk"].spark_fn(spark, sf).collect()
    assert [tuple(r) for r in sq] == [tuple(r) for r in sq2]  # deterministic

    brute = REGISTRY["ann_brute_topk"].spark_fn(spark, sf).collect()
    got, want = {}, {}
    for r in sq:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in brute:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(want) == set(got)
    recall = sum(len(got[q] & want[q]) for q in want) / sum(len(want[q]) for q in want)

    wl = REGISTRY["ann_lsh_wide_topk"].spark_fn(spark, sf).collect()
    gotw = {}
    for r in wl:
        gotw.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall_wide = sum(len(gotw.get(q, set()) & want[q]) for q in want) / sum(
        len(want[q]) for q in want
    )
    assert recall >= 0.5, recall
    assert recall > recall_wide, (recall, recall_wide)


def test_sqrt_nprobe_rule():
    """r05 verdict item 4: probe width follows the FAISS sqrt rule
    with the small-corpus floor — the gate SFs stay at 8 (so their
    hashes were unaffected by the change) while the ladder points
    widen: k=141 -> 12, k=447 -> 21."""
    from http_log_anonymizer_spark.plans.similarity import _sqrt_nprobe

    assert _sqrt_nprobe(45) == 8     # sf0.1 gate: floor
    assert _sqrt_nprobe(64) == 8     # boundary: sqrt(64)=8
    assert _sqrt_nprobe(141) == 12   # n=20k ladder point
    assert _sqrt_nprobe(447) == 21   # n=200k ladder point
    assert _sqrt_nprobe(31623) == 178  # n=1e9: still tiny vs k
