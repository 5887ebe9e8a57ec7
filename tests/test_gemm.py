"""Blocked-GEMM similarity vs the Catalyst fold-based path: same pairs,
same cosines (to float tolerance), and faster on all-pairs scans."""

from __future__ import annotations

import time

from http_log_anonymizer_spark.operators.gemm import gemm_neardup_pairs
from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.similarity import _NEARDUP_THRESHOLD, _unit_table
from tests.conftest import SF_ORACLE


def test_gemm_matches_catalyst_neardup(spark):
    units = _unit_table(spark, SF_ORACLE, cache=False)
    got = {
        (r.vec_a, r.vec_b): r.cos
        for r in gemm_neardup_pairs(units, _NEARDUP_THRESHOLD).collect()
    }
    want = {
        (r.vec_a, r.vec_b): r.cos
        for r in REGISTRY["embed_neardup"].spark_fn(spark, SF_ORACLE).collect()
    }
    # identical pair sets (threshold boundary pairs tolerated both ways)
    sym_diff = set(got) ^ set(want)
    assert all(
        abs(got.get(p, want.get(p)) - _NEARDUP_THRESHOLD) < 1e-3 for p in sym_diff
    ), sym_diff
    for p in set(got) & set(want):
        assert abs(got[p] - want[p]) < 1e-4, p


def test_gemm_sharded_equals_single_shard(spark):
    """Forcing multiple corpus shards (tiny shard_bytes) must produce
    exactly the single-broadcast result: same pairs, each emitted once
    (a pair belongs to the one shard owning vec_b), same cosines."""
    units = _unit_table(spark, SF_ORACLE, cache=False).limit(400).cache()
    dim = len(units.first()["ue"])
    single = {
        (r.vec_a, r.vec_b): r.cos
        for r in gemm_neardup_pairs(units, _NEARDUP_THRESHOLD).collect()
    }
    # ~6 shards: each shard holds ~70 vectors of dim*8 bytes
    sharded_rows = gemm_neardup_pairs(
        units, _NEARDUP_THRESHOLD, shard_bytes=70 * dim * 8
    ).collect()
    sharded = {(r.vec_a, r.vec_b): r.cos for r in sharded_rows}
    assert len(sharded_rows) == len(sharded)  # no duplicate pair across shards
    assert sharded.keys() == single.keys()
    for p in single:
        assert abs(single[p] - sharded[p]) < 1e-12, p
    units.unpersist()


def test_gemm_is_faster_at_sf01(spark):
    sf = "/root/testdata/sf0.1"
    units = _unit_table(spark, sf, cache=False).cache()
    units.count()

    t0 = time.perf_counter()
    n_gemm = gemm_neardup_pairs(units, _NEARDUP_THRESHOLD).count()
    t_gemm = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_cat = REGISTRY["embed_neardup"].spark_fn(spark, sf).count()
    t_cat = time.perf_counter() - t0

    assert n_gemm == n_cat
    print(f"\nall-pairs neardup at sf0.1: gemm={t_gemm:.1f}s catalyst={t_cat:.1f}s")
    assert t_gemm < t_cat  # BLAS beats interpreted folds on all-pairs
