"""Poisson bootstrap: the replica table must behave like a sampling
distribution (CI from order statistics brackets the point estimate and
tightens with n), the weight law must actually be Poisson(1) (unit
mean, unit-ish variance, exact CDF ladder), and the whole construction
must be deterministic."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions.text import hash64
from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.sampling import _BOOT_B, _BOOT_CDF


def _replicas(spark, sf):
    rows = REGISTRY["poisson_bootstrap_report"].spark_fn(spark, sf).collect()
    point = next(r for r in rows if r.replica_id == 0)
    reps = sorted(r.mean_microcents for r in rows if r.replica_id > 0)
    return point, reps


def test_cdf_ladder_is_the_poisson_1_cdf():
    acc = 0.0
    for w, t in enumerate(_BOOT_CDF):
        acc += math.exp(-1) / math.factorial(w)
        assert t == int(acc * 1_000_000_000), w  # floor-exact constants


def test_ci_brackets_the_point_estimate_and_replicas_vary(spark):
    point, reps = _replicas(spark, "/root/testdata/sf0.01")
    assert len(reps) == _BOOT_B
    lo, hi = reps[0], reps[-1]
    assert lo <= point.mean_microcents <= hi
    assert len(set(reps)) > _BOOT_B // 2  # genuinely distinct resamples
    # a 2.5%..97.5% order-statistic CI (ranks 1 and B for B=32) should
    # be a few-percent band around the mean at n~15k, not degenerate
    # and not wild
    width = (hi - lo) / point.mean_microcents
    assert 0.001 < width < 0.2, width


def test_ci_tightens_with_corpus_size(spark):
    _, small = _replicas(spark, "/root/testdata/sf0.001")
    p_big, big = _replicas(spark, "/root/testdata/sf0.01")
    w_small = small[-1] - small[0]
    w_big = big[-1] - big[0]
    # n grows 10x -> se shrinks ~sqrt(10)x; allow slack for B=32 noise
    assert w_big < w_small, (w_small, w_big)


def test_weight_law_has_unit_mean_and_variance(spark):
    o = REGISTRY["poisson_bootstrap_report"].spark_fn  # noqa: F841 - registry warm
    from http_log_anonymizer_spark.sources.batch import load_table

    ids = load_table(spark, "/root/testdata/sf0.01", "orders").select("o_orderkey")
    u = hash64("o_orderkey", "boot1") % 1_000_000_000
    w = F.lit(len(_BOOT_CDF))
    expr = None
    for wv, t in enumerate(_BOOT_CDF):
        cond = u < F.lit(t)
        expr = F.when(cond, wv) if expr is None else expr.when(cond, wv)
    stats = ids.select(expr.otherwise(len(_BOOT_CDF)).alias("w")).agg(
        F.avg("w").alias("m"), F.var_pop("w").alias("v"), F.max("w").alias("mx")
    ).collect()[0]
    assert abs(stats.m - 1.0) < 0.05  # E[w] = 1
    assert abs(stats.v - 1.0) < 0.1  # Var[w] = 1 (cap truncation is tiny)
    assert stats.mx <= len(_BOOT_CDF)


def test_replica_table_is_deterministic(spark):
    a = REGISTRY["poisson_bootstrap_report"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    b = REGISTRY["poisson_bootstrap_report"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert a == b
