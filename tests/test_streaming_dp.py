"""Streaming DP histogram: fed the batch query's own rows in
micro-batches, dp_report() must EQUAL dp_histogram_report (state stays
exact, noise is a pure function of key+seed); the additive merge must
be replay-safe and batch-boundary invariant; the noise itself must
follow the two-sided geometric pmf it claims (pure-Python replay of
the inlined CDF boundaries)."""

from __future__ import annotations

import hashlib
import math
from bisect import bisect_right

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.http_log import (
    _DP_B,
    _DP_BOUNDS,
    _DP_EPS,
    http_log_view,
)
from http_log_anonymizer_spark.streaming.dp import StreamingDPHistogram

SF = "/root/testdata/sf0.001"

KEYS = ("url", "method")


def _py_noise(key: str, seed: str = "dp") -> int:
    """Driver-free replay of the mechanism: hash64 then inverse-CDF
    lookup over the same integer boundaries both engines inline."""
    u = int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:15], 16)
    return bisect_right(_DP_BOUNDS, u) - _DP_B


def test_stream_fold_equals_batch_report(spark, tmp_path):
    rows = http_log_view(spark, SF).select(*KEYS).persist()
    mon = StreamingDPHistogram(str(tmp_path / "state"), KEYS)
    for b in range(4):
        mon.write(rows.filter(F.crc32(F.col("url")) % 4 == b), b)
    rows.unpersist()

    got = [tuple(r) for r in mon.dp_report(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["dp_histogram_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want
    assert len(got) >= 1


def test_replay_and_boundaries_do_not_change_release(spark, tmp_path):
    rows = http_log_view(spark, SF).select(*KEYS).persist()
    one = StreamingDPHistogram(str(tmp_path / "one"), KEYS)
    one.write(rows, 0)

    many = StreamingDPHistogram(str(tmp_path / "many"), KEYS)
    for b in range(3):
        many.write(rows.filter(F.crc32(F.col("method")) % 3 == b), b)
    many.write(rows.filter(F.crc32(F.col("method")) % 3 == 2), 2)  # replay
    many.write(rows.filter(F.lit(False)), 3)  # empty slice

    assert [tuple(r) for r in one.dp_report(spark).collect()] == [
        tuple(r) for r in many.dp_report(spark).collect()
    ]
    rows.unpersist()


def test_noise_follows_the_declared_pmf():
    """Over 20k distinct keys the empirical noise distribution must
    track P(k) ~ alpha^|k|: mean near 0, variance near
    2*alpha/(1-alpha)^2, each |k| <= 2 bucket within 20% relative of
    its expected mass. Pure Python — the same boundaries the engines
    inline, so this tests the MECHANISM, not an engine."""
    n = 20_000
    noises = [_py_noise(f"k{i}") for i in range(n)]
    assert all(-_DP_B <= z <= _DP_B for z in noises)
    alpha = math.exp(-_DP_EPS)
    mean = sum(noises) / n
    var = sum(z * z for z in noises) / n - mean * mean
    want_var = 2 * alpha / (1 - alpha) ** 2
    assert abs(mean) < 0.05
    assert abs(var - want_var) / want_var < 0.1
    norm = (1 + alpha) / (1 - alpha)  # untruncated Z; tail ~3e-15
    for k in range(-2, 3):
        want = alpha ** abs(k) / norm
        got = sum(1 for z in noises if z == k) / n
        assert abs(got - want) / want < 0.2, (k, got, want)


def test_batch_report_is_the_python_replay(spark):
    """The released noisy_n must equal true count + the pure-Python
    mechanism replay (clamped at 0) for every cohort — pins the Spark
    column formula to the spec, independent of the DuckDB oracle."""
    truth = {
        (r.url, r.method): r.n
        for r in http_log_view(spark, SF)
        .groupBy("url", "method")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    released = REGISTRY["dp_histogram_report"].spark_fn(spark, SF).collect()
    assert len(released) == len(truth)
    for r in released:
        want = max(0, truth[(r.url, r.method)] + _py_noise(f"{r.url}|{r.method}"))
        assert r.noisy_n == want
        assert r.epsilon == _DP_EPS


def test_before_first_batch_readout_is_none(spark, tmp_path):
    mon = StreamingDPHistogram(str(tmp_path / "state"), KEYS)
    assert mon.dp_report(spark) is None
