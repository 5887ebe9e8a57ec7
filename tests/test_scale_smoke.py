"""Scale smoke: the reference-parity pipeline shape at 5M rows
(~8x the sf0.1 lineitem row count), generated JVM-side with zero I/O.
Verifies the plans stay healthy well past the oracle scale — grouped
totals + anonymization + percentiles over 5M rows in seconds, and the
salted join agreeing with the plain join under an extreme hot key.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions import anonymize_ip_fast
from http_log_anonymizer_spark.operators.salted import salted_join
from http_log_anonymizer_spark.sources.synthetic import synthetic_http_log_batch

N = 5_000_000


def test_canonical_totals_at_5m_rows(spark):
    log = synthetic_http_log_batch(spark, N)
    t0 = time.perf_counter()
    totals = (
        log.withColumn("remote_addr", anonymize_ip_fast("remote_addr"))
        .groupBy("remote_addr", "response_status")
        .agg(F.count("*").alias("cnt"), F.sum("bytes_sent").alias("traffic"))
    )
    n_groups = totals.count()
    rows_total = totals.agg(F.sum("cnt")).collect()[0][0]
    elapsed = time.perf_counter() - t0
    assert rows_total == N
    # octets derive from one counter -> ~256 anonymized addrs x statuses
    assert n_groups > 500
    # all valid v4 are anonymized; v6/garbage pass through untouched
    bad = totals.filter(
        F.col("remote_addr").rlike(r"^(\d{1,3}\.){3}\d{1,3}$")
    ).count()
    assert bad == 0
    print(f"\n5M-row canonical totals: {elapsed:.1f}s, {n_groups} groups")
    assert elapsed < 60


def test_salted_join_under_extreme_skew_at_scale(spark):
    # 95% of 2M rows hit one key
    skewed = spark.range(2_000_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    small = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    t0 = time.perf_counter()
    got = (
        salted_join(skewed, small, ["k"], n_salts=16)
        .agg(F.count("*").alias("c"), F.sum(F.col("v") + F.col("w")).alias("s"))
        .collect()[0]
    )
    elapsed = time.perf_counter() - t0
    want = (
        skewed.join(small, ["k"])
        .agg(F.count("*").alias("c"), F.sum(F.col("v") + F.col("w")).alias("s"))
        .collect()[0]
    )
    assert (got.c, got.s) == (want.c, want.s)
    print(f"\nsalted join over 2M skewed rows: {elapsed:.1f}s")


def test_reservoir_sample_at_5m_rows(spark):
    """Per-stratum reservoir at 5M rows: the partial prune must keep the
    exact k smallest hashes per stratum (spot-checked against a direct
    global sort of one stratum) in seconds, without a full window sort
    of all strata."""
    from http_log_anonymizer_spark.functions.text import hash64
    from http_log_anonymizer_spark.operators.reservoir import reservoir_per_group

    n, k = 5_000_000, 5
    df = spark.range(n).select(
        (F.col("id") % 10).alias("g"),
        F.col("id").alias("rid"),
        hash64(F.col("id").cast("string"), "smoke").alias("pri"),
    )
    t0 = time.perf_counter()
    got = (
        reservoir_per_group(df, ["g"], k, "pri", ["rid"])
        .select("g", "rid", "rnk")
        .collect()
    )
    elapsed = time.perf_counter() - t0
    assert len(got) == 10 * k
    # exactness spot-check for one stratum against a direct sort
    want_g0 = [
        r.rid
        for r in df.filter(F.col("g") == 0)
        .orderBy("pri", "rid")
        .limit(k)
        .collect()
    ]
    got_g0 = [r.rid for r in sorted(got) if r.g == 0]
    assert sorted(got_g0) == sorted(want_g0)
    print(f"\n5M-row reservoir: {elapsed:.1f}s")
    assert elapsed < 60
