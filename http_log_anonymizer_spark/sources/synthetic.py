"""Synthetic http_log producer (S6) — Spark-native analog of the
reference's Java producer container (docker/http-log-kafka-producer,
docker-compose.yml:133-142: one capnp record every
KAFKA_PRODUCER_DELAY_MS).

Batch and streaming variants generate the same deterministic rows from
a row index, so tests can compare a drained stream against the batch
table. The streaming variant uses the rate source (rowsPerSecond ==
1000/KAFKA_PRODUCER_DELAY_MS) with every field derived from the rate
source's ``value`` counter — fully JVM-side, no Python row generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _derive(value: F.Column) -> list[F.Column]:
    """Deterministic http_log fields from a monotonically increasing
    row index (mirrors the shape of FIXTURES.md §1: valid IPv4 with
    planted sort-key duplicates and a few non-IP/IPv6 values)."""
    ts = F.timestamp_seconds(F.lit(1704067200) + (value % 2592000))  # Jan 2024, 30 days
    return [
        ts.alias("timestamp"),
        (value % 50).alias("resource_id"),
        (value * 97 % 100000).alias("bytes_sent"),
        (value % 1000).alias("request_time_milli"),
        F.when(value % 17 == 0, 500)
        .when(value % 13 == 0, 404)
        .otherwise(200)
        .cast("int")
        .alias("response_status"),
        F.when(value % 3 == 0, "HIT").when(value % 3 == 1, "MISS").otherwise("EXPIRED").alias(
            "cache_status"
        ),
        F.when(value % 5 == 0, "POST").otherwise("GET").alias("method"),
        F.when(value % 101 == 0, F.lit("not-an-ip"))
        .when(value % 103 == 0, F.lit("2001:0db8:85a3:0000:0000:8a2e:0370:7334"))
        .otherwise(
            F.concat(
                F.lit("10."),
                (value % 256).cast("string"),
                F.lit("."),
                (value * 7 % 256).cast("string"),
                F.lit("."),
                (value * 13 % 256).cast("string"),
            )
        )
        .alias("remote_addr"),
        F.concat(F.lit("/r/"), (value % 50).cast("string")).alias("url"),
    ]


def synthetic_http_log_batch(spark: SparkSession, n_rows: int = 10_000) -> DataFrame:
    """Deterministic batch http_log table of ``n_rows`` rows."""
    return spark.range(n_rows).select(*_derive(F.col("id")))


def synthetic_http_log_stream(
    spark: SparkSession, rows_per_second: int = 10, ramp_up: int = 0
) -> DataFrame:
    """Streaming variant on the rate source. Default 10 rows/s matches
    the reference producer's KAFKA_PRODUCER_DELAY_MS=100 (.envrc:17)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("rampUpTime", f"{ramp_up}s")
        .load()
    )
    return rate.select(*_derive(F.col("value")))
