"""Kafka streaming source (S1/S2) — consumer contract from
anonymizer/src/source.rs:35-51.

Reference options (source.rs:37-44) -> Spark reader options:

  group.id              -> kafka.group.id (informational; Spark manages
                           offsets via checkpoint, F3/F5/F8)
  auto.offset.reset=latest -> startingOffsets=latest
  isolation.level=read_committed -> kafka.isolation.level=read_committed
  enable.auto.commit=false -> built-in (Spark never auto-commits;
                           offsets live in the checkpoint WAL)
  NUM_CONSUMERS parallel consumers (source.rs:250-265) -> minPartitions
                           (Kafka partitions map to Spark tasks)

Requires the spark-sql-kafka package on the classpath; import-gated so
the rest of the engine works without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from http_log_anonymizer_spark.config import KafkaConfig


def kafka_source(
    spark: SparkSession,
    cfg: KafkaConfig | None = None,
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """Build the streaming Kafka source DataFrame (value: binary,
    partition: int, offset: long — the (partition, offset) pair the
    reference tracks per row, sink.rs:77-78, is carried natively)."""
    cfg = cfg or KafkaConfig.from_env()
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.brokers)
        .option("subscribe", cfg.topic)
        .option("kafka.group.id", cfg.group_id)
        .option("startingOffsets", "latest")
        .option("kafka.isolation.level", "read_committed")
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load()
