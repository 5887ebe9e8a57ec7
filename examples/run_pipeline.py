"""End-to-end demo: the reference pipeline, Spark-native.

What the reference does with Kafka + Rust + ClickHouse
(README.md:17-31), this script does self-contained:

  1. produce Cap'n Proto HttpLogRecord payloads (pure-Python codec —
     the synthetic producer, S6);
  2. stream them through decode (S3) -> invalid-drop (T3) ->
     anonymize (T4/T5) -> monthly-partitioned dedup sink (S4/F9/A4);
  3. run the canonical delegated query (A1-A3, lib.rs:119-125) over
     the materialized table;
  4. print pipeline metrics (telemetry.rs analog).

Run: python examples/run_pipeline.py [n_records]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions import anonymize_ip_fast
from http_log_anonymizer_spark.session import get_spark
from http_log_anonymizer_spark.sinks.parquet import ParquetSink
from http_log_anonymizer_spark.sources.capnp import decode_capnp_stream
from http_log_anonymizer_spark.sources.capnp_codec import encode_http_log_record
from http_log_anonymizer_spark.streaming.listener import MetricsListener
from http_log_anonymizer_spark.streaming.pipeline import (
    PipelineSpec,
    anonymize_transform,
    build_streaming_query,
)


def produce(spark, path: str, n: int) -> None:
    """Synthetic capnp producer: n records + a few poison payloads."""
    rows = [
        (
            encode_http_log_record(
                timestamp_epoch_milli=1704067200000 + i * 250,
                resource_id=i % 50,
                bytes_sent=100 + (i * 97) % 10_000,
                request_time_milli=i % 500,
                response_status=500 if i % 17 == 0 else 200,
                cache_status="HIT" if i % 3 == 0 else "MISS",
                method="GET",
                remote_addr=(
                    "2001:0db8:85a3:0000:0000:8a2e:0370:7334"
                    if i % 103 == 0
                    else f"10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}"
                ),
                url=f"/r/{i % 50}",
            ),
        )
        for i in range(n)
    ] + [(b"poison",)] * 3
    spark.createDataFrame(rows, ["value"]).write.mode("overwrite").parquet(path)


def main(n: int = 5000) -> None:
    spark = get_spark(app_name="hla-demo")
    spark.sparkContext.setLogLevel("ERROR")
    listener = MetricsListener()
    spark.streams.addListener(listener)

    with tempfile.TemporaryDirectory() as tmp:
        src, out, ckpt = f"{tmp}/src", f"{tmp}/table", f"{tmp}/ckpt"
        produce(spark, src, n)

        sink = ParquetSink(out, dedup=True)
        spec = PipelineSpec(
            decoder=decode_capnp_stream,
            transform=anonymize_transform,
            writer=sink.write,
        )
        source = spark.readStream.schema("value binary").parquet(src)
        q = build_streaming_query(source, spec, checkpoint_dir=ckpt, trigger={"availableNow": True})
        q.awaitTermination(300)

        table = spark.read.parquet(out)
        print(f"\nmaterialized rows: {table.count()} (of {n} produced + 3 poison)")

        # the canonical delegated query (lib.rs:119-125)
        totals = (
            table.groupBy("remote_addr", "response_status")
            .agg(F.count("*").alias("cnt"), F.sum("bytes_sent").alias("traffic"))
            .orderBy(F.desc("cnt"), "remote_addr")
        )
        totals.show(10, truncate=False)
        # sanity: IPs are anonymized
        v4 = table.filter(F.col("remote_addr").rlike(r"\.x$")).count()
        v6 = table.filter(F.col("remote_addr").endswith(":xxxx")).count()
        print(f"anonymized: {v4} IPv4, {v6} IPv6 — raw IPs remaining: "
              f"{table.count() - v4 - v6}")
        print("pipeline metrics:", listener.metrics.snapshot())

    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
