"""Streaming-throughput sanity check against the reference's envelope.

BASELINE.md: the reference's sustained ceiling is ~63 rows/s — an
artifact of its 1-request-per-65 s proxy limit (4096-row blocks), not
of compute. The engine must sustain orders of magnitude more through
the FULL hot path (capnp decode -> anonymize -> sink). This test pushes
50k real capnp payloads through the pipeline and asserts >> the
reference ceiling; the measured rate is printed for BENCH context.
"""

from __future__ import annotations

import time

from http_log_anonymizer_spark.sinks.parquet import ParquetSink
from http_log_anonymizer_spark.sources.capnp import decode_capnp_stream
from http_log_anonymizer_spark.sources.capnp_codec import encode_http_log_record
from http_log_anonymizer_spark.streaming.pipeline import (
    PipelineSpec,
    anonymize_transform,
    build_streaming_query,
)

N_ROWS = 50_000


def test_pipeline_throughput_beats_reference_ceiling(spark, tmp_path):
    payloads = [
        (
            encode_http_log_record(
                timestamp_epoch_milli=1704067200000 + i * 17,
                resource_id=i % 50,
                bytes_sent=100 + i % 10_000,
                request_time_milli=i % 500,
                response_status=200,
                cache_status="HIT",
                method="GET",
                remote_addr=f"10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}",
                url=f"/r/{i % 50}",
            ),
        )
        for i in range(N_ROWS)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(payloads, ["value"]).repartition(8).write.parquet(src)

    sink = ParquetSink(str(tmp_path / "out"))
    spec = PipelineSpec(
        decoder=decode_capnp_stream, transform=anonymize_transform, writer=sink.write
    )
    source = spark.readStream.schema("value binary").parquet(src)
    t0 = time.perf_counter()
    q = build_streaming_query(
        source, spec, checkpoint_dir=str(tmp_path / "ckpt"), trigger={"availableNow": True}
    )
    q.awaitTermination(300)
    elapsed = time.perf_counter() - t0

    written = spark.read.parquet(str(tmp_path / "out")).count()
    assert written == N_ROWS
    rate = written / elapsed
    print(f"\npipeline throughput: {rate:,.0f} rows/s over {written} rows "
          f"({elapsed:.1f}s) — reference ceiling 63 rows/s")
    # conservative floor: 100x the reference's sustained max
    assert rate > 6_300, f"only {rate:.0f} rows/s"
