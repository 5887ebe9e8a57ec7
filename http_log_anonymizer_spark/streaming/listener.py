"""Metrics bridge — StreamingQueryListener counterpart of the
reference's Prometheus telemetry (anonymizer/src/telemetry.rs:21-54).

Metric mapping (reference -> here):

  anonymizer_pipeline_messages_total{status=received}  -> received
  anonymizer_pipeline_messages_total{status=rejected}  -> rejected
      (from the decoder's observe() metrics, streaming/pipeline.py)
  anonymizer_pipeline_inserts_total                    -> batches
  anonymizer_pipeline_message_latency_seconds          -> batch duration
  anonymizer_pipeline_output_duration_seconds          -> sink commit ms

Counters are plain in-process values; export to Prometheus would hang a
text endpoint off ``snapshot()`` (prometheus_client is not in this
container, so exporting is left to the deployment).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class PipelineMetrics:
    received: int = 0
    rejected: int = 0
    batches: int = 0
    rows_written: int = 0
    batch_duration_ms: list = field(default_factory=list)
    # sink-commit (addBatch) leg of each micro-batch — the reference's
    # anonymizer_pipeline_output_duration_seconds (telemetry.rs:21-54,
    # "Output Time" dashboard panel)
    sink_duration_ms: list = field(default_factory=list)

    def snapshot(self) -> dict:
        durations = self.batch_duration_ms
        return {
            "received": self.received,
            "rejected": self.rejected,
            "batches": self.batches,
            "rows_written": self.rows_written,
            "avg_batch_ms": (sum(durations) / len(durations)) if durations else 0.0,
        }


class MetricsListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(listener)``."""

    def __init__(self) -> None:
        self.metrics = PipelineMetrics()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.metrics.batches += 1
        # foreachBatch sinks report numOutputRows = -1 (unknown to
        # Spark); fall back to the batch's input rows — on success the
        # writer wrote exactly what entered the sink, and a failed
        # batch never reaches onQueryProgress.
        out_rows = p.sink.numOutputRows
        if out_rows is None or out_rows < 0:
            out_rows = p.numInputRows or 0
        self.metrics.rows_written += out_rows
        if p.batchDuration is not None:
            self.metrics.batch_duration_ms.append(p.batchDuration)
        # durationMs['addBatch'] is the sink-commit leg (the reference's
        # output_duration metric); absent for batches with no sink work
        add_batch = (p.durationMs or {}).get("addBatch")
        if add_batch is not None:
            self.metrics.sink_duration_ms.append(add_batch)
        observed = p.observedMetrics or {}
        decode = observed.get("decode")
        if decode is not None:
            row = decode.asDict() if hasattr(decode, "asDict") else dict(decode)
            self.metrics.received += row.get("received") or 0
            self.metrics.rejected += row.get("rejected") or 0

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
