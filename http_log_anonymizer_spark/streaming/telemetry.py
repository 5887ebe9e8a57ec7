"""Prometheus text exposition for pipeline metrics — the export half of
the reference's telemetry (anonymizer/src/telemetry.rs:21-54 registers
the metrics; telemetry.rs:56-114 serves them over HTTP).

Metric mapping (reference name -> source here):

  anonymizer_pipeline_messages_total{status="received"|"rejected"}
      -> PipelineMetrics.received / .rejected
  anonymizer_pipeline_inserts_total        -> .batches
  anonymizer_pipeline_rows_written_total   -> .rows_written
  anonymizer_pipeline_message_latency_seconds (summary: _count/_sum)
      -> .batch_duration_ms

stdlib-only (http.server in a daemon thread): prometheus_client is not
in this container and the text format is a stable, documented public
format — no dependency needed for a scrape endpoint.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from http_log_anonymizer_spark.streaming.listener import PipelineMetrics

_PREFIX = "anonymizer_pipeline"


def render_prometheus(metrics: PipelineMetrics) -> str:
    """PipelineMetrics -> Prometheus text exposition format (v0.0.4)."""
    durations_s = [ms / 1000.0 for ms in metrics.batch_duration_ms]
    lines = [
        f"# HELP {_PREFIX}_messages_total Messages seen by the decode stage.",
        f"# TYPE {_PREFIX}_messages_total counter",
        f'{_PREFIX}_messages_total{{status="received"}} {metrics.received}',
        f'{_PREFIX}_messages_total{{status="rejected"}} {metrics.rejected}',
        f"# HELP {_PREFIX}_inserts_total Micro-batches committed to the sink.",
        f"# TYPE {_PREFIX}_inserts_total counter",
        f"{_PREFIX}_inserts_total {metrics.batches}",
        f"# HELP {_PREFIX}_rows_written_total Rows written by the sink.",
        f"# TYPE {_PREFIX}_rows_written_total counter",
        f"{_PREFIX}_rows_written_total {metrics.rows_written}",
        f"# HELP {_PREFIX}_message_latency_seconds Batch processing latency.",
        f"# TYPE {_PREFIX}_message_latency_seconds summary",
        f"{_PREFIX}_message_latency_seconds_count {len(durations_s)}",
        f"{_PREFIX}_message_latency_seconds_sum {sum(durations_s)}",
    ]
    return "\n".join(lines) + "\n"


class MetricsHttpServer:
    """Minimal /metrics scrape endpoint over a live PipelineMetrics.

    ``start()`` binds (port=0 picks an ephemeral port, exposed as
    ``.port``) and serves from a daemon thread; ``stop()`` shuts down.
    The handler renders on every scrape, so the endpoint always reports
    the listener's current counters.
    """

    def __init__(self, metrics: PipelineMetrics, host: str = "127.0.0.1", port: int = 0):
        self._metrics = metrics
        self._host = host
        self._port = port
        self._httpd: HTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        if self._httpd is None:
            raise RuntimeError("server not started")
        return self._httpd.server_address[1]

    def start(self) -> "MetricsHttpServer":
        metrics = self._metrics

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802
                if self.path != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                body = render_prometheus(metrics).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # quiet scrapes
                pass

        self._httpd = HTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
