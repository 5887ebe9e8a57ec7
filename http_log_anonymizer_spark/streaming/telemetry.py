"""Prometheus text exposition + Loki log shipping — the export half of
the reference's telemetry (anonymizer/src/telemetry.rs:21-54 registers
the metrics; telemetry.rs:56-114 serves them over HTTP;
telemetry.rs:89-114 + main.rs:31-46 publish tracing logs to Grafana
Loki with labels app=anonymizer, replica=N).

Metric mapping (reference name -> source here):

  anonymizer_pipeline_messages_total{status="received"|"rejected"}
      -> PipelineMetrics.received / .rejected
  anonymizer_pipeline_inserts_total        -> .batches
  anonymizer_pipeline_rows_written_total   -> .rows_written
  anonymizer_pipeline_message_latency_seconds (histogram)
      -> .batch_duration_ms
  anonymizer_pipeline_output_duration_seconds (histogram)
      -> .sink_duration_ms (the addBatch sink-commit leg)

Latency metrics are HISTOGRAMS (cumulative le buckets + _count/_sum),
not summaries: the reference's Grafana dashboard computes p75/p99 via
histogram_quantile() over rate(..._bucket[5m]) — a summary has no
_bucket series and those panels would be empty
(grafana/dashboards/grafana_dashboard_anonymizer_performance.json;
dashboard analog: grafana/anonymizer_performance.json in this repo).

stdlib-only (http.server in a daemon thread): prometheus_client is not
in this container and the text format is a stable, documented public
format — no dependency needed for a scrape endpoint.
"""

from __future__ import annotations

import json
import logging
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, HTTPServer

from http_log_anonymizer_spark.streaming.listener import PipelineMetrics

_PREFIX = "anonymizer_pipeline"


# Histogram bucket boundaries (seconds). Spans trigger cadences from
# sub-100ms micro-batches to multi-minute stalls; +Inf is implicit.
_LATENCY_BUCKETS = (0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0, 60.0)


def _histogram_lines(name: str, help_text: str, values_s: list) -> list:
    """Prometheus histogram exposition: cumulative le buckets,
    _count and _sum — the shape histogram_quantile() needs."""
    lines = [
        f"# HELP {name} {help_text}",
        f"# TYPE {name} histogram",
    ]
    for le in _LATENCY_BUCKETS:
        n = sum(1 for v in values_s if v <= le)
        lines.append(f'{name}_bucket{{le="{le}"}} {n}')
    lines.append(f'{name}_bucket{{le="+Inf"}} {len(values_s)}')
    lines.append(f"{name}_count {len(values_s)}")
    lines.append(f"{name}_sum {sum(values_s)}")
    return lines


def render_prometheus(metrics: PipelineMetrics) -> str:
    """PipelineMetrics -> Prometheus text exposition format (v0.0.4)."""
    durations_s = [ms / 1000.0 for ms in metrics.batch_duration_ms]
    sink_s = [ms / 1000.0 for ms in metrics.sink_duration_ms]
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
        *_histogram_lines(
            f"{_PREFIX}_message_latency_seconds",
            "End-to-end micro-batch processing latency.",
            durations_s,
        ),
        *_histogram_lines(
            f"{_PREFIX}_output_duration_seconds",
            "Sink commit (addBatch) duration per micro-batch.",
            sink_s,
        ),
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


def _loki_post(url: str, payload: bytes) -> None:  # pragma: no cover
    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        if resp.status >= 300:
            raise RuntimeError(f"Loki push HTTP {resp.status}")


class LokiHandler(logging.Handler):
    """Buffered ``logging.Handler`` that ships records to Grafana Loki's
    push API — the TracingExporter analog (telemetry.rs:89-114,
    main.rs:31-46): one labeled stream per (app, replica, level),
    values as [unix_ns, line] pairs, flushed by a daemon thread on a
    cadence and drained on close() (the graceful-shutdown abort point).

    ``post`` is injectable for tests; the default POSTs to
    ``{base_url}/loki/api/v1/push``. Emit never blocks on the network:
    records append to an in-memory buffer under a lock and failures
    surface via logging.Handler.handleError (drop-and-continue, as the
    reference's background task does)."""

    def __init__(
        self,
        base_url: str,
        app: str = "anonymizer",
        replica: str = "0",
        flush_interval_s: float = 2.0,
        post=_loki_post,
    ) -> None:
        super().__init__()
        self.url = base_url.rstrip("/") + "/loki/api/v1/push"
        self.labels = {"app": app, "replica": replica}
        self._post = post
        self._buf: list[tuple[str, int, str]] = []  # (level, ts_ns, line)
        self._lock = threading.Lock()
        self._interval = flush_interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def emit(self, record: logging.LogRecord) -> None:
        line = self.format(record)
        ts_ns = int(record.created * 1_000_000_000)
        with self._lock:
            self._buf.append((record.levelname.lower(), ts_ns, line))

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            self.flush()

    def flush(self) -> None:
        with self._lock:
            batch, self._buf = self._buf, []
        if not batch:
            return
        streams: dict[str, list[list[str]]] = {}
        for level, ts_ns, line in batch:
            streams.setdefault(level, []).append([str(ts_ns), line])
        payload = json.dumps(
            {
                "streams": [
                    {"stream": {**self.labels, "level": lvl}, "values": vals}
                    for lvl, vals in sorted(streams.items())
                ]
            },
            separators=(",", ":"),
        ).encode()
        try:
            self._post(self.url, payload)
        except Exception:
            # drop-and-continue: log shipping must never take down the
            # pipeline (the reference aborts the background task on
            # shutdown; transient push failures only lose the batch)
            pass

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        self.flush()
        super().close()
