"""Prometheus export (telemetry.rs:21-114 analog): exposition format
and the live scrape endpoint."""

from __future__ import annotations

import urllib.request

from http_log_anonymizer_spark.streaming.listener import PipelineMetrics
from http_log_anonymizer_spark.streaming.telemetry import (
    MetricsHttpServer,
    render_prometheus,
)


def _metrics() -> PipelineMetrics:
    m = PipelineMetrics()
    m.received = 120
    m.rejected = 3
    m.batches = 4
    m.rows_written = 117
    m.batch_duration_ms = [250, 750]
    return m


def test_render_prometheus_exposition_format():
    text = render_prometheus(_metrics())
    lines = text.splitlines()
    # every metric has HELP+TYPE, counters are integers, summary has
    # _count/_sum in seconds
    assert '# TYPE anonymizer_pipeline_messages_total counter' in lines
    assert 'anonymizer_pipeline_messages_total{status="received"} 120' in lines
    assert 'anonymizer_pipeline_messages_total{status="rejected"} 3' in lines
    assert "anonymizer_pipeline_inserts_total 4" in lines
    assert "anonymizer_pipeline_rows_written_total 117" in lines
    assert "anonymizer_pipeline_message_latency_seconds_count 2" in lines
    assert "anonymizer_pipeline_message_latency_seconds_sum 1.0" in lines
    assert text.endswith("\n")
    for line in lines:
        assert line.startswith("#") or line.split(" ")[0], line


def test_loki_handler_ships_labeled_streams():
    """The Loki shipper must batch records into per-(labels, level)
    streams in push-API JSON shape ([unix_ns, line] values), flush on
    close (graceful drain), and never raise out of a failing post."""
    import json as _json
    import logging

    from http_log_anonymizer_spark.streaming.telemetry import LokiHandler

    posted = []
    h = LokiHandler(
        "http://loki:3100/", app="anonymizer", replica="0",
        flush_interval_s=3600, post=lambda url, payload: posted.append((url, payload)),
    )
    h.setFormatter(logging.Formatter("%(levelname)s %(message)s"))
    log = logging.Logger("pipeline-test")
    log.addHandler(h)
    log.info("consumed block %d", 7)
    log.error("insert failed")
    h.close()  # drains the buffer even though the interval never fired

    assert len(posted) == 1
    url, payload = posted[0]
    assert url == "http://loki:3100/loki/api/v1/push"
    body = _json.loads(payload)
    by_level = {s["stream"]["level"]: s for s in body["streams"]}
    assert set(by_level) == {"info", "error"}
    for s in body["streams"]:
        assert s["stream"]["app"] == "anonymizer"
        assert s["stream"]["replica"] == "0"
    [[ts, line]] = by_level["info"]["values"]
    assert line == "INFO consumed block 7" and int(ts) > 10**18

    # a failing post must not raise out of flush
    h2 = LokiHandler(
        "http://loki:3100", flush_interval_s=3600,
        post=lambda *a: (_ for _ in ()).throw(RuntimeError("down")),
    )
    log2 = logging.Logger("pipeline-test-2")
    log2.addHandler(h2)
    log2.warning("x")
    h2.close()  # no exception


def test_metrics_http_server_scrapes_live_counters():
    m = _metrics()
    srv = MetricsHttpServer(m).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/metrics"
        with urllib.request.urlopen(url, timeout=5) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/plain")
            body = resp.read().decode()
        assert "anonymizer_pipeline_inserts_total 4" in body

        m.batches += 1  # endpoint must render CURRENT counters per scrape
        with urllib.request.urlopen(url, timeout=5) as resp:
            assert "anonymizer_pipeline_inserts_total 5" in resp.read().decode()

        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/other", timeout=5) as resp:
            assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        srv.stop()
