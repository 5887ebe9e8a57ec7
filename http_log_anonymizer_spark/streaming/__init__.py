from http_log_anonymizer_spark.streaming.limiter import RequestLimiter
from http_log_anonymizer_spark.streaming.pipeline import (
    PipelineSpec,
    build_streaming_query,
    json_decoder,
)
from http_log_anonymizer_spark.streaming.telemetry import (
    LokiHandler,
    MetricsHttpServer,
    render_prometheus,
)

__all__ = [
    "RequestLimiter",
    "PipelineSpec",
    "build_streaming_query",
    "json_decoder",
    "LokiHandler",
    "MetricsHttpServer",
    "render_prometheus",
]
