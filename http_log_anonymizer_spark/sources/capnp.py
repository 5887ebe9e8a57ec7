"""Cap'n Proto decoder (S3) — wire schema http_log.capnp:3-13.

The reference decodes zero-copy in Rust (http_log.rs:39-69,
read_message_from_flat_slice_no_alloc at http_log.rs:45). In Spark the
decode must cross into Python, so it is Arrow-batched via mapInPandas
to amortize per-row overhead (SURVEY §7 hard part 1: per-row pycapnp is
slow; batch it).

pycapnp is not in this container, so the real decoder is import-gated;
``decode_capnp_stream`` raises NotImplementedError without it. The JSON
decoder (streaming/pipeline.py:json_decoder) is the test path — decode
correctness (field mapping, epoch-millis -> timestamp, reject-on-error)
is exercised there against the same schema contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from http_log_anonymizer_spark.schema import HTTP_LOG_SCHEMA, WIRE_FIELDS

CAPNP_SCHEMA_PATH = "/root/reference/http_log.capnp"


def _load_capnp():
    try:
        import capnp  # type: ignore

        return capnp.load(CAPNP_SCHEMA_PATH)
    except ImportError as exc:
        raise NotImplementedError(
            "capnp decode requires pycapnp, which this container lacks; "
            "use streaming.pipeline.json_decoder for the JSON test path"
        ) from exc


def decode_capnp_stream(df: DataFrame) -> DataFrame:
    """Decode a ``value: binary`` column of Cap'n Proto HttpLogRecord
    messages into HTTP_LOG_SCHEMA rows. Invalid payloads are dropped
    (reject-and-continue, source.rs:109-123)."""
    module = _load_capnp()  # raises NotImplementedError without pycapnp
    record_cls = module.HttpLogRecord

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            rows = []
            for payload in pdf["value"]:
                try:
                    with record_cls.from_bytes(payload) as msg:
                        rows.append(
                            {
                                "timestamp": pd.Timestamp(
                                    int(msg.timestampEpochMilli), unit="ms"
                                ),
                                "resource_id": int(msg.resourceId),
                                "bytes_sent": int(msg.bytesSent),
                                "request_time_milli": int(msg.requestTimeMilli),
                                "response_status": int(msg.responseStatus),
                                "cache_status": str(msg.cacheStatus),
                                "method": str(msg.method),
                                "remote_addr": str(msg.remoteAddr),
                                "url": str(msg.url),
                            }
                        )
                except Exception:
                    continue  # reject record, keep stream alive
            yield pd.DataFrame(rows, columns=[f.name for f in HTTP_LOG_SCHEMA.fields])

    return df.mapInPandas(decode, HTTP_LOG_SCHEMA)


__all__ = ["decode_capnp_stream", "CAPNP_SCHEMA_PATH", "WIRE_FIELDS"]
