"""ClickHouse sink (S4/S5) — the reference's insert path re-expressed
as a foreachBatch writer.

Reference behavior (anonymizer/src/sink.rs):

- DDL bootstrap with retry, gated by CH__CREATE_TABLE (sink.rs:255-262,
  400-418; DDL text http_log.rs:91-111)           -> ``ensure_table``
- rows encoded as JSONCompactEachRow positional arrays with the
  timestamp truncated to unix seconds (http_log.rs:71-86, sink.rs:318)
                                                   -> ``encode_compact_json_rows``
- one block per request, rate-limited (sink.rs:303-331)
                                                   -> trigger cadence + RequestLimiter
- commit follows durable write (sink.rs:337-349)   -> foreachBatch +
                                                      checkpoint ordering (built-in)
- no insert retry (documented tradeoff lib.rs:213-218)
                                                   -> surface the exception;
                                                      Spark replays the batch

No ClickHouse server or client library exists in this container, so the
HTTP insert is import/connection-gated; encoding, DDL and pacing logic
are pure and unit-tested.
"""

from __future__ import annotations

import io
import json
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from http_log_anonymizer_spark.config import ClickHouseConfig
from http_log_anonymizer_spark.schema import (
    HTTP_LOG_SCHEMA,
    clickhouse_insert_ddl,
    clickhouse_table_ddl,
)
from http_log_anonymizer_spark.streaming.limiter import RequestLimiter

_JSON_ROW_SCHEMA = StructType([StructField("json", StringType())])


def encode_compact_json_row(row: dict) -> str:
    """One HttpLog row -> positional JSONCompactEachRow array
    (http_log.rs:71-86). Column order matches the insert DDL; the
    timestamp serializes as whole unix seconds (http_log.rs:75 —
    sub-second precision is truncated at the sink, SURVEY §1.2)."""
    ts = row["timestamp"]
    epoch_s = int(pd.Timestamp(ts).timestamp()) if not isinstance(ts, (int, float)) else int(ts)
    return json.dumps(
        [
            epoch_s,
            row["resource_id"],
            row["bytes_sent"],
            row["request_time_milli"],
            row["response_status"],
            row["cache_status"],
            row["method"],
            row["remote_addr"],
            row["url"],
        ],
        separators=(",", ":"),
    )


def encode_compact_json_rows(df: DataFrame) -> DataFrame:
    """Distributed row encoding via Arrow-batched mapInPandas — the
    CompactJsonRow stage (sink.rs:62, 285) without collecting to the
    driver."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"json": [encode_compact_json_row(r) for r in pdf.to_dict("records")]}
            )

    return df.mapInPandas(enc, _JSON_ROW_SCHEMA)


class ClickHouseSink:
    """foreachBatch writer targeting ClickHouse over HTTP.

    Usage: ``PipelineSpec(writer=ClickHouseSink(cfg).write, ...)``.
    """

    def __init__(self, cfg: ClickHouseConfig | None = None) -> None:
        from http_log_anonymizer_spark.streaming.limiter import shared_limiter

        self.cfg = cfg or ClickHouseConfig.from_env()
        # shared per endpoint: several streaming queries writing to the
        # same ClickHouse must share one token bucket (the nginx proxy
        # rate-limits per upstream, not per query)
        self.limiter = shared_limiter(
            self.cfg.url, self.cfg.rate_limit_s or self.cfg.default_rate_limit_s
        )
        self._table_ready = False

    # -- DDL bootstrap (S5) -------------------------------------------------
    def ensure_table(self, tries: int = 3, delay_s: float = 2.0) -> None:
        """CREATE TABLE IF NOT EXISTS with fixed-delay retry
        (async_retry analog, error.rs:76-89)."""
        if self._table_ready or not self.cfg.create_table:
            return
        import time as _time

        ddl = clickhouse_table_ddl(self.cfg.table)
        last: Exception | None = None
        for _ in range(tries):
            try:
                self._execute(ddl)
                self._table_ready = True
                return
            except Exception as exc:  # pragma: no cover - needs live server
                last = exc
                _time.sleep(delay_s)
        raise RuntimeError(f"DDL bootstrap failed after {tries} tries") from last

    # -- insert (S4) --------------------------------------------------------
    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        """Insert one micro-batch as a single JSONCompactEachRow request.
        Raises on failure — Spark retries/replays the batch and the
        checkpoint only commits after we return (F5/F8)."""
        self.ensure_table()
        wait = self.limiter.time_left()
        if wait > 0:  # pragma: no cover - pacing beyond trigger cadence
            import time as _time

            _time.sleep(wait)
        payload = "\n".join(
            r.json for r in encode_compact_json_rows(batch_df).collect()
        )
        query = f"{clickhouse_insert_ddl(self.cfg.table)} FORMAT JSONCompactEachRow"
        self._execute(query, body=payload)
        self.limiter.record_request()

    def _execute(self, query: str, body: str = "") -> None:  # pragma: no cover
        """Single-connection HTTP request (sink.rs:40-41's one-connection
        client: urllib opens/closes per call, serializing requests)."""
        data = (query + "\n" + body).encode()
        req = urllib.request.Request(
            self.cfg.url, data=data, headers={"X-ClickHouse-User": self.cfg.user}
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            if resp.status >= 300:
                raise RuntimeError(f"ClickHouse HTTP {resp.status}")
