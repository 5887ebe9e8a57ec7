"""Custom stateful streaming operator via applyInPandasWithState:
running per-key totals that survive across micro-batches.

This is the engine's extension point for operators Structured Streaming
lacks natively (SURVEY §2.6: the reference's extension surface is a
typeclass per transform; here it is a state-update function per key).
The example operator maintains, per ``remote_addr``, the running
request count and byte total — the live per-IP counters a traffic
dashboard reads — without re-aggregating history each trigger.

State is a single (count, bytes) pair per key: O(distinct keys) memory,
checkpointed by Spark; at 100 TB scale partition count spreads state
across executors and RocksDB state store keeps it off-heap.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("remote_addr", StringType()),
        StructField("total_requests", LongType()),
        StructField("total_bytes", LongType()),
    ]
)

_STATE_SCHEMA = "total_requests LONG, total_bytes LONG"


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    count, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        count += len(pdf)
        total += int(pdf["bytes_sent"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {"remote_addr": [key[0]], "total_requests": [count], "total_bytes": [total]}
    )


def running_ip_totals(rows: DataFrame) -> DataFrame:
    """Per-IP running totals across the stream's lifetime (grows-only
    state, no timeout — add a ProcessingTimeTimeout to age out idle
    IPs in a production deployment)."""
    return (
        rows.select("remote_addr", "bytes_sent")
        .groupBy("remote_addr")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 arbitrary-state API (transformWithStateInPandas): the modern
# form of the same operator — explicit named state handles, timers, and
# TTL support. Kept alongside applyInPandasWithState so both stateful
# extension points are exercised; outputs are identical.
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0, and requires a working protobuf (the state-server
    # protocol is protobuf-based; this container ships a broken
    # google.protobuf, so the operator is gated like pycapnp/Pillow)
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _TWS_STATE_SCHEMA = StructType(
        [
            StructField("total_requests", LongType()),
            StructField("total_bytes", LongType()),
        ]
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-key (count, bytes) accumulator with a named ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            # a StructType (not a DDL string) — the pre-init driver
            # worker has no session to parse DDL with
            self._state = handle.getValueState("totals", _TWS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            count, total = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                count += len(pdf)
                total += int(pdf["bytes_sent"].sum())
            self._state.update((count, total))
            yield pd.DataFrame(
                {
                    "remote_addr": [key[0]],
                    "total_requests": [count],
                    "total_bytes": [total],
                }
            )

        def close(self) -> None:
            pass

    def running_ip_totals_tws(rows: DataFrame) -> DataFrame:
        """transformWithStateInPandas version of running_ip_totals."""
        return (
            rows.select("remote_addr", "bytes_sent")
            .groupBy("remote_addr")
            .transformWithStateInPandas(
                statefulProcessor=RunningTotalsProcessor(),
                outputStructType=RUNNING_TOTALS_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover - older Spark
    running_ip_totals_tws = None
