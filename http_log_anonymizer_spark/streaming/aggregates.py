"""Streaming pre-aggregated totals — Stage 3 of the build plan
(SURVEY.md §7): the Spark-native version of the ClickHouse rollup the
reference README demands ("ready-made totals of served traffic for any
combination of resource ID, HTTP status, cache status and IP address",
README.md:59-63), maintained incrementally instead of merge-on-read.

The watermark is a deliberate semantic extension: the reference carries
event time but never compares it to processing time (SURVEY §2.5 — no
lateness handling). Documented here per SURVEY §7 hard-part 5: state
for windows older than the watermark is dropped, so unbounded streams
run in bounded state. Set ``delay`` to the max expected Kafka consumer
lag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOTALS_DIMENSIONS = ["resource_id", "response_status", "cache_status", "remote_addr"]


def streaming_totals(
    rows: DataFrame,
    window: str = "1 minute",
    delay: str = "2 minutes",
    dimensions: list[str] | None = None,
) -> DataFrame:
    """Windowed grouped totals with a watermark.

    One stateful aggregation; map-side partial aggregation applies
    before the shuffle on (window, dims), so state size tracks group
    cardinality, not input rate. Output mode 'update' emits changed
    groups each trigger (the incremental rollup); 'append' would emit
    only finalized windows.
    """
    dims = dimensions or TOTALS_DIMENSIONS
    return (
        rows.withWatermark("timestamp", delay)
        .groupBy(F.window("timestamp", window).alias("w"), *dims)
        .agg(
            F.count("*").alias("cnt"),
            F.sum("bytes_sent").alias("traffic"),
        )
        .select(F.col("w.start").alias("window_start"), *dims, "cnt", "traffic")
    )


def streaming_dedup(rows: DataFrame, keys: list[str], delay: str = "2 minutes") -> DataFrame:
    """Streaming exactly-once upgrade (F9): drop sort-key duplicates
    within the watermark horizon — the streaming analog of
    ReplacingMergeTree's eventual dedup (lib.rs:99-125).

    State-retention caveat: ``dropDuplicates`` only reclaims state for
    keys that INCLUDE the event-time column (as the reference's sort key
    does — callers here pass ``timestamp`` in ``keys``). For dedup on a
    business key alone use :func:`streaming_dedup_within_watermark`,
    which expires state by watermark regardless of key shape."""
    return rows.withWatermark("timestamp", delay).dropDuplicates(keys)


def streaming_dedup_within_watermark(
    rows: DataFrame, keys: list[str], delay: str = "2 minutes"
) -> DataFrame:
    """Dedup on a business key with bounded state even though the key
    carries no event time: ``dropDuplicatesWithinWatermark`` guarantees
    no duplicates for events within the watermark delay of each other
    and expires key state once the watermark passes it — the semantics
    an at-least-once replay (F8) needs when replayed rows arrive with
    RE-STAMPED timestamps (a plain key dedup would keep state forever;
    a sort-key dedup would see distinct timestamps and keep both
    rows)."""
    return rows.withWatermark("timestamp", delay).dropDuplicatesWithinWatermark(keys)


def streaming_session_totals(
    rows: DataFrame,
    gap: str = "5 minutes",
    keys: list[str] | None = None,
    delay: str = "2 minutes",
) -> DataFrame:
    """Event-time SESSION windows on a stream: requests separated by
    less than ``gap`` merge into one session per key. Session windows
    are stateful-merging aggregations (a late row can FUSE two open
    sessions), which is exactly what the native ``session_window``
    operator + watermark handle; sessions emit once the watermark
    passes their close. The batch twin is ``session_window_agg``'s
    grouping — equivalence is asserted in
    tests/test_streaming_aggregates.py."""
    keys = keys or ["remote_addr"]
    return (
        rows.withWatermark("timestamp", delay)
        .groupBy(F.session_window("timestamp", gap).alias("w"), *keys)
        .agg(F.count("*").alias("n_requests"), F.sum("bytes_sent").alias("bytes"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_requests",
            "bytes",
        )
    )


def enrich_with_static(rows: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Stream-static join: enrich a streaming DataFrame with a batch
    dimension table. Spark re-plans the static side per micro-batch
    (picking up dim-table updates between batches) and broadcasts it,
    so the stream never shuffles — the standard pattern for decorating
    a 100 TB/day stream with slowly-changing reference data. No
    watermark is needed: the static side is bounded, so no join state
    accumulates."""
    return rows.join(F.broadcast(dim), on, "left")
