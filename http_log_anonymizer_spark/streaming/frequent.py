"""Streaming frequent-items (heavy hitters) — a Misra-Gries counter
summary of an unbounded stream, maintained in ``foreachBatch``.

Misra-Gries summaries are MERGEABLE (Agarwal et al., Mergeable
Summaries, PODS 2012): combining two m-counter summaries and reducing
back to m counters preserves the deterministic error bound
``exact - estimate <= N / (m + 1)`` over the concatenated input. This
sink exploits exactly that, the same way ``streaming/reservoir.py``
exploits reservoir mergeability:

per micro-batch
  1. exact per-item counts WITHIN the batch (one groupBy with map-side
     combine — the batch is a micro-batch, so this is small);
  2. merge with the persisted summary by summing counts per item;
  3. if more than ``m`` items survive, apply the Misra-Gries
     reduction: subtract the (m+1)-th largest count (count-desc /
     item-asc order) from every counter and drop the non-positive
     ones. Fully deterministic — ties all fall together, no arbitrary
     selection — so every engine replays it identically;
  4. persist the <= m surviving counters as the next epoch
     (:class:`~http_log_anonymizer_spark.streaming.reservoir.EpochStateSink`
     crash-safe epoch protocol: torn writes are overwritten by replay,
     the pre-batch epoch survives until a later batch supersedes it).

Guarantees (asserted in tests/test_streaming_frequent.py):
- underestimates only: ``estimate <= exact`` for every reported item;
- bounded error: ``exact - estimate <= N / (m + 1)`` with N the total
  rows seen so far;
- completeness: every item with true frequency > N/(m+1) IS in the
  summary (the heavy-hitter contract);
- restart-parity: state equals the same fold run without restarts.

State is <= m rows regardless of stream length. The batch counterpart
for one-shot data is ``frequent_resources_sketch`` (approx_top_k) in
plans/analytics.py; this sink is its unbounded-stream twin with an
explicit, engine-replayable reduction instead of an opaque sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from http_log_anonymizer_spark.streaming.reservoir import EpochStateSink


class StreamingFrequentItemsSink(EpochStateSink):
    """foreachBatch writer maintaining a Misra-Gries summary of at most
    ``m`` (item, cnt) counters over ``item_col``. Same state/checkpoint
    contract as the reservoir sink."""

    def __init__(self, base_dir: str, m: int, item_col: str = "item") -> None:
        self.base_dir = base_dir
        self.m = m
        self.item_col = item_col

    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = f"b{batch_id}"
        self._housekeep(tag)
        if batch_df.isEmpty():
            return  # replaying an empty batch is a no-op
        state = self._read_state(spark, tag)

        counts = batch_df.groupBy(F.col(self.item_col).alias("item")).agg(
            F.count("*").alias("cnt")
        )
        if state is not None:
            counts = (
                counts.unionByName(state.select("item", "cnt"))
                .groupBy("item")
                .agg(F.sum("cnt").alias("cnt"))
            )
        counts = counts.persist()
        if counts.count() > self.m:
            # Misra-Gries reduction: T = the (m+1)-th largest counter
            # (count-desc, item-asc); subtract T everywhere, keep > 0.
            # One tiny ordered limit + a 1-row broadcast — no driver
            # collect, no full sort (TakeOrderedAndProject).
            t = (
                counts.orderBy(F.desc("cnt"), "item")
                .limit(self.m + 1)
                .agg(F.min("cnt").alias("t"))
            )
            reduced = (
                counts.crossJoin(F.broadcast(t))
                .select("item", (F.col("cnt") - F.col("t")).alias("cnt"))
                .filter(F.col("cnt") > 0)
            )
        else:
            reduced = counts
        self._write_epoch(reduced, tag)
        counts.unpersist()
