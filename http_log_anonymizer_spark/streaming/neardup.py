"""Streaming ingest-time near-duplicate dedup — MinHash-LSH against a
persisted, append-only band index.

The batch registry proves the pieces (dedup_minhash_lsh end-to-end,
dedup_incremental_batch for the new-vs-corpus probe, the append-only
index contract in tests/test_incremental_dedup.py); this module wires
them into a Structured Streaming ``foreachBatch`` sink so a document
stream is near-deduped AS IT ARRIVES:

per micro-batch
  1. hash-shingle + MinHash-sign the batch (one narrow pass — the same
     ``hashed_shingle_transform``/``minhash_signatures`` the batch
     queries use, so streaming and backfill agree bit-for-bit);
  2. drop within-batch near-dups (keep-lowest-doc_id policy: a doc is
     dropped if it verifies against ANY lower-id batch doc — greedy,
     deterministic, no iteration; note this is a one-pass
     overapproximation on chains: in a batch where a~b and b~c but NOT
     a~c, c drops against the already-dropped b, whereas a sequential
     arrival would have kept it. Cross-batch drops compare against
     ACCEPTED docs only, so batch boundaries never drop more than
     sequential arrival would);
  3. probe the PERSISTED band index with the survivors' band keys
     (equi-join: cost is O(batch x collisions), never O(corpus));
     verify exact Jaccard against the persisted shingle store and drop
     hits — first-seen wins across the whole stream history;
  4. append accepted documents to the output table and their index +
     shingle rows to the state dirs.

State is three parquet directories (index/, shingles/, docs/) — plain
columnar tables, so the SAME index serves the nightly backfill jobs,
and state size is O(accepted docs), independent of stream length. At
100 TB the band index join is the standard shuffle-on-band-key; the
shingle store is only ever probed for verified candidates.

Exactly-once: appends happen inside foreachBatch before the checkpoint
commit, so a replayed batch re-appends — the same at-least-once +
idempotent-reader contract as the ClickHouse sink (dedup on doc_id at
read time, or run with ``dropDuplicatesWithinWatermark`` upstream for
exact keys).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans.dedup import (
    band_candidates,
    band_index,
    hashed_shingle_transform,
    minhash_signatures,
    verify_pairs,
)


class NearDupDedupSink:
    """foreachBatch writer: near-dedup a (doc_id, text, ...) stream
    against all previously ACCEPTED documents."""

    def __init__(self, base_dir: str) -> None:
        self.docs_dir = os.path.join(base_dir, "docs")
        self.index_dir = os.path.join(base_dir, "index")
        self.shingle_dir = os.path.join(base_dir, "shingles")

    def _have_state(self, spark) -> bool:
        # works for any Hadoop-visible FS, not just the local one
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(self.index_dir)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return fs.exists(p)

    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.persist()
        if batch.isEmpty():
            batch.unpersist()
            return

        sh = hashed_shingle_transform(batch).persist()
        bands = band_index(minhash_signatures(sh)).persist()

        # 1) within-batch: drop any doc verifying against a lower id
        intra = verify_pairs(band_candidates(bands, bands), sh)
        dropped_intra = intra.select(F.col("doc_b").alias("doc_id")).distinct()
        keep_bands = bands.join(dropped_intra, "doc_id", "left_anti")

        # 2) vs the persisted corpus: probe the index, verify against
        #    the shingle store (first-seen wins)
        if self._have_state(spark):
            corpus_bands = spark.read.parquet(self.index_dir)
            corpus_sh = spark.read.parquet(self.shingle_dir)
            cross = band_candidates(keep_bands, corpus_bands, ordered=False)
            hits = verify_pairs(cross, sh.unionByName(corpus_sh))
            dropped_vs_corpus = hits.select(
                F.col("doc_a").alias("doc_id")
            ).distinct()
            keep_bands = keep_bands.join(dropped_vs_corpus, "doc_id", "left_anti")

        accepted = keep_bands.select("doc_id").distinct()
        # 3) append accepted docs + their state rows
        batch.join(accepted, "doc_id").write.mode("append").parquet(self.docs_dir)
        keep_bands.write.mode("append").parquet(self.index_dir)
        sh.join(accepted, "doc_id").write.mode("append").parquet(self.shingle_dir)

        for df in (bands, sh, batch):
            df.unpersist()
