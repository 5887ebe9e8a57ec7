"""Blocked-GEMM cosine similarity — the vectorized alternative to the
Catalyst higher-order-function dot product.

Catalyst's zip_with/aggregate folds are interpreted (CodegenFallback):
fine for per-row feature math, but an all-pairs similarity scan does
pairs x dim interpreted ops. This operator shards the (unit-normalized)
corpus into broadcastable numpy matrices and lets each partition
compute its block of the similarity matrix with a single BLAS matmul —
(block x dim) @ (dim x shard) — emitting only pairs above the
threshold.

Scale shape: the RIGHT side is sharded, never broadcast whole. Each
shard is bounded to ``shard_bytes`` (default 128 MiB), so driver and
executor peak memory is one shard — not the corpus — and the ceiling
moves from "corpus fits in one broadcast" (~1 GB) to "corpus x passes
over the left side", the standard blocked-GEMM tradeoff. A 1M x 256-d
float64 corpus = 2 GB -> 16 shards of 128 MiB; each executor holds at
most a few shards at once (bounded by task concurrency). For corpora
where even one pass per shard is too slow, prune candidates with LSH
first (plans/similarity.py).

Results are float64 BLAS sums — NOT bit-identical to the fold-based
path, so equality tests compare at a tolerance; the Catalyst path
remains the exact-determinism oracle.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

PAIR_SCHEMA = StructType(
    [
        StructField("vec_a", LongType()),
        StructField("vec_b", LongType()),
        StructField("cos", DoubleType()),
    ]
)

_DEFAULT_SHARD_BYTES = 128 << 20

# Minimum rows a left-side block should hold before it is worth a
# dedicated partition (and so a dedicated Python worker): below this,
# per-worker overhead dominates the matmul.
_BLOCK_ROWS = 4096


def _pairs_vs_shard(units: DataFrame, shard_rows: list, threshold: float) -> DataFrame:
    """Pairs (a < b, cos >= threshold) between every left row and ONE
    collected corpus shard: broadcast the shard matrix, one BLAS matmul
    per Arrow batch."""
    spark = units.sparkSession
    ids = np.array([r["vec_id"] for r in shard_rows], dtype=np.int64)
    mat = np.array([r["ue"] for r in shard_rows], dtype=np.float64)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            blk_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            blk = np.array(list(pdf["ue"]), dtype=np.float64)
            sims = blk @ all_mat.T  # (block x shard) in one BLAS call
            li, ri = np.nonzero(sims >= threshold)
            la, ra = blk_ids[li], all_ids[ri]
            keep = la < ra  # dedupe symmetric pairs, drop self
            yield pd.DataFrame(
                {"vec_a": la[keep], "vec_b": ra[keep], "cos": sims[li, ri][keep]}
            )

    return units.mapInPandas(block, PAIR_SCHEMA)


def gemm_neardup_pairs(
    units: DataFrame,
    threshold: float,
    shard_bytes: int = _DEFAULT_SHARD_BYTES,
) -> DataFrame:
    """All-pairs cosine >= threshold over a (vec_id, ue) unit-vector
    DataFrame, computed as blocked matrix products against corpus
    shards of at most ``shard_bytes`` each. Emits vec_a < vec_b.

    Sharding keeps every materialized matrix (driver-side collect,
    broadcast, executor copy) bounded by ``shard_bytes`` regardless of
    corpus size; the runs union into one DataFrame, and a pair lands in
    exactly one shard's output (the shard owning vec_b), so no distinct
    is needed.
    """
    stats = units.select(
        F.count("*").alias("n"), F.first(F.size("ue")).alias("d")
    ).first()
    n = int(stats["n"])
    if n == 0:
        return units.sparkSession.createDataFrame([], PAIR_SCHEMA)
    rows_per_shard = max(1, shard_bytes // (int(stats["d"]) * 8))
    n_shards = max(1, -(-n // rows_per_shard))
    # Blocked GEMM wants FAT left blocks: one BLAS matmul per Arrow
    # batch amortizes the per-partition Python-worker cost (spawn +
    # pandas import + Arrow round-trip), so a block should hold
    # thousands of rows. Size the left side by ROWS, independent of the
    # scan's partitioning: a corpus below _BLOCK_ROWS*cores rows
    # repartitions down to ceil(n/_BLOCK_ROWS) blocks (locally that
    # collapses a 32-way spread of a tiny table to 1-2 workers); a
    # 100 TB corpus computes target >> current partitions and keeps its
    # scan parallelism untouched.
    target_blocks = max(1, -(-n // _BLOCK_ROWS))
    if units.rdd.getNumPartitions() > target_blocks:
        units = units.repartition(target_blocks)
    if n_shards == 1:
        return _pairs_vs_shard(units, units.collect(), threshold)

    # Deterministic shard assignment on vec_id; collect ONE shard at a
    # time so driver peak memory is a shard, not the corpus.
    sharded = units.select(
        "vec_id", "ue", F.pmod(F.hash("vec_id"), F.lit(n_shards)).alias("_shard")
    )
    runs = [
        _pairs_vs_shard(
            units,
            sharded.filter(F.col("_shard") == k).select("vec_id", "ue").collect(),
            threshold,
        )
        for k in range(n_shards)
    ]
    return reduce(DataFrame.unionByName, runs)
