"""Blocked-GEMM cosine similarity — the vectorized alternative to the
Catalyst higher-order-function dot product.

Catalyst's zip_with/aggregate folds are interpreted (CodegenFallback):
fine for per-row feature math, but an all-pairs similarity scan does
pairs x dim interpreted ops. This operator broadcasts the (unit-
normalized) corpus as one numpy matrix and lets each partition compute
its block of the similarity matrix with a single BLAS matmul —
(block x dim) @ (dim x N) — emitting only pairs above the threshold.

Scale shape: the corpus matrix must fit in executor memory to be
broadcast (N x dim x 4 bytes; 1M x 256-d float32 = 1 GB — the practical
ceiling). Beyond that, shard the right side and union the runs, or
prune candidates with LSH first (plans/similarity.py). Results are
float64 BLAS sums — NOT bit-identical to the fold-based path, so
equality tests compare at a tolerance; the Catalyst path remains the
exact-determinism oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

PAIR_SCHEMA = StructType(
    [
        StructField("vec_a", LongType()),
        StructField("vec_b", LongType()),
        StructField("cos", DoubleType()),
    ]
)


def gemm_neardup_pairs(units: DataFrame, threshold: float) -> DataFrame:
    """All-pairs cosine >= threshold over a (vec_id, ue) unit-vector
    DataFrame, computed as blocked matrix products. Emits vec_a < vec_b.
    """
    spark = units.sparkSession
    rows = units.collect()  # corpus matrix: broadcast to every task
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["ue"] for r in rows], dtype=np.float64)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            blk_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            blk = np.array(list(pdf["ue"]), dtype=np.float64)
            sims = blk @ all_mat.T  # (block x N) in one BLAS call
            li, ri = np.nonzero(sims >= threshold)
            la, ra = blk_ids[li], all_ids[ri]
            keep = la < ra  # dedupe symmetric pairs, drop self
            yield pd.DataFrame(
                {"vec_a": la[keep], "vec_b": ra[keep], "cos": sims[li, ri][keep]}
            )

    return units.mapInPandas(block, PAIR_SCHEMA)
