"""Exact brute-force cosine top-k — vectorized, order-preserving.

The Catalyst formulation (broadcast the queries, `dot()` fold per
(candidate, query) pair, global per-query window) is exact but pays two
scale taxes: the zip_with/aggregate fold is interpreted (CodegenFallback
— ~30 s for 200 queries x 20k candidates at sf1), and the rank window
shuffles ALL corpus x queries scored rows. This operator fixes both
while staying BIT-IDENTICAL to the fold:

- numpy computes the score block one DIMENSION at a time —
  ``acc += outer(Q[:, d], C[:, d])`` — so every (query, candidate)
  element accumulates ``0.0 + t0 + t1 + ...`` in exactly the fold's
  (and the SQL sum chain's) IEEE order, just vectorized across pairs
  instead of across dimensions. A BLAS matmul would be ~2x faster but
  pairwise-sums, breaking bit-parity with the oracle; see
  operators/gemm.py for that tradeoff (threshold work tolerates it,
  rank boundaries don't).
- each Arrow batch emits only its LOCAL top-k per query (selected with
  the same rounded-cos + neighbor-id comparator the final rank uses),
  so the shuffle carries partitions x queries x k candidate rows — not
  corpus x queries — and the final window ranks a tiny set.

The query set broadcasts (bounded workload, same contract as the
Catalyst BNLJ it replaces); the corpus only streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

_CAND_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cos_raw", DoubleType()),
    ]
)


def _round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """Spark/DuckDB ``round()`` semantics (half away from zero) —
    np.round is half-even. Used only to ORDER partial candidates; the
    emitted value is the raw double and the final F.round canonicalizes
    it, so a scaling ulp here can at worst swap equal-rounded
    candidates, which the k-margin absorbs."""
    p = 10.0**decimals
    return np.where(x >= 0, np.floor(x * p + 0.5), np.ceil(x * p - 0.5)) / p


def brute_topk(
    units: DataFrame,
    queries: DataFrame,
    k: int,
    round_decimals: int = 4,
    margin: int = 8,
    exclude_label: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): exact top-k cosine neighbors
    of every query over a (vec_id, ue) unit-vector corpus, excluding
    self-pairs. Ranking: rounded cos desc, neighbor_id asc — identical
    to the Catalyst/SQL formulation, bit-for-bit.

    ``margin`` extra candidates per (partition, query) absorb rounding
    ties at the k boundary.

    ``exclude_label=True`` additionally drops candidates whose
    ``label`` equals the query's ``xlabel`` (hard-negative mining:
    nearest neighbors from OTHER classes); both sides must then carry
    those columns."""
    spark = units.sparkSession
    q_cols = ["query_id", "qe"] + (["xlabel"] if exclude_label else [])
    q_rows = queries.select(*q_cols).collect()
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    qmat = np.array([r["qe"] for r in q_rows], dtype=np.float64)
    qlab = (
        np.array([r["xlabel"] for r in q_rows], dtype=np.int64)
        if exclude_label
        else None
    )
    b_q = spark.sparkContext.broadcast((qids, qmat, qlab))
    take = k + margin

    # Spread SMALL corpora across the cores: a replica-scaled or
    # single-file table arrives as one scan split, serializing the
    # whole scoring pass (measured 5.7 s -> ~1 s at sf1). Sized from n
    # and defaultParallelism — never by probing .rdd.getNumPartitions()
    # (AQE finalization; see operators/gemm.py). Large scans keep their
    # natural ~128 MiB splits.
    sc = spark.sparkContext
    n = units.count()
    if n <= 4096 * sc.defaultParallelism:
        units = units.repartition(min(sc.defaultParallelism, max(1, n // 512)))

    def gen(batches):
        ids_q, mat_q, lab_q = b_q.value
        nq, dim = mat_q.shape
        for pdf in batches:
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["ue"]), dtype=np.float64)
            clab = (
                pdf["label"].to_numpy(dtype=np.int64) if lab_q is not None else None
            )
            acc = np.zeros((nq, len(cids)))
            for d in range(dim):  # fold order: (0.0 + t0) + t1 + ...
                acc += np.multiply.outer(mat_q[:, d], cmat[:, d])
            r = _round_half_away(acc, round_decimals)
            out_q, out_n, out_c = [], [], []
            for qi in range(nq):
                mask = cids != ids_q[qi]
                if clab is not None:
                    mask &= clab != lab_q[qi]
                row_ids, row_r, row_raw = cids[mask], r[qi][mask], acc[qi][mask]
                sel = np.lexsort((row_ids, -row_r))[:take]
                out_q.append(np.full(len(sel), ids_q[qi], dtype=np.int64))
                out_n.append(row_ids[sel])
                out_c.append(row_raw[sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos_raw": np.concatenate(out_c),
                }
            )

    cand = units.mapInPandas(gen, _CAND_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", round_decimals).alias("cos"),
        )
        .select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
        .orderBy("query_id", "rank")
    )
