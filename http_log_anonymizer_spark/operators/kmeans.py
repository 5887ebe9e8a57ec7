"""K-means (Lloyd's) over embedding columns — the index-building
primitive behind IVF ANN (coarse quantizer cells) and the second
iterative distributed algorithm in the engine (with
operators/components.py).

Design:
- deterministic seeding: the k vectors with the smallest md5-based
  hash of their id — reproducible across runs and engines, no RNG;
- assignment is vectorized: centroids (k x dim, tiny) ship in the
  mapInPandas closure and each Arrow batch does one numpy argmin over
  a batch x k distance matrix;
- update collects only (cluster, partial_sum, count) per partition —
  k x dim doubles per task — then the driver reduces and re-broadcasts;
- stops when no assignment changes (or max_iter).

At 100 TB: per-iteration cost is one scan + one tiny shuffle of
partial sums; centroids stay driver-side (k x dim is KBs for any sane
k). The classic MLlib KMeans does the same dance; this implementation
exists so the engine has no MLlib dependency and the mechanics stay
inspectable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

ASSIGN_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("cluster", IntegerType())]
)


def _seed_centroids(df: DataFrame, k: int) -> np.ndarray:
    """Deterministic seeds: k vectors minimizing md5('seed|<id>')."""
    seeds = (
        df.select("vec_id", "embedding")
        .withColumn(
            "h",
            F.conv(
                F.substring(F.md5(F.concat(F.lit("seed|"), F.col("vec_id").cast("string"))), 1, 15),
                16,
                10,
            ).cast("long"),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    return np.array([r["embedding"] for r in seeds], dtype=np.float64)


def kmeans(
    df: DataFrame, k: int = 8, max_iter: int = 25
) -> tuple[DataFrame, np.ndarray, list[float]]:
    """Cluster (vec_id, embedding) rows.

    Returns (assignments DataFrame, final centroids, per-iteration
    inertia history). Assignments are deterministic given the data.
    """
    spark = df.sparkSession
    data = df.select("vec_id", "embedding")
    centroids = _seed_centroids(data, k)
    prev_assign: DataFrame | None = None
    history: list[float] = []

    for _ in range(max_iter):
        cent = centroids  # capture by value for the closure

        def assign(batches):
            for pdf in batches:
                mat = np.array(list(pdf["embedding"]), dtype=np.float64)
                d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].astype("int64"),
                        "cluster": d2.argmin(axis=1).astype("int32"),
                    }
                )

        assignments = data.mapInPandas(assign, ASSIGN_SCHEMA).localCheckpoint()

        # update step: per-cluster component sums via one partial-agg pass
        joined = data.join(assignments, "vec_id")
        comp = joined.select(
            "cluster", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        stats = (
            comp.groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_centroids = centroids.copy()
        counts = np.zeros(k)
        for r in stats:
            new_centroids[r["cluster"], r["pos"]] = r["s"] / r["n"]
            counts[r["cluster"]] = r["n"]
        # empty clusters keep their previous centroid
        del counts  # (kept implicitly via new_centroids defaults)

        centroids = new_centroids
        if prev_assign is not None:
            changed = (
                assignments.alias("n")
                .join(prev_assign.alias("p"), "vec_id")
                .filter(F.col("n.cluster") != F.col("p.cluster"))
                .count()
            )
            if changed == 0:
                history.append(_inertia(data, centroids))
                return assignments, centroids, history
        prev_assign = assignments
        history.append(_inertia(data, centroids))

    return prev_assign, centroids, history


def _inertia(data: DataFrame, centroids: np.ndarray) -> float:
    """Sum of squared distances to nearest centroid (per-partition
    partial sums, one scan)."""
    from pyspark.sql.types import DoubleType

    cent = centroids

    def part(batches):
        for pdf in batches:
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).min(axis=1)
            yield pd.DataFrame({"d2": [float(d2.sum())]})

    parts = data.mapInPandas(part, StructType([StructField("d2", DoubleType())]))
    return float(parts.agg(F.sum("d2")).collect()[0][0])
