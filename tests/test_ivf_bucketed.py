"""IVF index stored BUCKETED BY CELL: the scan-side shuffle of the
cogrouped per-cell kernel disappears (SCALE.md's 'a production index
stores the reconstruction bucketed by cell so the scan shuffle is
free' — here made real and plan-asserted), and results are identical
to the unbucketed scan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from http_log_anonymizer_spark.operators.ivf import ivf_probe_cells, ivf_scan_topk
from http_log_anonymizer_spark.operators.bucketing import write_bucketed
from http_log_anonymizer_spark.streaming.ann_index import assign_rows

_DIM = 8
_N_BUCKETS = 8


def _centroids():
    # 8 well-separated cells on coordinate axes
    return [[4.0 if d == c else 0.0 for d in range(_DIM)] for c in range(_DIM)]


def _corpus(spark, n=400):
    rows = []
    for i in range(n):
        axis = i % _DIM
        vec = [(1.0 if d == axis else 0.0) + ((i * 31 + d * 7) % 13) / 26.0
               for d in range(_DIM)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange hashpartitioning", plan))


def test_bucketed_index_scan_drops_the_index_side_exchange(spark, tmp_path):
    cents = _centroids()
    u = assign_rows(_corpus(spark), cents)
    q = (
        _corpus(spark)
        .filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qemb"),
            F.col("embedding").alias("qe"),
        )
    )
    probed = ivf_probe_cells(q, cents, nprobe=3)

    plain = ivf_scan_topk(u, probed, 5)
    n_plain = _exchanges(plain)

    spark.sql("DROP TABLE IF EXISTS ivf_idx_bucketed_test")
    write_bucketed(
        u, "ivf_idx_bucketed_test", ["label"], _N_BUCKETS,
        path=str(tmp_path / "idx"),
    )
    idx = spark.table("ivf_idx_bucketed_test")
    bucketed = ivf_scan_topk(idx, probed, 5)
    n_bucketed = _exchanges(bucketed)

    # the index side's Exchange is gone; the probe side + rank window
    # remain (the probe side is query-proportional — tiny — and the
    # window ranks q*nprobe*(k+margin) rows)
    assert n_bucketed == n_plain - 1, (n_plain, n_bucketed)
    assert "Bucketed: true" in (
        bucketed._jdf.queryExecution().executedPlan().toString()
    )

    # identical results, row for row
    a = [(r.query_id, r.neighbor_id, r.rank, r.cos) for r in plain.collect()]
    b = [(r.query_id, r.neighbor_id, r.rank, r.cos) for r in bucketed.collect()]
    assert a == b and len(a) > 0
    spark.sql("DROP TABLE IF EXISTS ivf_idx_bucketed_test")
