"""Bucketed-table layout — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact equi-join is the exchange of
both sides. Spark's bucketed tables (``bucketBy`` on write) pre-hash
rows into a fixed number of files per partition; two tables bucketed on
the SAME key with the SAME bucket count join bucket-to-bucket: the
physical plan has NO Exchange on either side (asserted in
tests/test_operators.py). This is the batch analog of the reference
pipeline's per-key routing, and the layout a recurring daily join
(orders x lineitem, corpus x dedup-index) should be stored in.

Bucket pruning also applies: an equality filter on the bucket key scans
1/n of the files.

Usage notes for the cluster: pick n_buckets so a bucket of the LARGER
table fits an executor core's working set (~128-512 MB); both sides
must agree on n_buckets or Spark falls back to shuffling the smaller
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) parquet
    table. ``sort_cols`` defaults to the bucket key — sorted buckets
    let sort-merge joins skip the per-task sort too."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key. With matching
    layouts the plan is exchange-free; this helper only names the
    intent — the optimizer does the work from the catalog metadata."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
