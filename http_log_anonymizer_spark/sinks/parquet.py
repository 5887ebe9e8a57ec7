"""Parquet sink — the self-contained stand-in for the ClickHouse table
(SURVEY §1.3: monthly-partitioned parquet + dedup on the sort key
replaces ReplacingMergeTree for correctness testing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from http_log_anonymizer_spark.schema import PARTITION_FORMAT, SORT_KEY


class ParquetSink:
    """foreachBatch writer appending monthly-partitioned parquet.

    ``dedup`` applies the ReplacingMergeTree sort-key collapse per batch
    (full FINAL semantics are a read-side dropDuplicates over the table,
    matching ClickHouse's eventual merge).
    """

    def __init__(self, path: str, dedup: bool = False) -> None:
        self.path = path
        self.dedup = dedup

    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df
        if self.dedup and set(SORT_KEY) <= set(df.columns):
            df = df.dropDuplicates(SORT_KEY)
        if "timestamp" in df.columns:
            df = df.withColumn("month", F.date_format("timestamp", PARTITION_FORMAT))
            df.write.mode("append").partitionBy("month").parquet(self.path)
        else:
            df.write.mode("append").parquet(self.path)


def compaction_plan(spark, path: str, target_bytes: int = 128 << 20) -> dict:
    """Inspect a parquet table directory and size a compaction: total
    bytes, current file count, and the output partition count that
    bin-packs to ``target_bytes`` files.

    Small-files pathology is the steady-state failure mode of any
    streaming parquet sink (one file per micro-batch per partition —
    a day of 1-minute batches over 32 partitions is ~46k files): NameNode
    /object-store metadata pressure and per-file open cost dominate
    reads long before data size does. Uses the Hadoop FileSystem API so
    the same code paths work for file://, hdfs:// and s3a:// URIs.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    it = fs.listFiles(p, True)
    n_files, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n_files += 1
        total += st.getLen()
    n_out = max(1, -(-total // target_bytes))
    return {
        "n_files": n_files,
        "total_bytes": int(total),
        "target_bytes": int(target_bytes),
        "n_output_files": int(n_out),
    }


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
    sort_within: list[str] | None = None,
) -> dict:
    """Rewrite a small-files parquet table into ``n_output_files``
    evenly-sized files (one shuffle: repartition by round-robin evens
    out skewed inputs, unlike coalesce, which merges adjacent splits
    and inherits their skew). ``sort_within`` optionally sorts rows
    inside each output file (sortWithinPartitions — NO global sort) so
    min/max column statistics stay selective after compaction, the same
    reason the Z-order operator exists. Returns the plan it executed.

    At 100 TB this runs per partition-directory (e.g. per month) as a
    maintenance job; the shuffle moves each partition's bytes once.
    """
    # Overwrite-while-reading guard: Spark's built-in same-path check
    # compares raw strings, so a trailing slash, file:// prefix or
    # symlink spelling of the same directory would slip past it and
    # delete the source mid-read (ADVICE r02). Resolve both through the
    # Hadoop FileSystem (qualified URI + local symlink resolution) and
    # refuse identical targets.
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def _qualified(path: str) -> str:
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(hconf)
        q = fs.makeQualified(p)
        uri = q.toUri()
        if uri.getScheme() == "file":
            import os

            return "file://" + os.path.realpath(uri.getPath())
        return q.toString().rstrip("/")

    if _qualified(src) == _qualified(dst):
        raise ValueError(
            f"compact_parquet: src and dst resolve to the same location "
            f"({_qualified(src)}); write to a temp dir and rename instead"
        )
    plan = compaction_plan(spark, src, target_bytes)
    df = spark.read.parquet(src).repartition(plan["n_output_files"])
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    df.write.mode("overwrite").parquet(dst)
    return plan
