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
