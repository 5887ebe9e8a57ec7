"""Multimodal-column queries: binary payloads with typed metadata.

The test corpus has no real media, so the binary column is synthesized
deterministically (utf-8 encode of the document text — both engines
agree on octet_length), and the decode step is the deterministic fake
from functions/multimodal.py. The Spark-side plumbing (binary columns,
mapInPandas schema/batching, partition-parallel decode) is real and is
what these queries verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions.multimodal import decode_media_meta
from http_log_anonymizer_spark.plans.registry import register
from http_log_anonymizer_spark.sources.batch import load_table


@register(
    "multimodal_payload_stats",
    oracle="""
WITH m AS (
  SELECT doc_id, source, encode(text) AS data FROM documents
)
SELECT
  source,
  count(*) AS n_media,
  sum(octet_length(data)) AS total_bytes,
  max(octet_length(data)) AS max_bytes,
  round(avg(octet_length(data)), 4) AS avg_bytes
FROM m
GROUP BY source
ORDER BY source
""",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload statistics (JVM-only: encode + octet_length
    stay in codegen). The pattern for 'how much media per shard do I
    have' scans at 100 TB — metadata-only, payload never leaves the
    scan."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select("doc_id", "source", F.encode("text", "utf-8").alias("data"))
    blen = F.octet_length("data")
    return (
        m.groupBy("source")
        .agg(
            F.count("*").alias("n_media"),
            F.sum(blen).alias("total_bytes"),
            F.max(blen).alias("max_bytes"),
            F.round(F.avg(blen), 4).alias("avg_bytes"),
        )
        .orderBy("source")
    )


@register(
    "multimodal_decode_meta",
    bench=True,
    oracle="""
WITH m AS (
  SELECT doc_id, source, octet_length(encode(text)) AS n_bytes FROM documents
),
decoded AS (
  SELECT
    source,
    n_bytes,
    n_bytes % 640 + 1 AS width,
    (n_bytes * 7) % 480 + 1 AS height,
    CASE n_bytes % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS media_format
  FROM m
)
SELECT
  source,
  media_format,
  count(*) AS n,
  round(avg(width * height), 4) AS avg_pixels,
  max(n_bytes) AS max_bytes
FROM decoded
GROUP BY source, media_format
ORDER BY source, media_format
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode of binary media into typed
    metadata (width/height/format), aggregated per source+format. The
    decode itself is the deterministic stub (no media libs in the
    container — see functions/multimodal.py); schema, batching and
    partition parallelism are the real thing being exercised."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select("doc_id", "source", F.encode("text", "utf-8").alias("data"))
    decoded = decode_media_meta(m)
    return (
        decoded.groupBy("source", "media_format")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("width").cast("long") * F.col("height")), 4).alias(
                "avg_pixels"
            ),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("source", "media_format")
    )
