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

from http_log_anonymizer_spark.functions.multimodal import (
    decode_media_meta,
    extract_resize_features,
)
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
  CAST(sum(octet_length(data)) AS BIGINT) AS total_bytes,
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
    # DuckDB's octet_length is BIGINT; Spark's is INT — cast so max()
    # agrees in width (the driver's value hash is type-sensitive).
    blen = F.octet_length("data").cast("long")
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


@register(
    "multimodal_frame_sample",
    oracle="""
-- the corpus is pure ASCII (octet_length == length for every doc), so
-- char indexing over the text equals byte indexing over the blob
WITH m AS (
  SELECT doc_id, text AS data, octet_length(encode(text)) AS n FROM documents
),
idx AS (
  SELECT doc_id, data, n,
         unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT), 4)) AS frame_idx
  FROM m
),
frames AS (
  SELECT
    doc_id,
    CAST(frame_idx AS INT) AS frame_idx,
    CAST(least(64, n - frame_idx * 64) AS BIGINT) AS frame_bytes,
    CAST(list_sum(list_transform(
      range(1, CAST(least(64, n - frame_idx * 64) AS BIGINT) + 1),
      i -> ascii(substr(data, CAST(frame_idx * 64 + i AS INT), 1))
    )) AS BIGINT) AS frame_checksum
  FROM idx
)
SELECT
  CAST(count(*) AS BIGINT) AS n_frames,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(sum(frame_bytes) AS BIGINT) AS total_bytes,
  CAST(sum(frame_checksum) AS BIGINT) AS total_checksum
FROM frames
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: binary payloads split into 64-byte
    'frames', every 4th sampled, per-frame checksum — one input row
    fans out to many (mapInPandas generator). Summarized corpus-wide so
    the oracle (byte-indexing arithmetic over BLOBs) verifies every
    sampled frame boundary and checksum."""
    from http_log_anonymizer_spark.functions.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    m = d.select("doc_id", F.encode("text", "utf-8").alias("data"))
    frames = sample_frames(m)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("frame_bytes").alias("total_bytes"),
        F.sum("frame_checksum").alias("total_checksum"),
    )


@register(
    "multimodal_resize_features",
    oracle="""
-- corpus is pure ASCII: char indexing over text == byte indexing over blob
WITH m AS (
  SELECT doc_id, source, text AS data, octet_length(encode(text)) AS n
  FROM documents
),
meta AS (
  SELECT doc_id, source, data, n,
         n % 640 + 1 AS w, (n * 7) % 480 + 1 AS h
  FROM m
),
resized AS (
  SELECT doc_id, source, data, n,
         greatest(1, (w * 64) // greatest(w, h)) AS new_w,
         greatest(1, (h * 64) // greatest(w, h)) AS new_h
  FROM meta
),
feats AS (
  SELECT source, new_w, new_h,
         list_transform(range(0, 8), b ->
           list_sum(list_transform(range(1, CAST(n + 1 AS BIGINT)),
             i -> CASE WHEN ascii(substr(data, CAST(i AS INT), 1)) // 32 = b
                       THEN 1 ELSE 0 END))
         ) AS f
  FROM resized
)
SELECT source,
       count(*) AS n_media,
       round(avg(new_w), 4) AS avg_w,
       round(avg(new_h), 4) AS avg_h,
       CAST(sum(f[1]) AS BIGINT) AS bin0,
       CAST(sum(f[2]) AS BIGINT) AS bin1,
       CAST(sum(f[3]) AS BIGINT) AS bin2,
       CAST(sum(f[4]) AS BIGINT) AS bin3
FROM feats
GROUP BY source
ORDER BY source
""",
)
def multimodal_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + feature-extraction over binary media
    (functions/multimodal.py:extract_resize_features): thumbnail
    dimensions from integer box-fit math and a fixed-size byte-histogram
    feature vector per payload (the binary-in / typed-vector-out
    contract a real encoder fills), aggregated per source. The oracle
    recomputes every thumbnail dimension and histogram bin from BLOB
    arithmetic — only the first 4 of 8 bins are projected (ASCII text
    never populates the upper bins)."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select("doc_id", "source", F.encode("text", "utf-8").alias("data"))
    feats = extract_resize_features(m)
    return (
        feats.groupBy("source")
        .agg(
            F.count("*").alias("n_media"),
            F.round(F.avg("new_w"), 4).alias("avg_w"),
            F.round(F.avg("new_h"), 4).alias("avg_h"),
            F.sum(F.element_at("features", 1)).alias("bin0"),
            F.sum(F.element_at("features", 2)).alias("bin1"),
            F.sum(F.element_at("features", 3)).alias("bin2"),
            F.sum(F.element_at("features", 4)).alias("bin3"),
        )
        .orderBy("source")
    )
