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
from http_log_anonymizer_spark.plans.registry import ScaleGate, register
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
  WHERE text IS NOT NULL
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
    # a NULL payload (no text to encode) is the T3 invalid-record
    # class: the Python decode kernel cannot batch None bytes — dropped
    # identically in both engines (the planted-NULL audit's crash).
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
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
  WHERE text IS NOT NULL
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

    # a NULL payload (no text to encode) is the T3 invalid-record
    # class: the Python decode kernel cannot batch None bytes — dropped
    # identically in both engines (the planted-NULL audit's crash).
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
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
  FROM documents WHERE text IS NOT NULL
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
    # a NULL payload (no text to encode) is the T3 invalid-record
    # class: the Python decode kernel cannot batch None bytes — dropped
    # identically in both engines (the planted-NULL audit's crash).
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
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


@register(
    "multimodal_phash_neardup",
    scale_gate=ScaleGate(
        table="documents",
        max_rows=100_000,
        wide_twin="multimodal_phash_wide_neardup",
        advice=(
            "At hamming <= 10 the 60-bit fingerprint's lossless bands "
            "carry only 5-6 bits, which degenerates past ~100k assets "
            "(measured: sf1/50k docs 24 s, sf10/500k killed at 9 min); "
            "the two-word 120-bit twin keeps 10-11-bit keys."
        ),
    ),
    oracle="""
-- corpus is pure ASCII: char indexing over text == byte indexing over
-- the encoded blob (the multimodal_resize_features precedent)
WITH m AS (
  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, n, text, unnest(generate_series(1, n)) AS i FROM m
),
pv AS (
  SELECT doc_id, n, ((i - 1) * 60) // n AS blk,
         CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS v
  FROM pos
),
tot AS (
  SELECT doc_id, CAST(sum(v) AS BIGINT) AS total, max(n) AS n
  FROM pv GROUP BY doc_id
),
blkagg AS (
  SELECT doc_id, blk, CAST(sum(v) AS BIGINT) AS sj,
         CAST(count(*) AS BIGINT) AS lj
  FROM pv GROUP BY doc_id, blk
),
sig AS (
  SELECT b.doc_id,
         CAST(sum(CASE WHEN b.sj * t.n > t.total * b.lj
                       THEN (CAST(1 AS BIGINT) << CAST(b.blk AS INT))
                       ELSE 0 END) AS BIGINT) AS phash
  FROM blkagg b JOIN tot t USING (doc_id)
  GROUP BY b.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.phash, b.phash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 10
ORDER BY doc_a, doc_b
""",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate MEDIA detection: block-mean perceptual hash
    (functions/multimodal.py:perceptual_hash — the aHash statistic
    over 60 byte blocks, where a real pipeline hashes the decoded 8x8
    luma thumbnail through the same mapInPandas slot) + the proven
    banded hamming join from the simhash family at the IMAGE operating
    point: hamming <= 10, the standard pHash radius on 64-bit
    fingerprints (text simhash runs <= 4 because token features are
    far less noisy than block means). Losslessness then needs 11
    pigeonhole bands of 5-6 bits — the width the simhash family
    measured as the ~1M-asset knee, so the documented scale knob is
    the xwide two-word pattern (100-bit fingerprint -> 11 bands of 9
    bits) once a real corpus approaches that. Image/video
    dedup is the multimodal counterpart of dedup_simhash_wide: re-
    encoded or lightly edited copies of the same asset share block
    structure long after their byte streams diverge, and exact hashes
    miss them.

    Determinism: the fingerprint is pure integer arithmetic (block sum
    vs cross-multiplied overall mean), so the oracle replays it
    bit-for-bit from BLOB byte values and then verifies the candidate
    set with a BRUTE quadratic join — parity therefore PROVES the
    banded join lossless on the corpus, the dedup_prefix_filter_join
    standard.

    Scale shape: one Arrow-batched mapInPandas pass computes the
    fingerprint (media bytes never leave the executor, constant memory
    per task), then everything is the dedup_simhash_wide plan: 5-band
    equi-join, first-match dedup without a distinct, candidates
    n^2 / 2^12 per band. The Python leg is per-byte-linear and
    embarrassingly parallel; at real-image sizes it is the decode cost
    (a thumbnail per asset), the canonical mapInPandas slot."""
    from http_log_anonymizer_spark.functions.multimodal import perceptual_hash
    from http_log_anonymizer_spark.plans.dedup import (
        band_widths,
        simhash_banded_pairs,
    )

    d = load_table(spark, sf_dir, "documents", spread=True)
    # zero-byte payloads carry no block statistic (the oracle's per-byte
    # unnest drops them; an all-zero fingerprint would false-pair every
    # empty asset) — exclude them explicitly on both engines
    media = d.select("doc_id", F.encode("text", "utf-8").alias("data")).filter(
        F.octet_length("data") > 0
    )
    sig = perceptual_hash(media).withColumnRenamed("phash", "simhash").cache()
    sig.count()
    return simhash_banded_pairs(
        sig, hamming_max=10, widths=band_widths(60, 10)
    ).orderBy("doc_a", "doc_b")


# 11 lossless bands for hamming <= 10 over two 60-bit words, none
# straddling a word boundary: 6 x 10-bit keys on word 0, 5 x 12-bit on
# word 1 (the dedup_simhash_xwide layout rule).
_PHASH_WIDE_BANDS = tuple(
    [(0, off, 10) for off in range(0, 60, 10)]
    + [(1, off, 12) for off in range(0, 60, 12)]
)


@register(
    "multimodal_phash_wide_neardup",
    oracle="""
-- corpus is pure ASCII: char indexing over text == byte indexing over
-- the encoded blob (the multimodal_resize_features precedent)
WITH m AS (
  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, n, text, unnest(generate_series(1, n)) AS i FROM m
),
pv AS (
  SELECT doc_id, n, ((i - 1) * 120) // n AS blk,
         CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS v
  FROM pos
),
tot AS (
  SELECT doc_id, CAST(sum(v) AS BIGINT) AS total, max(n) AS n
  FROM pv GROUP BY doc_id
),
blkagg AS (
  SELECT doc_id, blk, CAST(sum(v) AS BIGINT) AS sj,
         CAST(count(*) AS BIGINT) AS lj
  FROM pv GROUP BY doc_id, blk
),
sig AS (
  SELECT b.doc_id,
         CAST(sum(CASE WHEN b.blk < 60 AND b.sj * t.n > t.total * b.lj
                       THEN (CAST(1 AS BIGINT) << CAST(b.blk AS INT))
                       ELSE 0 END) AS BIGINT) AS sig0,
         CAST(sum(CASE WHEN b.blk >= 60 AND b.sj * t.n > t.total * b.lj
                       THEN (CAST(1 AS BIGINT) << CAST(b.blk - 60 AS INT))
                       ELSE 0 END) AS BIGINT) AS sig1
  FROM blkagg b JOIN tot t USING (doc_id)
  GROUP BY b.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sig0, b.sig0)) + bit_count(xor(a.sig1, b.sig1))
         AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig0, b.sig0)) + bit_count(xor(a.sig1, b.sig1)) <= 10
ORDER BY doc_a, doc_b
""",
)
def multimodal_phash_wide_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media near-dup SCALE tier: two-word 120-bit block-mean
    perceptual hash (finer blocks, each 60-bit slice one positive
    BIGINT — functions/multimodal.py:perceptual_hash_words) joined by
    the multi-word banded machinery of dedup_simhash_xwide. Same
    absolute radius as the gated 60-bit tier (hamming <= 10), so the
    11 pigeonhole bands now carry 10-11-bit keys instead of 5-6 —
    candidates per band drop ~2^5, which is exactly the knee the
    60-bit tier hits past ~100k assets (its gate points here). The
    wider fingerprint makes 10/120 a stricter RELATIVE threshold —
    the Manku et al. trade: high-precision near-dup at scale, with
    the 60-bit tier keeping the dense small-corpus report role.

    Determinism and losslessness exactly as the 60-bit tier: integer
    block statistic, brute quadratic oracle, parity proves the banded
    join drops nothing."""
    from http_log_anonymizer_spark.functions.multimodal import (
        perceptual_hash_words,
    )
    from http_log_anonymizer_spark.plans.dedup import simhash_banded_pairs_words

    d = load_table(spark, sf_dir, "documents", spread=True)
    # zero-byte payloads excluded as in the 60-bit tier (oracle parity
    # + no all-zero-fingerprint false pairs)
    media = d.select("doc_id", F.encode("text", "utf-8").alias("data")).filter(
        F.octet_length("data") > 0
    )
    sig = perceptual_hash_words(media, word_bits=(60, 60)).cache()
    sig.count()
    return simhash_banded_pairs_words(
        sig, bands=_PHASH_WIDE_BANDS, hamming_max=10
    ).orderBy("doc_a", "doc_b")
