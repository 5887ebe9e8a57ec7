"""Deterministic sampling & splits — training-data pipeline staples.

Random sampling is useless at 100 TB if it isn't reproducible across
reruns and engines; every split here is a pure function of the row key
via the md5-based hash64, so Spark, DuckDB, and any future engine agree
row-for-row (and adding data never reshuffles existing assignments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions.text import hash64, hash64_sql
from http_log_anonymizer_spark.plans.registry import register
from http_log_anonymizer_spark.sources.batch import load_table


@register(
    "train_val_test_split",
    oracle=f"""
WITH assigned AS (
  SELECT
    lang,
    CASE
      WHEN {hash64_sql("CAST(doc_id AS VARCHAR)", "split")} % 100 < 80 THEN 'train'
      WHEN {hash64_sql("CAST(doc_id AS VARCHAR)", "split")} % 100 < 90 THEN 'val'
      ELSE 'test'
    END AS split
  FROM documents
)
SELECT lang, split, count(*) AS n
FROM assigned
GROUP BY lang, split
ORDER BY lang, split
""",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split, deterministic per doc_id: stable
    under reruns, engine-independent, and append-only-safe (new docs
    don't move old ones between splits). Per-language counts verify the
    split is unbiased across strata."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash64(F.col("doc_id").cast("string"), "split") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "split")
    )


@register(
    "reservoir_sample",
    oracle=f"""
WITH ranked AS (
  SELECT
    doc_id, lang,
    {hash64_sql("CAST(doc_id AS VARCHAR)", "res")} AS pri,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)", "res")}, doc_id
    ) AS rnk
  FROM documents
)
SELECT doc_id, lang, rnk FROM ranked WHERE rnk <= 10
ORDER BY lang, rnk
""",
)
def reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic reservoir (k=10) via partial top-k
    pruning (operators/reservoir.py): each partition keeps only its k
    best-hash rows per stratum before anything shuffles, so a stratum
    too large for `stratified_sample`'s full window sort costs one scan
    plus a k-rows-per-partition shuffle. The oracle is the full window
    sort — both must select exactly the same rows."""
    from http_log_anonymizer_spark.operators.reservoir import reservoir_per_group

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        hash64(F.col("doc_id").cast("string"), "res").alias("pri"),
    )
    return (
        reservoir_per_group(
            d, group_cols=["lang"], k=10, priority_col="pri", tiebreak_cols=["doc_id"]
        )
        .select("doc_id", "lang", "rnk")
        .orderBy("lang", "rnk")
    )


@register(
    "stratified_sample",
    oracle=f"""
WITH ranked AS (
  SELECT
    doc_id, lang, n_chars,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)", "sample")}, doc_id
    ) AS rnk
  FROM documents
)
SELECT doc_id, lang, n_chars, rnk FROM ranked WHERE rnk <= 20
ORDER BY lang, rnk
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 20 docs per language, chosen by
    hash order (a reproducible 'random' shuffle). One window per
    stratum — no driver-side sampling, no collect."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        hash64(F.col("doc_id").cast("string"), "sample"), "doc_id"
    )
    return (
        d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 20)
        .orderBy("lang", "rnk")
    )


_U_DENOM = float(1 << 60)  # hash64 is 60-bit; (h+1)/2^60 is u in (0, 1]


@register(
    "weighted_reservoir_sample",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         round(-ln(({hash64_sql("CAST(doc_id AS VARCHAR)", "wres")} + 1) / {_U_DENOM:.1f})
               / n_chars, 9) AS pri
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS rnk
  FROM keyed
)
SELECT doc_id, lang, n_chars, rnk FROM ranked WHERE rnk <= 10
ORDER BY lang, rnk
""",
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED reservoir per stratum (Efraimidis-Spirakis A-ES): each
    row's priority is the exponential race -ln(u)/w with u derived from
    the deterministic hash and w = n_chars, so longer documents win
    proportionally more seats — the standard size-weighted sampler for
    training-data mixing. Selection = k smallest priorities per group,
    computed with the same partial top-k prune as reservoir_sample
    (operators/reservoir.py), so the scale contract is identical.
    Priorities round to 9 decimals in both engines before ranking (the
    only float in the pipeline; u and w are exact)."""
    from http_log_anonymizer_spark.operators.reservoir import reservoir_per_group

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(
            -F.log((hash64(F.col("doc_id").cast("string"), "wres") + 1) / F.lit(_U_DENOM))
            / F.col("n_chars"),
            9,
        ).alias("pri"),
    )
    return (
        reservoir_per_group(
            d, group_cols=["lang"], k=10, priority_col="pri", tiebreak_cols=["doc_id"]
        )
        .select("doc_id", "lang", "n_chars", "rnk")
        .orderBy("lang", "rnk")
    )
