"""Scalar-function coverage: temporal features, JSON row encoding (T6),
array higher-order functions, sliding windows.

Cross-engine notes baked into the oracles:
- DuckDB ``dayofweek`` is 0-based Sunday; Spark is 1-based -> ``+1``.
- DuckDB ``date_trunc('week', ts)`` returns DATE -> cast to TIMESTAMP.
- DuckDB ``list_sum`` returns DECIMAL unless elements are cast DOUBLE.
- ``to_json(struct(...))`` serializes identically in both engines
  (no spaces, insertion order) — verified, which is what lets T6's
  JSONCompactEachRow-adjacent encoding be oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans.http_log import HTTP_LOG_SQL, http_log_view
from http_log_anonymizer_spark.plans.registry import register
from http_log_anonymizer_spark.sources.batch import load_table


@register(
    "time_features",
    oracle="""
SELECT
  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
  dayofweek(ts) + 1 AS dow,
  extract(hour FROM ts) AS hour,
  count(*) AS cnt,
  round(sum(value), 2) AS total
FROM events
GROUP BY 1, 2, 3
ORDER BY week, dow, hour
""",
)
def time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal feature extraction (trunc/day-of-week/hour) + grouped
    totals — the feature-engineering primitive for time-series models."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("week", "ts").alias("week"),
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("week", "dow", "hour")
    )


@register(
    "json_encode_rows",
    oracle=f"""
WITH {HTTP_LOG_SQL}
SELECT
  to_json(struct_pack(
    method := method,
    status := response_status,
    cache := cache_status
  )) AS j,
  count(*) AS cnt,
  CAST(sum(bytes_sent) AS BIGINT) AS traffic
FROM http_log
GROUP BY 1
ORDER BY j
""",
)
def json_encode_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 analog — JSON row encoding as a Catalyst expression
    (to_json(struct(...))), byte-identical across engines; grouped so
    the oracle verifies every encoded string."""
    log = http_log_view(spark, sf_dir)
    j = F.to_json(
        F.struct(
            F.col("method").alias("method"),
            F.col("response_status").alias("status"),
            F.col("cache_status").alias("cache"),
        )
    )
    return (
        log.groupBy(j.alias("j"))
        .agg(F.count("*").alias("cnt"), F.sum("bytes_sent").alias("traffic"))
        .orderBy("j")
    )


@register(
    "array_feature_stats",
    oracle="""
SELECT
  label,
  round(avg(len(list_filter(embedding, x -> x > 0))), 4) AS avg_pos,
  round(avg(list_sum(list_transform(embedding[1:8],
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS avg_sumsq8,
  count(*) AS n
FROM embeddings WHERE embedding IS NOT NULL
GROUP BY label
ORDER BY label
""",
)
def array_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (filter/transform/aggregate/slice)
    over embedding vectors — per-label stats, all JVM-side."""
    e = load_table(spark, sf_dir, "embeddings")
    n_pos = F.size(F.filter("embedding", lambda x: x > 0))
    sumsq8 = F.aggregate(
        F.transform(
            F.slice("embedding", 1, 8), lambda x: x.cast("double") * x.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.groupBy("label")
        .agg(
            F.round(F.avg(n_pos), 4).alias("avg_pos"),
            F.round(F.avg(sumsq8), 4).alias("avg_sumsq8"),
            F.count("*").alias("n"),
        )
        .orderBy("label")
    )


@register(
    "sliding_window_traffic",
    bench=True,
    oracle="""
WITH offsets AS (SELECT unnest(range(5)) AS k),
slid AS (
  SELECT
    date_trunc('minute', e.ts) - to_minutes(o.k) AS window_start,
    e.event_type,
    e.value
  FROM events e CROSS JOIN offsets o
  WHERE e.ts IS NOT NULL
)
SELECT window_start, event_type, count(*) AS cnt, round(sum(value), 2) AS total
FROM slid
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def sliding_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (5-minute span, 1-minute slide) via the native
    window() generator — each event lands in 5 overlapping windows. The
    oracle reproduces the expansion with an explicit offset cross join;
    agreement proves Spark's epoch-aligned window math."""
    # Spark's window() generator silently drops NULL ts while the
    # oracle's cross-join expansion keeps a NULL window — exclude
    # undated events EXPLICITLY in both engines (planted-NULL audit)
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(
            F.window("ts", "5 minutes", "1 minute").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total")
        # No final sort (r10, guide §2.4): output rows = windows x
        # event types, corpus-proportional; the global range sort only
        # made output order deterministic, which the driver's
        # order-insensitive comparator never needed (dedup_simhash
        # precedent, plans/dedup.py).
    )


@register(
    "unpivot_lineitem_metrics",
    oracle="""
WITH long AS (
  SELECT l_returnflag, 'quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax', l_tax FROM lineitem
)
SELECT l_returnflag, metric,
       count(*) AS n,
       round(avg(val), 4) AS avg_val,
       round(max(val), 2) AS max_val
FROM long
GROUP BY l_returnflag, metric
ORDER BY l_returnflag, metric
""",
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long) via stack(): three metric columns become
    (metric, val) rows in one scan — the oracle's three-scan UNION ALL
    proves the values; stack does it without re-reading."""
    l = load_table(spark, sf_dir, "lineitem")
    long = l.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax) "
            "AS (metric, val)"
        ),
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("val"), 4).alias("avg_val"),
            F.round(F.max("val"), 2).alias("max_val"),
        )
        .orderBy("l_returnflag", "metric")
    )


@register(
    "map_ops_explode",
    oracle=f"""
WITH {HTTP_LOG_SQL},
long AS (
  SELECT request_time_milli, 'status' AS mkey, CAST(response_status AS VARCHAR) AS mval
  FROM http_log
  UNION ALL
  SELECT request_time_milli, 'cache', cache_status FROM http_log
)
SELECT mkey, mval, count(*) AS n
FROM long
GROUP BY mkey, mval
ORDER BY mkey, mval
""",
)
def map_ops_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: build a map from row attributes
    (str_to_map), explode it to entry rows, aggregate. Exercises map
    construction + explode; the oracle flattens the same entries with
    UNION ALL."""
    log = http_log_view(spark, sf_dir)
    m = F.expr(
        "str_to_map(concat('status=', response_status, ',cache=', cache_status), ',', '=')"
    )
    return (
        log.select("request_time_milli", F.explode(m).alias("mkey", "mval"))
        .groupBy("mkey", "mval")
        .agg(F.count("*").alias("n"))
        .orderBy("mkey", "mval")
    )


@register(
    "null_semantics",
    oracle="""
WITH o AS (
  SELECT
    o_orderkey,
    nullif(o_orderstatus, 'O') AS status_or_null,
    CASE WHEN o_totalprice > 300000 THEN o_orderpriority END AS prio_high
  FROM orders
)
SELECT
  coalesce(status_or_null, '<open>') AS status,
  count(*) AS cnt,
  CAST(sum(CASE WHEN status_or_null IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_status,
  count(prio_high) AS n_prio_high,                -- count() skips NULLs
  count(DISTINCT prio_high) AS distinct_prio,     -- distinct ignores NULLs
  CAST(sum(CASE WHEN status_or_null IS NOT DISTINCT FROM prio_high
                THEN 1 ELSE 0 END) AS BIGINT) AS null_safe_eq
FROM o
GROUP BY 1
ORDER BY status
""",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling semantics: nullif/coalesce, count() vs count(col),
    DISTINCT over NULLs, and null-safe equality (Spark's <=> == SQL's
    IS NOT DISTINCT FROM). Grouping keys made nullable on purpose."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    prio_high = F.when(F.col("o_totalprice") > 300000, F.col("o_orderpriority"))
    base = o.select(
        status_or_null.alias("status_or_null"), prio_high.alias("prio_high")
    )
    return (
        base.groupBy(F.coalesce("status_or_null", F.lit("<open>")).alias("status"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.when(F.col("status_or_null").isNull(), 1).otherwise(0)).alias(
                "n_null_status"
            ),
            F.count("prio_high").alias("n_prio_high"),
            F.count_distinct("prio_high").alias("distinct_prio"),
            F.sum(
                F.when(F.col("status_or_null").eqNullSafe(F.col("prio_high")), 1).otherwise(0)
            ).alias("null_safe_eq"),
        )
        .orderBy("status")
    )
