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
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
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

    # A-ES is defined over strictly positive weights: a NULL or zero
    # weight has no exponential race time (and a NULL priority would
    # rank NULLS-FIRST in Spark vs NULLS-LAST in DuckDB — the planted-
    # NULL audit's divergence). Excluded identically in both engines.
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
    ).select(
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


@register(
    "domain_mix_report",
    oracle="""
WITH tok AS (
  SELECT source, lang,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
agg AS (
  SELECT source, lang,
         count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM tok GROUP BY source, lang
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens,
               count(*) AS n_slices
        FROM agg)
SELECT a.source, a.lang, a.n_docs, a.n_tokens,
       round(a.n_tokens * 1.0 / t.corpus_tokens, 6) AS token_share,
       round((t.corpus_tokens * 1.0 / t.n_slices) / a.n_tokens, 6)
         AS uniform_mix_weight
FROM agg a CROSS JOIN tot t
ORDER BY a.source, a.lang
""",
)
def domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix curation report: token counts and corpus share per
    (source, lang) slice, plus the up/down-sampling weight that would
    equalize the mix across slices (weight > 1 = up-sample, < 1 =
    down-sample). This is the table a data-mixing stage (DoReMi-style
    reweighting, or plain per-domain caps) consumes to draw the next
    epoch.

    Scale shape: one scan + one aggregation on (source, lang) —
    map-side combined, cardinality is the number of slices, not rows.
    The grand total is a 1-row aggregate over the slice table joined
    back by a broadcast nested loop (1 row x n_slices); the corpus is
    never scanned twice. Weights are exact integer ratios cast to
    double, rounded identically in both engines."""
    d = load_table(spark, sf_dir, "documents")
    agg = (
        d.select("source", "lang", F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    tot = agg.agg(
        F.sum("n_tokens").alias("corpus_tokens"), F.count("*").alias("n_slices")
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") * 1.0 / F.col("corpus_tokens"), 6).alias(
                "token_share"
            ),
            F.round(
                (F.col("corpus_tokens") * 1.0 / F.col("n_slices")) / F.col("n_tokens"),
                6,
            ).alias("uniform_mix_weight"),
        )
        .orderBy("source", "lang")
    )


_N_SHARDS = 16


@register(
    "training_shard_report",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok,
         {hash64_sql("CAST(doc_id AS VARCHAR)", "shuf")} AS skey
  FROM documents
),
sharded AS (
  SELECT *, skey % {_N_SHARDS} AS shard FROM keyed
),
agg AS (
  SELECT shard,
         count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         arg_min(doc_id, skey) AS first_doc,
         arg_max(doc_id, skey) AS last_doc
  FROM sharded GROUP BY shard
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens FROM agg)
SELECT a.shard, a.n_docs, a.n_tokens,
       round(a.n_tokens * 1.0 / t.corpus_tokens, 6) AS token_share,
       round(a.n_tokens * {_N_SHARDS}.0 / t.corpus_tokens - 1.0, 6) AS skew,
       a.first_doc, a.last_doc
FROM agg a CROSS JOIN tot t
ORDER BY a.shard
""",
)
def training_shard_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE + SHARD assignment — the step
    between curation and the trainer: every epoch-0 pipeline must
    shuffle the corpus away from its crawl/source order and split it
    into N reader shards, and doing it with a seeded hash (md5 of
    'shuf|doc_id' — the same hash64 as the samplers) instead of a
    random sort makes the assignment reproducible, engine-independent
    and append-stable (new docs land in shards without moving old
    ones; a backfill and a stream agree). shard = key % {_N_SHARDS};
    WITHIN a shard the read order is the hash order, so shard files
    written sorted by key are a deterministic interleave of the whole
    corpus. The report is the shard manifest: docs, tokens,
    token_share, skew = n_tokens / (corpus/{_N_SHARDS}) - 1 (the
    trainer's straggler bound — hash sharding keeps it near 0 without
    a balancing pass), and the first/last doc in shuffle order
    (arg_min/arg_max by key — the determinism witness the parity gate
    hashes).

    Scale shape: one scan + one {_N_SHARDS}-group aggregate (map-side
    combined); the grand total is a 1-row broadcast join back. The
    shuffle itself never materializes here — a writer would
    repartitionByRange(shard, skey) and stream each shard out sorted;
    the manifest costs one pass regardless of corpus size. At 100 TB
    the skew column is the check that no reader gets a straggler
    shard: hash skew shrinks as 1/sqrt(docs_per_shard)."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
        hash64(F.col("doc_id").cast("string"), "shuf").alias("skey"),
    ).withColumn("shard", F.col("skey") % _N_SHARDS)
    agg = keyed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min_by("doc_id", "skey").alias("first_doc"),
        F.max_by("doc_id", "skey").alias("last_doc"),
    )
    tot = agg.agg(F.sum("n_tokens").alias("corpus_tokens"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") * 1.0 / F.col("corpus_tokens"), 6).alias(
                "token_share"
            ),
            F.round(
                F.col("n_tokens") * float(_N_SHARDS) / F.col("corpus_tokens") - 1.0, 6
            ).alias("skew"),
            "first_doc",
            "last_doc",
        )
        .orderBy("shard")
    )


@register(
    "shuffle_mixing_report",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source,
         {hash64_sql("CAST(doc_id AS VARCHAR)", "shuf")} AS skey
  FROM documents
),
sh AS (SELECT *, skey % {_N_SHARDS} AS shard FROM keyed),
adj AS (
  SELECT shard,
         CASE WHEN lead(1) OVER w IS NOT NULL
                   AND source IS NOT DISTINCT FROM lead(source) OVER w
              THEN 1 ELSE 0 END AS same,
         CASE WHEN lead(1) OVER w IS NOT NULL THEN 1 ELSE 0 END AS pair
  FROM sh WINDOW w AS (PARTITION BY shard ORDER BY skey, doc_id)
),
obs AS (
  SELECT shard, CAST(sum(same) AS BIGINT) AS same_src_pairs,
         CAST(sum(pair) AS BIGINT) AS n_pairs
  FROM adj GROUP BY shard
),
srcc AS (SELECT shard, source, count(*) AS c FROM sh GROUP BY shard, source),
per AS (
  SELECT shard, CAST(sum(c) AS BIGINT) AS n_docs,
         count(*) AS n_sources,
         CAST(sum(c * (c - 1)) AS BIGINT) AS exp_num
  FROM srcc GROUP BY shard
),
m AS (
  SELECT p.shard, p.n_docs, p.n_sources, o.n_pairs, o.same_src_pairs,
         CAST((CAST(p.exp_num AS HUGEINT) * 1000000) // p.n_docs AS BIGINT)
           AS exp_micro
  FROM per p JOIN obs o ON p.shard = o.shard
),
pooled AS (
  SELECT CAST(-1 AS BIGINT) AS shard,
         CAST(sum(n_docs) AS BIGINT) AS n_docs,
         (SELECT count(*) FROM (SELECT DISTINCT source FROM sh) t)
           AS n_sources,
         CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
         CAST(sum(same_src_pairs) AS BIGINT) AS same_src_pairs,
         CAST(sum(exp_micro) AS BIGINT) AS exp_micro
  FROM m
),
allrows AS (
  SELECT CAST(shard AS BIGINT) AS shard, n_docs,
         CAST(n_sources AS BIGINT) AS n_sources, n_pairs, same_src_pairs,
         exp_micro
  FROM m
  UNION ALL SELECT * FROM pooled
)
SELECT shard, n_docs, n_sources, n_pairs, same_src_pairs,
       round(exp_micro / 1000000.0, 6) AS expected_same,
       CASE WHEN exp_micro > 0
            THEN round(same_src_pairs * 1000000.0 / exp_micro, 6)
       END AS mixing_ratio
FROM allrows
ORDER BY shard
""",
)
def shuffle_mixing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing audit of the training read order — the certificate that
    the shuffle behind training_shard_report actually interleaves
    sources. A trainer reads each shard sequentially in shuffle-key
    order; if the shuffle key correlates with provenance (the classic
    failure: keying on URL, which clusters by domain), consecutive
    examples share a source and gradient batches see correlated data.
    Per shard (and pooled as shard = -1): observed same-source
    ADJACENT pairs along the read order vs the exact expectation under
    a uniform random permutation of that shard's composition,
    E[same] = sum_s c_s(c_s-1) / n (a derangement-free mean over the
    n-1 adjacent slots). mixing_ratio ~ 1 certifies the shuffle;
    >> 1 flags clustering (bad key), << 1 flags a suspiciously
    anti-random order (e.g. round-robin leakage from the generator).

    Exactness: the expectation's numerator and denominator are exact
    integers; the only divisions are one truncating integer division
    onto a 1e-6 grid (HUGEINT/DECIMAL(38,0), non-negative, so DuckDB
    // and Spark DIV agree) and per-row double divisions of exact
    integers (identical IEEE both engines). The pooled row sums the
    GRID values, never doubles, so summation order cannot move it.
    Adjacency is null-safe (NULL source is a source value).

    Scale shape: one scan; the per-shard lead() window partitions by
    shard — parallelism equals shard count and the per-shard
    sequential pass is exactly the trainer's own read pattern (at
    cluster scale shard count is sized to the reader fleet, so
    partitions stay bounded); one (shard, source) groupBy (map-side
    combined, group count = shards x sources); two 16-row joins; the
    pooled row folds 16 grid integers."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        hash64(F.col("doc_id").cast("string"), "shuf").alias("skey"),
    ).withColumn("shard", F.col("skey") % _N_SHARDS)
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    has_next = F.lead(F.lit(1)).over(w)
    adj = keyed.select(
        "shard",
        F.when(
            has_next.isNotNull()
            & F.col("source").eqNullSafe(F.lead("source").over(w)),
            1,
        )
        .otherwise(0)
        .alias("same"),
        F.when(has_next.isNotNull(), 1).otherwise(0).alias("pair"),
    )
    obs = adj.groupBy("shard").agg(
        F.sum("same").cast("long").alias("same_src_pairs"),
        F.sum("pair").cast("long").alias("n_pairs"),
    )
    srcc = keyed.groupBy("shard", "source").agg(F.count("*").alias("c"))
    per = srcc.groupBy("shard").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count("*").alias("n_sources"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("exp_num"),
    )
    m = per.join(obs, "shard").select(
        "shard",
        "n_docs",
        "n_sources",
        "n_pairs",
        "same_src_pairs",
        F.expr(
            "CAST((CAST(exp_num AS DECIMAL(38,0)) * 1000000) "
            "DIV CAST(n_docs AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("exp_micro"),
    )
    n_src_all = keyed.select("source").distinct().agg(
        F.count("*").alias("n_sources")
    )
    pooled = (
        m.agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_pairs").cast("long").alias("n_pairs"),
            F.sum("same_src_pairs").cast("long").alias("same_src_pairs"),
            F.sum("exp_micro").cast("long").alias("exp_micro"),
        )
        .crossJoin(F.broadcast(n_src_all))
        .select(
            F.lit(-1).cast("long").alias("shard"),
            "n_docs",
            F.col("n_sources").cast("long").alias("n_sources"),
            "n_pairs",
            "same_src_pairs",
            "exp_micro",
        )
    )
    rows = m.select(
        F.col("shard").cast("long").alias("shard"),
        "n_docs",
        F.col("n_sources").cast("long").alias("n_sources"),
        "n_pairs",
        "same_src_pairs",
        "exp_micro",
    ).unionByName(pooled)
    return rows.select(
        "shard",
        "n_docs",
        "n_sources",
        "n_pairs",
        "same_src_pairs",
        F.round(F.col("exp_micro") / 1000000.0, 6).alias("expected_same"),
        F.when(
            F.col("exp_micro") > 0,
            F.round(F.col("same_src_pairs") * 1000000.0 / F.col("exp_micro"), 6),
        ).alias("mixing_ratio"),
    ).orderBy("shard")


# ---------------------------------------------------------------------------
# Neyman allocation (Neyman 1934; Cochran, Sampling Techniques §5.5) —
# variance-optimal sample-size allocation across strata, the sampling
# DESIGN step that precedes stratified_sample's execution.
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000


@register(
    "neyman_allocation_report",
    oracle=f"""
WITH x AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
st AS (
  SELECT event_type,
         count(*) AS nh,
         CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v * v) AS BIGINT) AS s2
  FROM x GROUP BY event_type
),
sig AS (
  SELECT event_type, nh,
         sqrt(greatest(CAST(s2 AS DOUBLE) / nh
                       - (CAST(s1 AS DOUBLE) / nh) * (CAST(s1 AS DOUBLE) / nh),
                       0)) AS sigma
  FROM st
),
tot AS (
  -- quantized terms accumulate as DECIMAL(38,0), not BIGINT: each
  -- round(nh*sigma*1e6) is a deterministic integer-valued double and
  -- the decimal sum is exact (and order-independent) at any scale,
  -- where a BIGINT sum would silently overflow past nh*sigma ~ 9.2e12
  SELECT CAST(sum(nh) AS BIGINT) AS n_total,
         CAST(sum(CAST(round(nh * sigma * 1000000) AS DECIMAL(38,0))) AS DOUBLE)
           / 1000000 AS w_total
  FROM sig
)
SELECT s.event_type,
       s.nh,
       round(s.sigma / 100, 4) AS sigma,
       CAST(round({_NEYMAN_BUDGET} * s.nh * 1.0 / t.n_total) AS BIGINT)
         AS n_proportional,
       CAST(round({_NEYMAN_BUDGET} * s.nh * s.sigma / t.w_total) AS BIGINT)
         AS n_neyman,
       round(s.nh * s.sigma / t.w_total, 4) AS neyman_share
FROM sig s CROSS JOIN tot t
ORDER BY s.event_type
""",
)
def neyman_allocation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal (Neyman) allocation of a {_NEYMAN_BUDGET}-row
    sample budget across event-type strata: n_h proportional to
    N_h * sigma_h, next to the naive proportional allocation — the
    sampling-design table a curation team consults before drawing a
    stratified eval set (volatile strata earn more than their
    head-count share; near-constant strata need almost none).
    ``stratified_sample`` is the execution half; this is the design
    half.

    Determinism: per-stratum moments are exact integer sums of cent-
    quantized values, so sigma = sqrt(E[v^2] - E[v]^2) is a double
    computed from exact integers — bit-identical in both engines (the
    same argument as the PCA Gram aggregate); the cross-stratum
    denominator sum(nh * sigma) accumulates on a 1e-6 integer grid so
    it is partition-order independent too (ADVICE r06 — a raw double
    sum is not); rounding to 4dp/integers happens only at the edge. Scale shape: one scan with map-side
    combine into (count, sum, sum-of-squares) per stratum — the
    textbook one-pass moment aggregate — then arithmetic over the
    handful of stratum rows. Nothing driver-side, nothing
    corpus-proportional past the first aggregate."""
    x = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    st = x.groupBy("event_type").agg(
        F.count("*").alias("nh"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("nh")
    sig = st.select(
        "event_type",
        "nh",
        F.sqrt(
            F.greatest(
                F.col("s2").cast("double") / F.col("nh") - mean * mean, F.lit(0.0)
            )
        ).alias("sigma"),
    )
    # w_total accumulates on a micro-unit integer grid (ADVICE r06): a
    # raw double sum(nh * sigma) is partition-order dependent, so the
    # docstring's bit-determinism claim would not survive a different
    # stratum arrival order. Each nh*sigma term is itself a
    # deterministic double (exact-integer moments), so its rounding to
    # 1e-6 units is deterministic. The quantized terms accumulate as
    # decimal(38,0), not long (ADVICE r07): a long sum silently
    # overflows once nh*sigma exceeds ~9.2e12, while the decimal sum
    # stays exact — and therefore order-independent — at any scale.
    tot = sig.agg(
        F.sum("nh").alias("n_total"),
        (
            F.sum(
                F.round(F.col("nh") * F.col("sigma") * 1_000_000).cast(
                    "decimal(38,0)"
                )
            )
            .cast("double")
            / 1_000_000
        ).alias("w_total"),
    )
    return (
        sig.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "nh",
            F.round(F.col("sigma") / 100, 4).alias("sigma"),
            F.round(_NEYMAN_BUDGET * F.col("nh") * 1.0 / F.col("n_total"))
            .cast("long")
            .alias("n_proportional"),
            F.round(
                _NEYMAN_BUDGET * F.col("nh") * F.col("sigma") / F.col("w_total")
            )
            .cast("long")
            .alias("n_neyman"),
            F.round(F.col("nh") * F.col("sigma") / F.col("w_total"), 4).alias(
                "neyman_share"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
# Massive Data Streams", Google 2012; Kleiner et al.'s BLB is the
# heavier cousin) — THE distributed bootstrap: resampling n rows with
# replacement needs global coordination, but each row's multiplicity
# in a resample is asymptotically Poisson(1), so B independent
# replicas are just B deterministic per-row weights folded in ONE
# scan. Weights come from the registry's md5 idiom, so both engines
# draw identical "randomness" and the whole replica table hash-checks.
# ---------------------------------------------------------------------------

_BOOT_B = 32
# Poisson(1) CDF scaled by 1e9, floor-exact: u in [0, 1e9) drawn from
# hash64 maps to weight w by inverse CDF. Capped at 7 (truncated mass
# 8.3e-5 — documented, identical in both engines).
_BOOT_CDF = (
    367879441,  # P(X<=0) = 1/e
    735758882,  # P(X<=1)
    919698602,  # P(X<=2)
    981011843,  # P(X<=3)
    996340153,  # P(X<=4)
    999405815,  # P(X<=5)
    999916758,  # P(X<=6)
)


def _boot_w_case(u_expr: str) -> str:
    """CASE ladder mapping a [0,1e9) draw to a Poisson(1) weight —
    identical text in Spark SQL and DuckDB."""
    arms = " ".join(
        f"WHEN {u_expr} < {t} THEN {w}" for w, t in enumerate(_BOOT_CDF)
    )
    return f"CASE {arms} ELSE {len(_BOOT_CDF)} END"


def _boot_oracle() -> str:
    per_j = []
    for j in range(_BOOT_B + 1):
        if j == 0:
            w = "1"  # replica 0 = the unweighted point estimate
        else:
            u = f"({hash64_sql('o_orderkey', f'boot{j}')} % 1000000000)"
            w = _boot_w_case(u)
        per_j.append(
            f"""SELECT {j} AS replica_id,
       CAST(sum(w) AS BIGINT) AS n_eff,
       CAST((CAST(sum(w * cents) AS HUGEINT) * 1000000)
            // sum(w) AS BIGINT) AS mean_microcents
FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST({w} AS BIGINT) AS w FROM orders)
HAVING sum(w) > 0"""
        )
    return "\nUNION ALL\n".join(per_j) + "\nORDER BY replica_id"


@register("poisson_bootstrap_report", oracle=_boot_oracle())
def poisson_bootstrap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap uncertainty for mean order value: {_BOOT_B}
    deterministic resample replicas of mean(o_totalprice), one row per
    replica — replica 0 is the unweighted point estimate, replicas
    1..{_BOOT_B} are Poisson(1)-weighted resamples whose spread IS the
    sampling distribution (CI = order statistics of the replica means,
    asserted in tests/test_bootstrap.py). The classic with-replacement
    bootstrap cannot be distributed (a resample needs global
    coordination); per-row Poisson(1) multiplicities are its
    asymptotic equivalent and fold in one pass — the Chamandy/Google
    streaming-bootstrap construction.

    Determinism: draws are the registry's md5 idiom (hash64 of
    'boot{{j}}|o_orderkey' mod 1e9) pushed through the floor-exact
    integer Poisson CDF ladder (capped at 7, truncated mass 8.3e-5);
    money is exact cents; each replica mean is one DECIMAL(38,0)
    product with a single floor division at the edge
    (sum_cents x 1e6 overflows BIGINT at ~150M orders — the capacity
    report's overflow discipline). Both engines replay every bit, so
    the driver hash pins the full replica table.

    Scale shape: ONE corpus scan computing {_BOOT_B}+1 weight columns
    inline (JVM-side md5, no explode — the corpus is never replicated
    B-fold), folded map-side into a single row of 2x({_BOOT_B}+1)
    sums, then unpivoted to {_BOOT_B}+1 rows driver-side-free. State
    is O(B) no matter the corpus; mergeable by addition across
    partitions/streams/days like the sketch quartet."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    return bootstrap_replicas(bootstrap_base(o))


def _boot_w_col(j: int) -> "F.Column":
    """Replica j's Poisson(1) weight as a Column — the same CASE
    ladder as the oracle (_boot_w_case), built over the md5 draw of
    'boot{j}|o_orderkey'. Replica 0 is the unweighted sample."""
    if j == 0:
        return F.lit(1).cast("long")
    u = hash64("o_orderkey", f"boot{j}") % 1_000_000_000
    expr = None
    for wv, t in enumerate(_BOOT_CDF):
        cond = u < F.lit(t)
        expr = F.when(cond, wv) if expr is None else expr.when(cond, wv)
    return expr.otherwise(len(_BOOT_CDF)).cast("long")


def bootstrap_base(df: DataFrame) -> DataFrame:
    """One mergeable row of 2x({_BOOT_B}+1) sums over (o_orderkey,
    cents) rows — the map half shared by poisson_bootstrap_report and
    the streaming bootstrap monitor (all sums are addition-mergeable,
    so the monitor folds it across micro-batches and the readout is
    batch-boundary invariant)."""
    aggs = []
    for j in range(_BOOT_B + 1):
        w = _boot_w_col(j)
        aggs.append(F.sum(w).alias(f"n{j}"))
        aggs.append(
            F.sum(w.cast("decimal(38,0)") * F.col("cents")).alias(f"s{j}")
        )
    return df.agg(*aggs)


def bootstrap_replicas(base: DataFrame) -> DataFrame:
    """The replica table (replica_id, n_eff, mean_microcents) from a
    bootstrap_base row — the reduce half shared with the monitor."""
    reps = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("replica_id"),
                        F.col(f"n{j}").cast("long").alias("n_eff"),
                        F.col(f"s{j}").alias("s"),
                    )
                    for j in range(_BOOT_B + 1)
                ]
            )
        ).alias("r")
    ).select("r.replica_id", "r.n_eff", "r.s")
    return (
        reps.filter(F.col("n_eff") > 0)
        .select(
            "replica_id",
            "n_eff",
            F.expr(
                "CAST((s * 1000000) div n_eff AS BIGINT)"
            ).alias("mean_microcents"),
        )
        .orderBy("replica_id")
    )
