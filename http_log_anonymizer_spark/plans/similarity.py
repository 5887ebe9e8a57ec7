"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Three tiers, mirroring what a 100 TB training-data pipeline needs:

- ``ann_brute_topk``: exact top-k cosine — the correctness baseline.
  Queries broadcast; every executor scans only its candidate partition
  (BroadcastNestedLoopJoin), so the work is embarrassingly parallel and
  never shuffles the corpus.
- ``ann_lsh_topk``: random-hyperplane LSH — the scale path. Bucket by
  sign bits against deterministic hyperplanes, then search only within
  the bucket (equi-join on bucket id instead of a cross join).
- ``embed_neardup``: embedding-cosine near-duplicate pairs (threshold).

Normalization discipline: every query precomputes **unit vectors** once
per row (two-projection pattern — norm materialized, then divide) and
caches them; pairwise cosine is then a single dot product. Computing
cosine(a, b) naively re-derives both norms per PAIR — measured 48 s vs
~4 s at sf0.1 for the all-pairs query. The oracle mirrors the same
normalize-then-dot formulation so doubles stay bit-comparable.

Hyperplanes are derived from md5 so Python, Spark and DuckDB generate
identical constants.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from http_log_anonymizer_spark.functions.vectors import (
    UNIT_CTE_SQL,
    dot,
    dot_sql,
    norm_column,
    unit_cte_sql,
    unit_from,
)
from http_log_anonymizer_spark.plans.registry import ScaleGate, register
from http_log_anonymizer_spark.sources.batch import load_table

_DIM = 64
_TOPK = 5
_NEARDUP_THRESHOLD = 0.45
_N_PLANES = 4


def _unit_table(
    spark: SparkSession,
    sf_dir: str,
    extra: list[str] = [],
    cache: bool = True,
    rotate: bool = False,
) -> DataFrame:
    """(vec_id, [extra...], ue): unit-vector table. Cache when the table
    is scanned more than ~twice (all-pairs, LSH index); a single-pass
    consumer is cheaper without the materialization. ``rotate=True``
    normalizes the OPQ-rotated corpus instead (unit(Hx) == H unit(x) up
    to float rounding, so rotated ground truth matches the rotated
    tier's search space)."""
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    if rotate:
        assert not extra, "rotate drops non-embedding columns"
        e = _opq_rotate(e.select("vec_id", "embedding"))
    n = e.select("vec_id", *extra, "embedding", norm_column("embedding").alias("nrm"))
    u = n.select("vec_id", *extra, unit_from("embedding", "nrm").alias("ue"))
    if cache:
        u = u.cache()
        u.count()  # eager: multi-probe consumers double-build lazy caches
    return u


def _hyperplanes(tag: str = "", n: int | None = None) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^64 from md5 —
    reproducible by any engine, inlined as literals on both sides.
    ``tag`` derives independent tables for OR-construction; ``n``
    overrides the plane count (wide tables for the centi-scale tier)."""
    planes = []
    for p in range(n if n is not None else _N_PLANES):
        row = []
        for d in range(_DIM):
            h = int(hashlib.md5(f"plane|{tag}{p}:{d}".encode()).hexdigest()[:15], 16)
            row.append(h / 2**59 - 1.0)
        planes.append(row)
    return planes


_PLANES = _hyperplanes()

# OR-construction tables for the near-dup LSH prune: L independent
# 4-bit tables. Collision prob for one table at angle theta is
# (1 - theta/pi)^4; OR over L=8 tables gives recall ~1.0 for true
# near-dups (cos >= 0.8 -> ~0.9998) and ~0.9 at the 0.45 threshold
# boundary (measured: see tests/test_operators.py recall floor).
_NDL_TABLES = 8
_NDL_PLANES = [_hyperplanes(tag=f"t{t}|") for t in range(_NDL_TABLES)]


def _plane_dots_all(vec_col: str, planes: list[list[float]]) -> F.Column:
    """ALL plane dots in one expression: fold the vector once against a
    literal (dim x n_planes) coefficient matrix, accumulating an
    n_planes-long array. Per plane the association is 0.0 + t0 + t1 +
    ... — the exact IEEE order of :func:`_plane_dot_spark` — so bucket
    signs are bit-identical to the per-plane fold and the SQL chain.
    One small tree instead of n_planes 64-literal folds: 32 separate
    folds cost ~20 s of Catalyst analysis/codegen per query.

    Built as ONE parsed SQL expression: the Column-API construction of
    the 64 x n_planes literal matrix issued ~3,000 py4j round-trips
    (one per F.lit/F.array), measured ~2 s of driver time per query at
    any scale factor (r10 optimization, guide §5 driver overhead);
    repr() doubles round-trip exactly through the SQL parser, so the
    analyzed literal tree — and every result bit — is unchanged."""
    n_planes = len(planes)
    mat_sql = "array(" + ", ".join(
        "array("
        + ", ".join(f"{planes[p][d]!r}D" for p in range(n_planes))
        + ")"
        for d in range(_DIM)
    ) + ")"
    return F.expr(
        f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), {mat_sql}, "
        "(x, row) -> transform(row, c -> c * x)), "
        f"array_repeat(0.0D, {n_planes}), "
        "(acc, v) -> zip_with(acc, v, (s, t) -> s + t))"
    )


def _plane_dot_spark(vec_col: str, plane: list[float]) -> F.Column:
    """Left-to-right fold against the literal plane array. Same
    association as the SQL rendering's explicit sum chain (fold's
    0.0+t0 prefix is an exact IEEE identity), so results are
    bit-identical — but WITHOUT materializing a 64-term expression
    tree, which costs seconds of Janino codegen compilation per
    query."""
    prods = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(c) for c in plane]),
        lambda x, y: x * y,
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _plane_dot_sql(vec: str, plane: list[float]) -> str:
    return " + ".join(
        f"CAST({vec}[{d + 1}] AS DOUBLE) * {c!r}" for d, c in enumerate(plane)
    )


def _bucket_spark(vec_col: str, planes: list[list[float]] | None = None) -> F.Column:
    out = F.lit(0)
    for p, plane in enumerate(planes or _PLANES):
        out = out + F.when(_plane_dot_spark(vec_col, plane) >= 0, F.lit(1 << p)).otherwise(0)
    return out


def _bucket_sql(vec: str, planes: list[list[float]] | None = None) -> str:
    return " + ".join(
        f"(CASE WHEN {_plane_dot_sql(vec, plane)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes or _PLANES)
    )


# ---------------------------------------------------------------------------


@register(
    "ann_brute_topk",
    # exact ground truth: queries x corpus = n^2/100 dot products (369 s measured at 200k; ~10h at 2M)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk", advice="Recall/ground-truth audits at scale run on a SAMPLED stratum (the brute side is the cost, and recall estimates need only a sample)."
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL},
q AS (SELECT vec_id AS query_id, ue AS qe FROM unit WHERE vec_id % 100 = 0),
scored AS (
  SELECT
    q.query_id,
    c.vec_id AS neighbor_id,
    round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
  ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
    bench=True,
)
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{_TOPK} cosine neighbors for each query vector
    (vec_id % 100 == 0), computed by operators/topk.py: the query set
    materializes executor-side as hash-sharded parquet (never transits
    the driver — it is corpus-proportional), each Arrow batch scores
    its candidates against streamed query shards with a
    dimension-at-a-time numpy accumulation that reproduces the Catalyst
    fold's IEEE summation order BIT-FOR-BIT (so the SQL oracle still
    hash-matches), and only per-partition top-k candidates ever
    shuffle. Replaces the interpreted fold + full corpus-x-queries rank
    window that cost 32 s at sf1 (r03 bench; now ~1 s). Ranking uses
    the rounded cosine with neighbor-id tie-break so order is
    reproducible across engines."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    u = _unit_table(spark, sf_dir, cache=False)
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
    )
    return brute_topk(u, q, k=_TOPK, cache_key=f"annq|{sf_dir}")


@register(
    "ann_lsh_topk",
    # candidate-quadratic demo width (n*q/2^4): measured 21.2 s at
    # sf10 (200k vectors) and KILLED at 45 min at sf100 (2M) —
    # SCALE.md sf100 table. The ceiling sits just above the largest
    # measured-safe input; the wide twin is the registered scale path.
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_lsh_wide_topk"
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL},
b AS (SELECT vec_id, ue, {_bucket_sql('embedding')} AS bucket FROM unit),
q AS (SELECT vec_id AS query_id, ue AS qe, bucket AS qbucket FROM b WHERE vec_id % 100 = 0),
scored AS (
  SELECT
    q.query_id,
    c.vec_id AS neighbor_id,
    round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN b c ON c.bucket = q.qbucket AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
  ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
    # NOT bench: demo tier only (r05 verdict) — 16 buckets make the
    # candidate set corpus-quadratic, so it must never occupy a series
    # slot a reader could mistake for the ANN scale path. The benched
    # tiers are ann_lsh_wide_topk and ann_ivf_sqrt_topk.
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO-tier approximate top-{_TOPK}: random-hyperplane LSH
    ({_N_PLANES} bits -> {1 << _N_PLANES} buckets), search restricted
    to the query's bucket. The cross join of the brute-force path
    becomes an equi-join on bucket — O(N*Q/2^bits) comparisons — but
    with only {1 << _N_PLANES} buckets the candidate count stays
    CORPUS-QUADRATIC as n grows (measured: killed at 45 min at sf100);
    this tier exists as the readable small-corpus demo and recall
    playground. The registered SCALE tiers are ann_lsh_wide_topk
    (4 x 12-bit OR-construction) and ann_ivf_sqrt_topk (sqrt-scaled
    learned cells) — see SCALE.md "ANN index family". Bucket sign-bits
    are computed on the RAW embedding — the sign of a hyperplane dot
    is norm-invariant, and indexing the raw array avoids re-evaluating
    the unit transform per term (Catalyst does not CSE through the
    projection). The bucketed index is cached — built once, probed by
    every query. The query side joins WITHOUT a forced broadcast (it
    is corpus-proportional at 1% of n — r04 verdict): AQE picks
    broadcast only while it actually fits."""
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    n = e.select("vec_id", "embedding", norm_column("embedding").alias("nrm"))
    b = n.select(
        "vec_id",
        unit_from("embedding", "nrm").alias("ue"),
        _bucket_spark("embedding").alias("bucket"),
    ).cache()
    b.count()  # eager build before probe+query scans
    q = b.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("ue").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        b.join(q, F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot("qe", "ue"), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


@register(
    "embed_neardup",
    # all-pairs by declared design (the exact oracle of record):
    # n^2/2 dot products. sf1 (20k vectors) measured seconds on the
    # GEMM path; the ceiling caps the pair count at ~6x that work.
    scale_gate=ScaleGate(
        table="embeddings", max_rows=50_000, wide_twin="embed_neardup_lsh"
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL}
SELECT
  a.vec_id AS vec_a,
  b.vec_id AS vec_b,
  round({dot_sql('a.ue', 'b.ue', _DIM)}, 4) AS cos
FROM unit a JOIN unit b ON a.vec_id < b.vec_id
WHERE round({dot_sql('a.ue', 'b.ue', _DIM)}, 4) >= {_NEARDUP_THRESHOLD}
ORDER BY vec_a, vec_b
""",
)
def embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold
    (all-pairs here for oracle verifiability; the scale path reuses the
    LSH bucketing of ann_lsh_topk to prune candidates first). Unit
    vectors are precomputed so each pair costs one dot product."""
    u = _unit_table(spark, sf_dir)
    a = u.select(F.col("vec_id").alias("vec_a"), F.col("ue").alias("ua"))
    b = u.select(F.col("vec_id").alias("vec_b"), F.col("ue").alias("ub"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = F.round(dot("ua", "ub"), 4)
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= _NEARDUP_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


_NDL_BUCKET_COLS_SQL = ", ".join(
    f"{_bucket_sql('embedding', _NDL_PLANES[t])} AS b{t}" for t in range(_NDL_TABLES)
)
_NDL_KEYS_SQL = " UNION ALL ".join(
    f"SELECT vec_id, {t} AS t, b{t} AS bucket FROM bk" for t in range(_NDL_TABLES)
)


@register(
    "embed_neardup_lsh",
    oracle=f"""
WITH {UNIT_CTE_SQL},
bk AS MATERIALIZED (SELECT vec_id, ue, {_NDL_BUCKET_COLS_SQL} FROM unit),
k AS MATERIALIZED ({_NDL_KEYS_SQL}),
cand AS (
  SELECT a.vec_id AS da, b.vec_id AS db
  FROM k a JOIN k b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT c.da AS vec_a, c.db AS vec_b,
       round({dot_sql('ua.ue', 'ub.ue', _DIM)}, 4) AS cos
FROM cand c
JOIN bk ua ON ua.vec_id = c.da
JOIN bk ub ON ub.vec_id = c.db
WHERE round({dot_sql('ua.ue', 'ub.ue', _DIM)}, 4) >= {_NEARDUP_THRESHOLD}
ORDER BY vec_a, vec_b
""",
)
def embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, LSH-pruned — the registered SCALE path for
    the family (embed_neardup stays as the exact all-pairs baseline):
    candidates are pairs sharing a bucket in ANY of {_NDL_TABLES}
    independent {_N_PLANES}-bit hyperplane tables (OR-construction),
    then the exact cosine filter runs only on candidates. The cross
    join becomes an equi-join on (table, bucket); at 100 TB the
    comparison count is sum of within-bucket pairs, not n^2.

    Deterministic by construction (md5-derived hyperplanes, inlined as
    literals in both engines), so the DuckDB oracle replicates the SAME
    pruning and the driver hash-checks it — approximate in recall vs
    embed_neardup (~0.8 at the 0.45 boundary, ~1.0 for true near-dups;
    asserted in tests), exact in what it claims to return.

    Pair dedup across tables is the first-matching-table trick (keep
    the pair only where the matched table is the first table whose
    buckets agree, computed from the two carried bucket arrays) — no
    distinct over the candidate set; the oracle's GROUP BY produces the
    identical pair set."""
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    n = e.select(
        "vec_id",
        "embedding",
        norm_column("embedding").alias("nrm"),
        _plane_dots_all(
            "embedding", [p for tbl in _NDL_PLANES for p in tbl]
        ).alias("pd"),
    )
    bucket_t = [
        reduce(
            lambda acc, p: acc
            + F.when(
                F.element_at("pd", t * _N_PLANES + p + 1) >= 0, F.lit(1 << p)
            ).otherwise(0),
            range(1, _N_PLANES),
            F.when(F.element_at("pd", t * _N_PLANES + 1) >= 0, F.lit(1)).otherwise(0),
        )
        for t in range(_NDL_TABLES)
    ]
    base = n.select(
        "vec_id",
        unit_from("embedding", "nrm").alias("ue"),
        F.array(*bucket_t).alias("bks"),
    ).cache()
    base.count()  # eager: both sides of the self-join probe this index
    # Candidate generation shuffles IDS AND BUCKETS ONLY (guide §2.3 /
    # §8: decide with small rows, move payloads once): the pre-r10
    # formulation carried both 64-double unit vectors through the
    # bucket self-join, so every bucket-sharing JOIN ROW materialized
    # ~1 KB and the interpreted dot ran before pair dedup (measured
    # sf0.1: 1.04M raw join rows for 2,000 vectors — the 4-bit bucket
    # geometry is recall-oriented, not selective — 7.9 s exec). The
    # bks array rides along (72 B) because the first-matching-table
    # dedup needs both sides' buckets; unit vectors attach AFTER the
    # dedup, by vec_id joins against the cached index, and the exact
    # fold dot runs once per DISTINCT candidate pair (sf0.1: 814k
    # pairs, exec 7.9 -> ~4 s; at scale the candidate stream shuffles
    # 16 B/pair instead of 1 KB/row).
    k = base.select("vec_id", "bks", F.posexplode("bks").alias("t", "bucket"))
    a, b = k.alias("a"), k.alias("b")
    first_match = F.array_position(
        F.zip_with("a.bks", "b.bks", lambda x, y: x == y), F.lit(True)
    )
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(F.col("a.t") + 1 == first_match)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )
    ua = base.select(F.col("vec_id").alias("vec_a"), F.col("ue").alias("ua"))
    ub = base.select(F.col("vec_id").alias("vec_b"), F.col("ue").alias("ub"))
    cos = F.round(dot("ua", "ub"), 4)
    return (
        cand.join(ua, "vec_a")
        .join(ub, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= _NEARDUP_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


@register(
    "semdedup_cells",
    # within-cell all-pairs cosine over FIXED cells: pair work n^2/k, quadratic at any fixed k
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="embed_neardup_lsh"
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL},
pairs AS (
  SELECT a.label, b.vec_id AS dropped,
         round({dot_sql('a.ue', 'b.ue', _DIM)}, 4) AS cos
  FROM unit a JOIN unit b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round({dot_sql('a.ue', 'b.ue', _DIM)}, 4) >= {_NEARDUP_THRESHOLD}
),
pa AS (
  SELECT label, count(*) AS n_pairs,
         count(DISTINCT dropped) AS n_dropped,
         round(avg(cos), 4) AS avg_pair_cos
  FROM pairs GROUP BY label
),
cells AS (SELECT label, count(*) AS n_vecs FROM unit GROUP BY label)
SELECT c.label, c.n_vecs,
       coalesce(pa.n_pairs, 0) AS n_pairs,
       c.n_vecs - coalesce(pa.n_dropped, 0) AS n_kept,
       pa.avg_pair_cos
FROM cells c LEFT JOIN pa ON c.label = pa.label
ORDER BY c.label
""",
)
def semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup inside clustering
    cells — pairwise cosine is computed ONLY within a cell (here the
    ``label`` column; in production the k-means assignment, see
    operators/kmeans.py), and within each near-dup pair the lower
    vec_id is kept. Reports per cell: size, qualifying pairs, survivors
    after the keep-lowest-id policy, mean pair cosine.

    The keep-lowest-id policy needs no connected components: a vector
    is dropped iff it appears as the GREATER side of any qualifying
    pair, so survivors = cell size - distinct right-side ids.

    Scale shape: this is the whole point of the algorithm — the
    quadratic blowup is bounded per cell (cells are sized by the
    clustering step, ~corpus/k), and cells join by an equi-join on the
    cell id, so no pair ever crosses cells and the corpus never meets
    itself unpartitioned. The all-pairs embed_neardup is this query
    with one global cell."""
    u = _unit_table(spark, sf_dir, extra=["label"])
    a, b = u.alias("a"), u.alias("b")
    cos = F.round(dot("a.ue", "b.ue"), 4)
    pairs = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.label").alias("label"), F.col("b.vec_id").alias("dropped"), cos.alias("cos"))
        .filter(F.col("cos") >= _NEARDUP_THRESHOLD)
    )
    pa = pairs.groupBy("label").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("dropped").alias("n_dropped"),
        F.round(F.avg("cos"), 4).alias("avg_pair_cos"),
    )
    cells = u.groupBy("label").agg(F.count("*").alias("n_vecs"))
    return (
        cells.join(pa, "label", "left")
        .select(
            "label",
            "n_vecs",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
            "avg_pair_cos",
        )
        .orderBy("label")
    )


@register(
    "ivf_cluster_stats",
    oracle=f"""
WITH comp AS (
  SELECT label, vec_id,
         generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
-- integer-quantized centroid: exact integer sums -> deterministic
cent AS (
  SELECT label, pos,
         sum(CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS sq,
         count(*) AS n
  FROM comp GROUP BY label, pos
),
dist AS (
  SELECT c.label, c.vec_id,
         sum(pow(CAST(c.v AS DOUBLE) - (ct.sq / (ct.n * 1000.0)), 2)) AS d2
  FROM comp c JOIN cent ct ON c.label = ct.label AND c.pos = ct.pos
  GROUP BY c.label, c.vec_id
)
SELECT label,
       count(*) AS n_vectors,
       round(avg(sqrt(d2)), 4) AS avg_dist,
       round(max(sqrt(d2)), 4) AS max_dist
FROM dist
GROUP BY label
ORDER BY label
""",
)
def ivf_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse clustering stats: per-label centroids (the
    'inverted file' cell centers) and member distance distribution.
    Centroids use integer-quantized sums so both engines agree exactly;
    this is the assignment/refinement primitive an IVF ANN index builds
    on."""
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    comp = (
        e.select("label", "vec_id", F.posexplode(F.col("embedding").cast("array<double>")))
        .withColumnRenamed("pos", "pos0")
        .select("label", "vec_id", (F.col("pos0") + 1).alias("pos"), F.col("col").alias("v"))
    )
    cent = comp.groupBy("label", "pos").agg(
        F.sum(F.floor(F.col("v") * 1000).cast("long")).alias("sq"),
        F.count("*").alias("n"),
    )
    dist = (
        comp.alias("c")
        .join(cent.alias("ct"), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.pow(F.col("v") - (F.col("sq") / (F.col("n") * 1000.0)), 2)).alias("d2")
        )
    )
    return (
        dist.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg(F.sqrt("d2")), 4).alias("avg_dist"),
            F.round(F.max(F.sqrt("d2")), 4).alias("max_dist"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# IVF ANN: probe-nearest-cells search (coarse quantizer -> candidate prune)
# ---------------------------------------------------------------------------

_NPROBE = 2

# Integer-quantized per-cell centroids (exact integer sums -> both engines
# agree bit-for-bit), assembled into per-label centroid arrays.
_CENT_CTE = """
comp AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
cent AS (
  SELECT label, pos,
         sum(CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) / (count(*) * 1000.0) AS c
  FROM comp GROUP BY label, pos
),
cv AS (SELECT label, list(c ORDER BY pos) AS cvec FROM cent GROUP BY label)
"""


def _centroid_arrays(e: DataFrame) -> DataFrame:
    """(label, cvec): per-cell centroid arrays (tiny: k x dim), exact
    integer-quantized sums so both engines agree bit-for-bit. Spark twin
    of _CENT_CTE."""
    comp = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("label", (F.col("pos") + 1).alias("pos"), F.col("col").alias("v"))
    cent = comp.groupBy("label", "pos").agg(
        (F.sum(F.floor(F.col("v") * 1000).cast("long")) / (F.count("*") * 1000.0)).alias("c")
    )
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )


def _probe_cells(q: DataFrame, cv: DataFrame, nprobe: int) -> DataFrame:
    """Rank cells per query by L2 distance to the centroid (rounded +
    label tie-break for cross-engine reproducibility); keep the nprobe
    nearest. `q` must carry qemb (raw double embedding); all its other
    columns pass through."""
    diff = F.zip_with("qemb", "cvec", lambda x, c: (x - c) * (x - c))
    d2 = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
    qd = q.crossJoin(F.broadcast(cv)).select(*q.columns, "label", d2.alias("d2"))
    wc = Window.partitionBy("query_id").orderBy(F.round("d2", 6), "label")
    return (
        qd.select(*q.columns, "label", F.row_number().over(wc).alias("cr"))
        .filter(F.col("cr") <= nprobe)
        .drop("cr")
    )


@register(
    "ann_ivf_topk",
    # fixed-cell tier: candidates grow as nprobe*n/8 per query (the sf100 fixed-k wall, SCALE.md); the sqrt tier is the scale path
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk"
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL},
{_CENT_CTE},
q AS (
  SELECT vec_id AS query_id, embedding AS qemb, ue AS qe
  FROM unit WHERE vec_id % 100 = 0
),
qd AS (
  SELECT q.query_id, cv.label,
         list_sum(list_transform(generate_series(1, {_DIM}),
           i -> (CAST(q.qemb[i] AS DOUBLE) - cv.cvec[i])
              * (CAST(q.qemb[i] AS DOUBLE) - cv.cvec[i]))) AS d2
  FROM q CROSS JOIN cv
),
probed AS (
  SELECT query_id, label FROM (
    SELECT query_id, label,
           row_number() OVER (
             PARTITION BY query_id ORDER BY round(d2, 6), label
           ) AS cr
    FROM qd
  ) WHERE cr <= {_NPROBE}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM probed p
  JOIN q ON q.query_id = p.query_id
  JOIN unit c ON c.label = p.label AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
    bench=True,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search end-to-end: coarse cells are the `label` partitions
    with integer-quantized centroids (the inverted file of
    ivf_cluster_stats); each query ranks the {_NPROBE} nearest cell
    centroids (L2, rounded+label tie-break for cross-engine
    reproducibility) and scans ONLY those cells, reranking candidates by
    exact cosine on precomputed unit vectors.

    Scale shape: the centroid table is k x dim (KBs) and broadcasts; the
    query->cell probe is a broadcast nested-loop over that tiny table;
    the candidate scan is an equi-join on the cell id, so per-query work
    drops from O(N) to O(N * nprobe / k) — the same pruning contract a
    FAISS IVF index provides, expressed as two joins Catalyst can
    optimize. No shuffle touches the corpus except the per-cell
    hash-partition of the candidate join.
    """
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    # The cache holds ONLY what the candidate join probes (vec_id,
    # label, ue): carrying the raw embedding too doubled cache width
    # for the benefit of the 1% query slice, which instead reads its
    # own projection-pruned scan below (r04: -0.1s med at sf0.1, half
    # the executor cache memory at any scale).
    u = (
        e.select("vec_id", "label", "embedding", norm_column("embedding").alias("nrm"))
        .select("vec_id", "label", unit_from("embedding", "nrm").alias("ue"))
        .cache()
    )
    u.count()  # eager: probed by queries and candidates below

    cv = _centroid_arrays(e)
    qsrc = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0)
    q = qsrc.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qemb"),
        norm_column("embedding").alias("qnrm"),
    ).select("query_id", "qemb", unit_from("qemb", "qnrm").alias("qe"))
    probed = _probe_cells(q, cv, _NPROBE).select("query_id", "qe", "label")
    scored = (
        u.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot("qe", "ue"), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Quantization (PQ-shaped): int8-style codes + integer-dot ANN
# ---------------------------------------------------------------------------

_QSCALE = 200  # values are in [-0.53, 0.46]; floor(x*200) fits int8 range


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, qv): integer-quantized embedding codes."""
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    qv = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * _QSCALE).cast("long"),
    )
    return e.select("vec_id", "label", qv.alias("qv"))


_QUANT_CTE = f"""
q8 AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings WHERE embedding IS NOT NULL
)
"""


@register(
    "embed_quantization_error",
    oracle=f"""
WITH {_QUANT_CTE},
err AS (
  SELECT q8.label,
         list_sum(list_transform(generate_series(1, {_DIM}),
           i -> pow(CAST(e.embedding[i] AS DOUBLE) - qv[i] / {_QSCALE}.0, 2))) AS se
  FROM q8 JOIN embeddings e USING (vec_id)
)
SELECT label,
       count(*) AS n,
       round(avg(se / {_DIM}), 6) AS avg_mse,
       round(max(se / {_DIM}), 6) AS max_mse
FROM err
GROUP BY label
ORDER BY label
""",
)
def embed_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization of embeddings (floor(x*{_QSCALE}) — int8-range
    codes, 4x smaller than float32) with per-label reconstruction MSE.
    The storage-shrinking step an IVF-PQ index starts from; quantized
    codes are exact integers, so engines agree bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    q = _quantized(spark, sf_dir)
    joined = e.join(q, ["vec_id"]).select(
        q.label.alias("label"),
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            "qv",
            lambda x, c: F.pow(x - c / _QSCALE, 2),
        ).alias("se_terms"),
    )
    se = F.aggregate("se_terms", F.lit(0.0), lambda acc, x: acc + x)
    return (
        joined.select("label", (se / _DIM).alias("mse"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("mse"), 6).alias("avg_mse"),
            F.round(F.max("mse"), 6).alias("max_mse"),
        )
        .orderBy("label")
    )


@register(
    "ann_quantized_topk",
    # fixed-cell tier: candidates grow as nprobe*n/8 per query (the sf100 fixed-k wall, SCALE.md); the sqrt tier is the scale path
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk"
    ),
    oracle=f"""
WITH {_QUANT_CTE},
q AS (SELECT vec_id AS query_id, qv AS qq FROM q8 WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, {_DIM}),
           i -> q.qq[i] * c.qv[i])) AS BIGINT) AS dot_q
  FROM q JOIN q8 c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, rank, dot_q FROM ranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN over quantized codes: integer dot products (exact — no FP
    comparison risk at all), ranked per query. The memory-bandwidth
    play at 100 TB: 4x less data per comparison and SIMD-friendly
    integer math; re-rank survivors with exact float cosine
    (ann_brute_topk) for final ordering."""
    q8 = _quantized(spark, sf_dir).cache()
    q8.count()  # eager build before probe+query scans
    q = q8.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    dot_q = F.aggregate(
        F.zip_with("qq", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        q8.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), dot_q.alias("dot_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


@register(
    "ann_ivf_adc_topk",
    # fixed-cell tier: candidates grow as nprobe*n/8 per query (the sf100 fixed-k wall, SCALE.md); the sqrt tier is the scale path
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk"
    ),
    oracle=f"""
WITH {_CENT_CTE},
{_QUANT_CTE},
q AS (
  SELECT vec_id AS query_id, embedding AS qemb
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id % 100 = 0
),
qd AS (
  SELECT q.query_id, cv.label,
         list_sum(list_transform(generate_series(1, {_DIM}),
           i -> (CAST(q.qemb[i] AS DOUBLE) - cv.cvec[i])
              * (CAST(q.qemb[i] AS DOUBLE) - cv.cvec[i]))) AS d2
  FROM q CROSS JOIN cv
),
probed AS (
  SELECT query_id, label FROM (
    SELECT query_id, label,
           row_number() OVER (
             PARTITION BY query_id ORDER BY round(d2, 6), label
           ) AS cr
    FROM qd
  ) WHERE cr <= {_NPROBE}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(generate_series(1, {_DIM}),
           i -> CAST(q.qemb[i] AS DOUBLE) * (c.qv[i] / {_QSCALE}.0))), 4) AS adc
  FROM probed p
  JOIN q ON q.query_id = p.query_id
  JOIN q8 c ON c.label = p.label AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc DESC, neighbor_id
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, rank, adc FROM ranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
)
def ann_ivf_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + asymmetric distance computation (the IVF-PQ search recipe):
    coarse cells prune candidates ({_NPROBE} nearest centroids per
    query), then candidates are scored with the ASYMMETRIC dot — exact
    float query against the quantized ({_QSCALE}x int) database codes,
    reconstructed per term as qv/{_QSCALE}. The query never loses
    precision; only the stored side pays quantization error — exactly
    FAISS's IndexIVFPQ distance table trick, expressed relationally.

    At 100 TB the scan side touches nprobe/k of the corpus AND reads 4x
    fewer bytes per vector (codes, not floats); a final exact re-rank
    of survivors (ann_brute_topk's scorer) restores full precision.
    """
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    q8 = _quantized(spark, sf_dir).cache()
    q8.count()  # eager: candidate side, probed per query cell

    cv = _centroid_arrays(e)
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qemb"),
    )
    probed = _probe_cells(q, cv, _NPROBE)
    adc = F.round(
        F.aggregate(
            F.zip_with("qemb", "qv", lambda x, c: x * (c / _QSCALE)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )
    scored = (
        q8.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


@register(
    "embed_neardup_gemm",
    # exact all-pairs GEMM: O(n^2 d), ~5 TFLOP at 200k (excluded from the sf10 bench series by design)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="embed_neardup_lsh"
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL}
SELECT
  a.vec_id AS vec_a,
  b.vec_id AS vec_b,
  round({dot_sql('a.ue', 'b.ue', _DIM)}, 4) AS cos
FROM unit a JOIN unit b ON a.vec_id < b.vec_id
WHERE round({dot_sql('a.ue', 'b.ue', _DIM)}, 4) >= {_NEARDUP_THRESHOLD}
ORDER BY vec_a, vec_b
""",
    bench=True,
)
def embed_neardup_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embed_neardup computed by the blocked-GEMM operator
    (operators/gemm.py): the corpus materializes executor-side as
    hash-sharded parquet and each partition emits its block of the
    similarity matrix from one BLAS matmul per shard — the throughput
    path when the interpreted zip_with/aggregate fold dominates.
    Repeated runs on the same sf_dir reuse the shard materialization
    in-process (cache_key), so bench best-of-2 pays the shuffle once.
    Same oracle as embed_neardup — and since r10 the emitted cosines
    are BIT-IDENTICAL to the fold (float32 prefilter under a covering
    margin + exact-order float64 rescore of survivors, see
    operators/gemm.py). The GEMM threshold is relaxed by half a
    rounding step so boundary pairs are filtered on the ROUNDED value,
    matching the SQL's filter-after-round semantics."""
    from http_log_anonymizer_spark.operators.gemm import gemm_neardup_pairs

    u = _unit_table(spark, sf_dir)
    raw = gemm_neardup_pairs(
        u, _NEARDUP_THRESHOLD - 5e-5, cache_key=f"gemm_unit|{sf_dir}"
    )
    return (
        raw.select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
        .filter(F.col("cos") >= _NEARDUP_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


_KM_K = 8
_KM_ROUNDS = 4


def _km_ctes(src: str = "embeddings") -> str:
    from http_log_anonymizer_spark.operators.kmeans import kmeans_lloyd_sql

    return kmeans_lloyd_sql(k=_KM_K, rounds=_KM_ROUNDS, qscale=1000, dim=_DIM, src=src)


@register(
    "kmeans_cluster_sizes",
    oracle=f"""
WITH {_km_ctes()}
SELECT cluster, count(*) AS n_vectors
FROM kassign{_KM_ROUNDS}
GROUP BY cluster
ORDER BY cluster
""",
)
def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embeddings, reported as per-cluster sizes.
    Uses kmeans_quantized (operators/kmeans.py): integer-quantized
    Lloyd's with md5 seeding, rounded-distance tie-breaks and a FIXED
    round count, so the whole training run unrolls into oracle SQL and
    the driver hash-checks the learned clustering itself (VERDICT r02
    item 2). Determinism/convergence of the float variant stays pinned
    in tests/test_kmeans.py."""
    from http_log_anonymizer_spark.operators.kmeans import kmeans_quantized_table

    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024).select("vec_id", "embedding")
    assignments, _centroids = kmeans_quantized_table(e, k=_KM_K, rounds=_KM_ROUNDS)
    return (
        assignments.groupBy("cluster")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cluster")
    )


@register(
    "kmeans_silhouette_report",
    oracle=f"""
WITH {_km_ctes()},
ksil_d AS (
  SELECT a.vec_id, a.cluster AS assigned, c.cluster AS label,
         sqrt(list_sum(list_transform(generate_series(1, {_DIM}),
           i -> (a.qv[i] / 1000.0 - c.c[i])
              * (a.qv[i] / 1000.0 - c.c[i])))) AS d
  FROM kassign{_KM_ROUNDS} a CROSS JOIN kcent{_KM_ROUNDS} c
),
ksil_ab AS (
  SELECT vec_id, assigned,
         min(CASE WHEN label = assigned THEN d END) AS da,
         min(CASE WHEN label <> assigned THEN d END) AS db
  FROM ksil_d GROUP BY vec_id, assigned
),
ksil_s AS (
  SELECT assigned AS cluster,
         CASE WHEN greatest(da, COALESCE(db, da)) > 0
              THEN CAST(floor((COALESCE(db, da) - da)
                   / greatest(da, COALESCE(db, da)) * 1000000) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS s_micro
  FROM ksil_ab
),
ksil_g AS (
  SELECT cluster, count(*) AS n_vectors,
         CAST(sum(s_micro) AS BIGINT) AS ssum,
         CAST(min(s_micro) AS BIGINT) AS smin,
         CAST(max(s_micro) AS BIGINT) AS smax
  FROM ksil_s GROUP BY cluster
),
ksil_all AS (
  SELECT CAST(cluster AS BIGINT) AS cluster, n_vectors, ssum, smin, smax
  FROM ksil_g
  UNION ALL
  SELECT CAST(-1 AS BIGINT), CAST(sum(n_vectors) AS BIGINT),
         CAST(sum(ssum) AS BIGINT), CAST(min(smin) AS BIGINT),
         CAST(max(smax) AS BIGINT)
  FROM ksil_g
)
SELECT cluster, n_vectors,
       round(ssum / (n_vectors * 1000000.0), 6) AS mean_silhouette,
       round(smin / 1000000.0, 6) AS min_silhouette,
       round(smax / 1000000.0, 6) AS max_silhouette
FROM ksil_all
ORDER BY cluster
""",
)
def kmeans_silhouette_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality audit of the k-means run the registry ships:
    the SIMPLIFIED silhouette (Kaufman & Rousseeuw 1990; the
    centroid-distance variant scikit-learn calls simplified
    silhouette) per cluster and pooled (cluster = -1): for each vector
    a = distance to its own centroid, b = nearest OTHER centroid,
    s = (b - a) / max(a, b). Mean s near 1 = tight separated cells,
    near 0 = overlapping cells (the honest reading on isotropic
    synthetic embeddings), negative = vectors parked in the wrong
    cell. This is the table an IVF operator reads before trusting its
    cell layout (the recall reports measure the consequence; this
    measures the cause).

    Determinism: the training run is kmeans_quantized (exact integer
    sums, md5 seeds, fixed rounds — the SQL-replayable variant);
    silhouette distances reuse the fold-order-exact d2 (zip_with +
    left-fold aggregate == list_sum's serial fold), sqrt is correctly
    rounded IEEE in both engines, each vector's s lands on a 1e-6
    integer grid via floor(), and per-cluster means divide exact
    integer sums once — no double summation anywhere.

    Scale shape: distances are a whole-stage-codegen expression over k
    literal centroid arrays (no join, no shuffle for the k x d side);
    the only shuffle is the k-group rollup, map-side combined. Work is
    O(n * k * d) — the same as one extra assignment round."""
    from http_log_anonymizer_spark.operators.kmeans import kmeans_quantized_table

    e = load_table(
        spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024
    ).select("vec_id", "embedding")
    assignments, cent = kmeans_quantized_table(e, k=_KM_K, rounds=_KM_ROUNDS)
    qv = e.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 1000).cast("long"),
        ).alias("qv"),
    ).join(assignments, "vec_id")

    structs = []
    for c, cvec in enumerate(cent):
        carr = F.array(*[F.lit(v) for v in cvec])
        diff = F.zip_with(
            "qv", carr, lambda x, cc: (x / 1000.0 - cc) * (x / 1000.0 - cc)
        )
        d = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, t: acc + t))
        structs.append(F.struct(d.alias("d"), F.lit(c).alias("label")))
    arr = F.array(*structs)
    da = F.element_at(
        F.filter(arr, lambda t: t["label"] == F.col("cluster")), 1
    )["d"]
    db = F.coalesce(
        F.array_min(
            F.transform(
                F.filter(arr, lambda t: t["label"] != F.col("cluster")),
                lambda t: t["d"],
            )
        ),
        da,
    )
    s_micro = (
        F.when(
            F.greatest(da, db) > 0,
            F.floor((db - da) / F.greatest(da, db) * 1000000).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("s_micro")
    )
    sv = qv.select(F.col("cluster").alias("cluster"), s_micro)
    g = sv.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.sum("s_micro").cast("long").alias("ssum"),
        F.min("s_micro").cast("long").alias("smin"),
        F.max("s_micro").cast("long").alias("smax"),
    )
    pooled = g.agg(
        F.lit(-1).cast("long").alias("cluster"),
        F.sum("n_vectors").cast("long").alias("n_vectors"),
        F.sum("ssum").cast("long").alias("ssum"),
        F.min("smin").cast("long").alias("smin"),
        F.max("smax").cast("long").alias("smax"),
    )
    rows = g.select(
        F.col("cluster").cast("long").alias("cluster"),
        "n_vectors",
        "ssum",
        "smin",
        "smax",
    ).unionByName(pooled)
    return rows.select(
        "cluster",
        "n_vectors",
        F.round(F.col("ssum") / (F.col("n_vectors") * 1000000.0), 6).alias(
            "mean_silhouette"
        ),
        F.round(F.col("smin") / 1000000.0, 6).alias("min_silhouette"),
        F.round(F.col("smax") / 1000000.0, 6).alias("max_silhouette"),
    ).orderBy("cluster")


@register(
    "ann_ivf_kmeans_topk",
    # fixed-cell tier: candidates grow as nprobe*n/8 per query (the sf100 fixed-k wall, SCALE.md); the sqrt tier is the scale path
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk"
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL},
{_km_ctes()},
q AS (
  SELECT vec_id AS query_id, embedding AS qemb, ue AS qe
  FROM unit WHERE vec_id % 100 = 0
),
kqd AS (
  SELECT q.query_id, c.cluster AS label,
         list_sum(list_transform(generate_series(1, {_DIM}),
           i -> (CAST(q.qemb[i] AS DOUBLE) - c.c[i])
              * (CAST(q.qemb[i] AS DOUBLE) - c.c[i]))) AS d2
  FROM q CROSS JOIN kcent{_KM_ROUNDS} c
),
kprobed AS (
  SELECT query_id, label FROM (
    SELECT query_id, label,
           row_number() OVER (
             PARTITION BY query_id ORDER BY round(d2, 6), label
           ) AS cr
    FROM kqd
  ) WHERE cr <= 3
),
kscored AS (
  SELECT q.query_id, u.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'u.ue', _DIM)}, 4) AS cos
  FROM kprobed p
  JOIN q ON q.query_id = p.query_id
  JOIN kassign{_KM_ROUNDS} a ON a.cluster = p.label
  JOIN unit u ON u.vec_id = a.vec_id AND u.vec_id <> q.query_id
),
kranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
  ) AS rank FROM kscored
)
SELECT query_id, neighbor_id, rank, cos FROM kranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF index build + search with LEARNED cells: k-means trains
    the coarse quantizer, vectors are bucketed by their assigned
    centroid, queries probe the 3 nearest learned centroids and
    exact-cosine rerank within those cells — the complete FAISS
    IndexIVFFlat lifecycle. Training uses kmeans_quantized
    (operators/kmeans.py): integer-quantized sums, md5 seeding,
    rounded-distance tie-breaks and a fixed round count make the
    learned index SQL-replayable, so the driver hash-checks build AND
    search end-to-end (VERDICT r02 item 2). Recall vs brute force is
    additionally asserted in tests/test_scale_operators.py."""
    from http_log_anonymizer_spark.operators.kmeans import kmeans_quantized_table

    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024).select("vec_id", "embedding")
    assignments, centroids = kmeans_quantized_table(e, k=_KM_K, rounds=_KM_ROUNDS)
    cv = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "label int, cvec array<double>",
    )

    n = e.select("vec_id", "embedding", norm_column("embedding").alias("nrm"))
    u = (
        n.select("vec_id", "embedding", unit_from("embedding", "nrm").alias("ue"))
        .join(assignments.select("vec_id", F.col("cluster").alias("label")), "vec_id")
        .cache()
    )
    u.count()  # eager: probed by queries and candidates below

    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qemb"),
        F.col("ue").alias("qe"),
    )
    probed = _probe_cells(q, cv, 3).select("query_id", "qe", "label")
    scored = (
        u.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot("qe", "ue"), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


# sqrt-scaled IVF tier (VERDICT r04 item 2): cell count grows with the
# corpus (k = round(sqrt(n)), the FAISS IndexIVF sizing rule), so cells
# stay ~sqrt(n) wide and probing a FIXED number of cells costs
# O(nprobe * sqrt(n)) per query — sub-linear, with REAL recall, unlike
# the wide-LSH tier whose mostly-singleton buckets trade recall away.
_SQRT_ROUNDS = 2
# nprobe scales with the cell count (r05 verdict item 4): the FAISS
# rule-of-thumb probes ~sqrt(k) of the k cells, so recall holds as the
# index grows instead of decaying with a fixed probe width (measured
# 0.27@nprobe=8 at sf10, k=447). Candidate work per query becomes
# sqrt(k) * n/k = n^(3/4) — still sub-linear. Floor of 8 keeps the
# small-corpus gates at their proven probe width. sqrt of an integer
# is never exactly x.5, so round() needs no half-rule pinning.
_SQRT_NPROBE_MIN = 8


def _sqrt_nprobe(k: int) -> int:
    import math

    return max(_SQRT_NPROBE_MIN, int(round(math.sqrt(k))))


_SQRT_K_SQL = "(SELECT CAST(round(sqrt(count(*))) AS BIGINT) FROM kqv)"
_SQRT_NPROBE_SQL = (
    f"(SELECT greatest({_SQRT_NPROBE_MIN}, "
    "CAST(round(sqrt(CAST(round(sqrt(count(*))) AS BIGINT))) AS BIGINT)) FROM kqv)"
)


# FAISS posture: TRAIN on a deterministic bounded sample (~50 vectors
# per cell), ADD the full corpus. Full-corpus training is n*k*d =
# n^1.5*d per round at k=sqrt(n) — measured 1128 s cold at n=2M; with
# the sample only the single final assignment pass stays n^1.5.
# smod = max(1, n // (50k)); the gates (sf<=0.01) have smod=1, so the
# sample is a no-op there and results are unchanged.
_SQRT_SMOD_SQL = (
    "(SELECT greatest(1, count(*) // (50 * CAST(round(sqrt(count(*))) AS BIGINT)))"
    " FROM kqv)"
)


def _sqrt_km_ctes(src: str = "embeddings") -> str:
    from http_log_anonymizer_spark.operators.kmeans import kmeans_lloyd_sql

    return kmeans_lloyd_sql(
        k=_SQRT_K_SQL,
        rounds=_SQRT_ROUNDS,
        qscale=1000,
        dim=_DIM,
        src=src,
        train_where=f"vec_id % {_SQRT_SMOD_SQL} = 0",
    )


def _sqrt_search_ctes() -> str:
    """q .. kranked: the sqrt-IVF search replay (probe the trained
    cells, exact-cosine rerank, rank) — shared by the topk oracle and
    the registered recall report."""
    return f"""q AS (
  SELECT vec_id AS query_id, embedding AS qemb, ue AS qe
  FROM unit WHERE vec_id % 100 = 0
),
kqd AS (
  SELECT q.query_id, c.cluster AS label,
         list_sum(list_transform(generate_series(1, {_DIM}),
           i -> (CAST(q.qemb[i] AS DOUBLE) - c.c[i])
              * (CAST(q.qemb[i] AS DOUBLE) - c.c[i]))) AS d2
  FROM q CROSS JOIN kcent{_SQRT_ROUNDS} c
),
kprobed AS (
  SELECT query_id, label FROM (
    SELECT query_id, label,
           row_number() OVER (
             PARTITION BY query_id ORDER BY round(d2, 6), label
           ) AS cr
    FROM kqd
  ) WHERE cr <= {_SQRT_NPROBE_SQL}
),
kscored AS (
  SELECT q.query_id, u.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'u.ue', _DIM)}, 4) AS cos
  FROM kprobed p
  JOIN q ON q.query_id = p.query_id
  JOIN kassign{_SQRT_ROUNDS} a ON a.cluster = p.label
  JOIN unit u ON u.vec_id = a.vec_id AND u.vec_id <> q.query_id
),
kranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
  ) AS rank FROM kscored
)"""


@register(
    "ann_ivf_sqrt_topk",
    bench=True,  # the data-scaled learned-IVF tier is a headline plan
    oracle=f"""
WITH {UNIT_CTE_SQL},
{_sqrt_km_ctes()},
{_sqrt_search_ctes()}
SELECT query_id, neighbor_id, rank, cos FROM kranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
)
def ann_ivf_sqrt_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a DATA-SCALED learned coarse quantizer: k-means
    with k = round(sqrt(n)) cells (the FAISS IndexIVF sizing rule —
    cells of ~sqrt(n) vectors each), trained by the broadcast-table
    Lloyd variant (operators/kmeans.py:kmeans_quantized_table, same
    integer-quantized determinization as ann_ivf_kmeans_topk so the
    DuckDB oracle replays training with a dynamic-k subquery), then
    probe-sqrt(k)-cells (nprobe = max({_SQRT_NPROBE_MIN}, round(sqrt(k))),
    the FAISS rule — r05 verdict item 4) + exact-cosine rerank.

    Why this tier exists (VERDICT r04 item 2): the fixed-k learned
    tier stops pruning as the corpus grows (cells widen linearly), and
    the wide-LSH tier keeps its cost flat only because its buckets
    degenerate toward singletons (recall decays). sqrt cells split the
    difference exactly: per-query candidate work is
    nprobe * n / k = sqrt(k) * sqrt(n) = n^(3/4) — sub-linear — while the
    cells stay populated, so recall holds (measured vs ann_brute_topk
    in tests + SCALE.md).

    Scale shape: the trained centroid table is k x dim = sqrt(n) * d
    doubles — 16 MB even at n = 10^9, d = 64 — so it ships per
    executor at any corpus size (sqrt growth is what keeps it
    bounded); per training round one scan with fused
    assign+partial-update (operators/kmeans.py). Search runs the IVF
    kernels (operators/ivf.py): probe ranks cells in one pass over the
    query slice, and the scan cogroups the inverted file with its
    probe list BY CELL — per-cell fold-order-exact numpy scoring with
    local top-(k+margin) per (query, cell) — so the global rank window
    sees q * nprobe * (k+margin) rows instead of every scored
    candidate, and the probe set is never broadcast or collected (the
    narrow-LSH tier's documented mistake). One driver-side count()
    sizes k; it is the index-build's only full-scan action and is
    column-pruned to row-group metadata."""
    import math

    from http_log_anonymizer_spark.operators.ivf import ivf_probe_cells, ivf_scan_topk
    from http_log_anonymizer_spark.operators.kmeans import kmeans_quantized_table

    e = load_table(
        spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024
    ).select("vec_id", "embedding")
    n = e.count()
    k = int(round(math.sqrt(n)))
    smod = max(1, n // (50 * k))
    assignments, centroids = kmeans_quantized_table(
        e,
        k=k,
        rounds=_SQRT_ROUNDS,
        qscale=1000,
        train_filter=(F.col("vec_id") % smod == 0),
    )

    u = (
        e.select("vec_id", "embedding", norm_column("embedding").alias("nrm"))
        .select("vec_id", unit_from("embedding", "nrm").alias("ue"))
        .join(assignments.select("vec_id", F.col("cluster").alias("label")), "vec_id")
    )

    qsrc = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0)
    q = qsrc.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qemb"),
        norm_column("embedding").alias("qnrm"),
    ).select("query_id", "qemb", unit_from("qemb", "qnrm").alias("qe"))
    probed = ivf_probe_cells(q, centroids, _sqrt_nprobe(k))
    return ivf_scan_topk(u, probed, _TOPK)


# True IVF-PQ (Jégou, Douze & Schmid, TPAMI 2011): coarse learned
# cells + PRODUCT-QUANTIZED residual codebooks + asymmetric-distance
# scan. ann_ivf_adc_topk quantizes residuals SCALAR-ly; this trains
# per-subspace k-means codebooks — the actual FAISS IndexIVFPQ recipe.
_PQ_M = 8  # subspaces (8 x 4-bit codes = 32 bits/vector; m=4 measured recall 0.16, m=8 acceptable)
_PQ_DSUB = _DIM // _PQ_M
_PQ_K = 16  # codebook entries per subspace (4-bit codes)
_PQ_K8 = 256  # 8-bit codebooks: 8 x 8 = 64 bits/vector (r05 verdict item 7)
_PQ_ROUNDS = 2
_PQ_NPROBE = 3


# Structured random rotation for the OPQ-style PQ tier (ann_ivf_opq_topk):
# seeded sign flips + Walsh-Hadamard. H[j][i] = (-1)^popcount(i & j) and
# (1/sqrt(d)) * H is orthonormal, so with d = 64 the rotated vector is
# y = H @ (s * x) / 8 — an isometry (dots and distances preserved). The
# input is quantized to integers FIRST (floor(x * 2^17): float32 * 2^17
# is exact), the Hadamard sum is pure int64 arithmetic (order-free,
# bit-identical in any engine), and the final division by 8 * 2^17 = 2^20
# is exact — the rotation introduces ZERO float nondeterminism.
_OPQ_QS = 1 << 17
_OPQ_SIGNS = [
    -1, 1, 1, -1, -1, 1, -1, 1, -1, -1, 1, 1, 1, 1, 1, 1,
    1, -1, 1, -1, 1, -1, -1, 1, 1, 1, -1, 1, 1, -1, -1, -1,
    -1, 1, 1, -1, 1, 1, -1, 1, -1, 1, 1, -1, -1, 1, -1, 1,
    1, 1, 1, -1, -1, -1, -1, -1, 1, -1, 1, 1, 1, 1, -1, 1,
]  # seeded once (numpy default_rng(42)), inlined so both engines share it


def _opq_rot_matrix() -> "np.ndarray":
    """(64 x 64) int64 matrix M with M[j][i] = H[j][i] * s_i, so the
    rotation numerator is the exact integer matvec y = M @ q."""
    import numpy as np

    idx = np.arange(_DIM)
    popc = np.array(
        [[bin(int(i) & int(j)).count("1") for i in idx] for j in idx],
        dtype=np.int64,
    )
    h = 1 - 2 * (popc % 2)
    return h * np.array(_OPQ_SIGNS, dtype=np.int64)[None, :]


def _opq_rotate(df: DataFrame) -> DataFrame:
    """Rotate (vec_id, embedding) rows: y = H @ (s * floor(x * 2^17)) / 2^20.

    Arrow-batched integer numpy kernel (r10, guide §4.2): the Hadamard
    numerator is PURE int64 arithmetic (floor(float64(x) * 2^17) is the
    same IEEE double multiply + floor in numpy and the JVM; the matvec
    sums int64 exactly in any order; the final division by 2^20 of a
    < 2^53 integer is exact), so the kernel is bit-identical to the
    previous Catalyst HOF fold AND to the DuckDB ``rotemb`` CTE — the
    fold was interpreted (CodegenFallback), ~4096 interpreted ops per
    vector, measured ~10 s per corpus pass at 2k vectors; the matvec is
    one ``q @ M.T`` per Arrow batch. NULL embeddings pass through as
    NULL rows, matching ``transform(NULL) -> NULL``."""
    import numpy as np
    import pandas as pd

    mat_t = _opq_rot_matrix().T  # (i, j) layout for q(row) @ M.T
    div = float(8 * _OPQ_QS)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emb = pdf["embedding"]
            mask = emb.notna().to_numpy()
            out = np.empty(len(pdf), dtype=object)
            if mask.any():
                x = np.array(
                    [np.asarray(v, dtype=np.float64) for v in emb[mask]]
                )
                q = np.floor(x * float(_OPQ_QS)).astype(np.int64)
                y = (q @ mat_t).astype(np.float64) / div
                for k, idx in enumerate(np.nonzero(mask)[0]):
                    out[idx] = y[k]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].astype("int64"), "embedding": out}
            )

    return df.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def _opq_rot_cte() -> str:
    """DuckDB CTE ``rotemb`` mirroring :func:`_opq_rotate` term for term."""
    sgn = "[" + ", ".join(str(s) for s in _OPQ_SIGNS) + "]"
    return f"""rotemb AS MATERIALIZED (
  SELECT vec_id,
         list_transform(generate_series(0, {_DIM - 1}), j ->
           CAST(list_sum(list_transform(generate_series(0, {_DIM - 1}), i ->
             (1 - 2 * (bit_count(i & j) % 2)) * sx[i + 1])) AS DOUBLE)
           / {8 * _OPQ_QS}.0) AS embedding
  FROM (
    SELECT vec_id,
           list_transform(generate_series(1, {_DIM}), i ->
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {_OPQ_QS}) AS BIGINT)
             * ({sgn})[i]) AS sx
    FROM embeddings WHERE embedding IS NOT NULL
  )
),
"""


def _pq_oracle(kq: int = _PQ_K, src: str = "embeddings", pre: str = "") -> str:
    from http_log_anonymizer_spark.operators.kmeans import kmeans_lloyd_sql

    KR = _KM_ROUNDS
    sub_trains = []
    for m in range(_PQ_M):
        a = m * _PQ_DSUB + 1
        b = (m + 1) * _PQ_DSUB
        sub_trains.append(
            f"pqsrc{m} AS MATERIALIZED (SELECT vec_id, r[{a}:{b}] AS sub FROM resid)"
        )
        sub_trains.append(
            kmeans_lloyd_sql(
                k=kq,
                rounds=_PQ_ROUNDS,
                dim=_PQ_DSUB,
                prefix=f"pq{m}_",
                src=f"pqsrc{m}",
                vec="sub",
            )
        )
    code_joins = "\n  ".join(
        f"JOIN pq{m}_kassign{_PQ_ROUNDS} p{m} ON p{m}.vec_id = a.vec_id"
        for m in range(_PQ_M)
    )
    code_cols = ", ".join(f"p{m}.cluster AS c{m}" for m in range(_PQ_M))
    sub_dots = " + ".join(
        f"list_sum(list_transform(generate_series(1, {_PQ_DSUB}), "
        f"i -> CAST(s.qemb[{m * _PQ_DSUB} + i] AS DOUBLE) * t{m}.c[i]))"
        for m in range(_PQ_M)
    )
    lut_joins = "\n  ".join(
        f"JOIN pq{m}_kcent{_PQ_ROUNDS} t{m} ON t{m}.cluster = s.c{m}"
        for m in range(_PQ_M)
    )
    return f"""
WITH {pre}{_km_ctes(src)},
resid AS MATERIALIZED (
  SELECT e.vec_id, a.cluster,
         list_transform(generate_series(1, {_DIM}),
           i -> CAST(e.embedding[i] AS DOUBLE) - c.c[i]) AS r
  FROM {src} e
  JOIN kassign{KR} a ON a.vec_id = e.vec_id
  JOIN kcent{KR} c ON c.cluster = a.cluster
),
{",".join(sub_trains)},
codes AS MATERIALIZED (
  SELECT a.vec_id, a.cluster, {code_cols}
  FROM kassign{KR} a
  {code_joins}
),
q AS (
  SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qemb
  FROM {src} WHERE embedding IS NOT NULL AND vec_id % 100 = 0
),
kqd AS (
  SELECT q.query_id, q.qemb, c.cluster AS label,
         list_sum(list_transform(generate_series(1, {_DIM}),
           i -> (q.qemb[i] - c.c[i]) * (q.qemb[i] - c.c[i]))) AS d2,
         list_sum(list_transform(generate_series(1, {_DIM}),
           i -> q.qemb[i] * c.c[i])) AS dqc
  FROM q CROSS JOIN kcent{KR} c
),
kprobed AS (
  SELECT query_id, qemb, label, dqc FROM (
    SELECT query_id, qemb, label, dqc,
           row_number() OVER (
             PARTITION BY query_id ORDER BY round(d2, 6), label
           ) AS cr
    FROM kqd
  ) WHERE cr <= {_PQ_NPROBE}
),
cand AS (
  SELECT p.query_id, p.qemb, p.dqc, c.vec_id AS neighbor_id,
         {", ".join(f"c.c{m}" for m in range(_PQ_M))}
  FROM kprobed p JOIN codes c ON c.cluster = p.label AND c.vec_id <> p.query_id
),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         round(s.dqc + {sub_dots}, 4) AS adc
  FROM cand s
  {lut_joins}
),
kranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc DESC, neighbor_id
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, rank, adc FROM kranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
"""


def _pq_impl(
    spark: SparkSession, sf_dir: str, kq: int, rotate: bool = False
) -> DataFrame:
    """Shared IVF-PQ build+search for the 4-bit (kq=16) and 8-bit
    (kq=256) tiers — see ann_ivf_pq_topk for the construction. The
    8-bit tier trains its subspace codebooks with the table kernel
    (kmeans_quantized_table — bit-identical math; at k in the hundreds
    the literal-branch plan stops compiling usefully), the 4-bit tier
    keeps the literal-branch trainer it was hash-verified with.
    ``rotate=True`` applies the seeded sign-flip + Walsh-Hadamard
    rotation (see ann_ivf_opq_topk) to corpus AND queries before the
    build, leaving everything downstream unchanged."""
    from http_log_anonymizer_spark.operators.kmeans import (
        kmeans_quantized_multi,
        kmeans_quantized_table,
    )

    e = load_table(
        spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024
    ).select("vec_id", "embedding")
    if rotate:
        # pin the rotated corpus (same rationale as _sqrt_pq_scan: the
        # training loop re-triggers its input; rotation is per-action
        # interpreted HOF work otherwise)
        e = _opq_rotate(e).localCheckpoint()
    assignments, centroids = kmeans_quantized_table(e, k=_KM_K, rounds=_KM_ROUNDS)
    cv = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "label int, cvec array<double>",
    )
    resid = (
        e.join(assignments.select("vec_id", F.col("cluster").alias("label")), "vec_id")
        .join(F.broadcast(cv), "label")
        .select(
            "vec_id",
            "label",
            F.zip_with(
                F.col("embedding").cast("array<double>"), "cvec", lambda x, c: x - c
            ).alias("r"),
        )
        .localCheckpoint()
    )

    # Fused subspace training (r10, guide §2.4/§5): the 8 codebooks
    # previously trained sequentially — 8 eager checkpoints, 8 seed
    # collects, 8x2 round jobs, then 8 vec_id joins to assemble the
    # code table. kmeans_quantized_multi runs ONE job per round for all
    # subspaces and emits (vec_id, label, c0..c7) directly (no joins);
    # seeds/sums/argmin are the same numbers, results unchanged.
    codes, cents = kmeans_quantized_multi(
        resid,
        n_sub=_PQ_M,
        dsub=_PQ_DSUB,
        k=kq,
        rounds=_PQ_ROUNDS,
        extra=("label",),
        vec_col="r",
    )
    luts = [
        spark.createDataFrame(
            [(int(j), [float(x) for x in c]) for j, c in enumerate(cents[m])],
            f"c{m} int, t{m} array<double>",
        )
        for m in range(_PQ_M)
    ]

    qsrc = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0)
    if rotate:
        qsrc = _opq_rotate(qsrc.select("vec_id", "embedding"))
    q = qsrc.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qemb"),
    )
    probed = _probe_cells(q, cv, _PQ_NPROBE)
    probed = probed.join(F.broadcast(cv), "label").select(
        "query_id", "qemb", "label", dot("qemb", "cvec").alias("dqc")
    )
    cand = codes.join(probed, "label").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand
    subtotal = F.col("dqc")
    for m in range(_PQ_M):
        scored = scored.join(F.broadcast(luts[m]), f"c{m}")
        subtotal = subtotal + dot(
            F.slice("qemb", m * _PQ_DSUB + 1, _PQ_DSUB), f"t{m}"
        )
    scored = scored.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(subtotal, 4).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


@register(
    "ann_ivf_pq_topk",
    # fixed-cell tier (see ann_ivf_topk gate comment)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_pq_topk"
    ),
    oracle=_pq_oracle(),
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE IVF-PQ (Jégou et al., TPAMI 2011 — the FAISS IndexIVFPQ
    recipe): learned coarse cells (the kmeans_quantized {_KM_K}-cell
    quantizer), PRODUCT-quantized residuals — {_PQ_M} subspaces of
    {_PQ_DSUB} dims, each with its own {_PQ_K}-entry k-means codebook
    trained on the residual slices ({_PQ_ROUNDS} quantized Lloyd
    rounds, SQL-replayed with per-subspace CTE prefixes) — and
    asymmetric-distance search: score(q, x) = dot(q, c_cell) + sum_m
    dot(q_sub_m, codebook_m[code_m(x)]), i.e. the query stays float
    while candidates are 4 x 4-bit codes. ann_ivf_adc_topk is the
    scalar-quantization cousin; this one carries the learned-codebook
    machinery end to end, hash-verified through training, encoding AND
    search.

    Measured recall@5 at sf0.01, all at the same {_PQ_NPROBE}-cell
    probe (the compression/recall trade, tests/test_scale_operators):
    exact in-cell scoring (ann_ivf_kmeans_topk, 512 bits/vec) >= 0.6;
    scalar ADC (ann_ivf_adc_topk, 512 bits) 0.40; THIS tier at 32
    bits/vec 0.24 (m=4/16 bits measured 0.16 and was rejected). The
    synthetic corpus is isotropic — no low-dim structure for PQ to
    exploit — so these are floor numbers; the dial is m/k, paid in
    code width.

    Scale shape: codebooks are {_PQ_M} x {_PQ_K} x {_PQ_DSUB} doubles
    (KBs — broadcast), codes are {_PQ_M} small ints per vector (16x
    compression of the scan payload at d={_DIM}), candidates come from
    the {_PQ_NPROBE}-cell probe (equi-join on the cell id, no forced
    broadcast of the corpus-proportional probe side), and the ADC sum
    is four {_PQ_DSUB}-dim dots against broadcast codebook rows."""
    return _pq_impl(spark, sf_dir, _PQ_K)


@register(
    "ann_ivf_pq8_topk",
    # fixed-cell tier (see ann_ivf_topk gate comment)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_pq_topk"
    ),
    oracle=_pq_oracle(_PQ_K8),
)
def ann_ivf_pq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with 8-BIT codebooks (r05 verdict item 7 — the recall
    point above the 32-bit size anchor): same construction as
    ann_ivf_pq_topk but each of the {_PQ_M} subspaces trains a
    {_PQ_K8}-entry codebook, so codes are {_PQ_M} x 8 = 64 bits/vector
    (8 bytes — still a 64x compression of the float64 scan payload at
    d={_DIM}) and the per-subspace quantization error drops by the
    standard rate-distortion step. This is FAISS's default code width
    (PQ{_PQ_M}x8). Recall ladder at the same {_PQ_NPROBE}-cell probe
    is measured in SCALE.md; the 4-bit tier stays registered as the
    bytes/vector floor.

    Scale notes: codebooks are {_PQ_M} x {_PQ_K8} x {_PQ_DSUB} doubles
    (128 KB — broadcast, unchanged shape); training uses the table
    kernel (operators/kmeans.py:kmeans_quantized_table) because
    {_PQ_K8} literal branches stop compiling usefully — the SQL replay
    is IDENTICAL (kmeans_lloyd_sql is shared by both trainers).
    Corpora smaller than {_PQ_K8} rows per residual slice simply seed
    fewer centroids — both engines derive the seed set the same way."""
    return _pq_impl(spark, sf_dir, _PQ_K8)


@register(
    "ann_ivf_opq_topk",
    # fixed-cell tier (see ann_ivf_topk gate comment)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_pq_topk"
    ),
    oracle=_pq_oracle(src="rotemb", pre=_opq_rot_cte()),
)
def ann_ivf_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-STYLE rotated IVF-PQ: the standard pre-rotation baseline for
    product quantization (Ge et al., "Optimized Product Quantization",
    CVPR 2013 §4 'RR' / random-rotation variant; FAISS exposes it as
    OPQ's initialization and Ailon & Chazelle's FJLT uses the same
    HD construction). Corpus AND queries are rotated by y = H(s ⊙ x)/8
    — seeded sign flips then a 64-point Walsh-Hadamard transform, an
    ORTHONORMAL map — before the exact ann_ivf_pq_topk pipeline (coarse
    cells, {_PQ_M} x {_PQ_K}-entry residual codebooks, ADC scan) runs
    unchanged in the rotated space. Because rotation is an isometry,
    true neighbor sets are preserved; what changes is how the variance
    lands across the {_PQ_M} code subspaces — the rotation spreads any
    axis-aligned or low-rank structure evenly, which is exactly the
    failure mode that sinks contiguous-slice PQ on correlated data.

    Cross-engine exactness: the input quantizes to integers FIRST
    (floor(x * 2^17) — float32 * 2^17 is exact), the Hadamard sum is
    pure int64 arithmetic (order-independent), and the final division
    by 2^20 is exact, so the rotated vectors are BIT-IDENTICAL in
    Spark and DuckDB and the whole downstream training/encode/search
    chain stays hash-checkable (verified: both gates green).

    Measured on this corpus (SCALE.md r06 ladder): the synthetic
    embeddings are near-isotropic with mild residual anisotropy
    (eigenratio ~4), so the rotation is an honesty measurement of the
    OPQ lift floor, not a guaranteed win — recorded either way next to
    the unrotated 4-bit tier's 0.24 gate recall.

    Scale shape: identical to ann_ivf_pq_topk plus one narrow
    projection — the rotation is 64 integer dots per vector, fused
    into the scan stage (no shuffle, no Python), the d x d matrix is
    never materialized (H is computed from bit_count on the fly), and
    at 100 TB it amortizes into the same one-pass encode the PQ build
    already does."""
    return _pq_impl(spark, sf_dir, _PQ_K, rotate=True)


@register(
    "ivf_residual_quantization",
    oracle=f"""
WITH {_CENT_CTE},
r AS (
  SELECT e.label, e.vec_id,
         list_transform(generate_series(1, {_DIM}),
           i -> CAST(e.embedding[i] AS DOUBLE) - cv.cvec[i]) AS res
  FROM embeddings e JOIN cv ON cv.label = e.label
  WHERE e.embedding IS NOT NULL
),
err AS (
  SELECT label,
         list_sum(list_transform(res,
           x -> (x - floor(x * {_QSCALE}) / {_QSCALE}.0)
              * (x - floor(x * {_QSCALE}) / {_QSCALE}.0))) / {_DIM} AS res_mse,
         (SELECT list_sum(list_transform(e2.embedding,
            x -> (CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * {_QSCALE}) / {_QSCALE}.0)
               * (CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * {_QSCALE}) / {_QSCALE}.0))) / {_DIM}
          FROM embeddings e2 WHERE e2.vec_id = r.vec_id) AS direct_mse
  FROM r
)
SELECT label,
       count(*) AS n,
       round(avg(direct_mse), 8) AS avg_direct_mse,
       round(avg(res_mse), 8) AS avg_residual_mse
FROM err
GROUP BY label
ORDER BY label
""",
)
def ivf_residual_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual quantization — the PQ half of IVF-PQ: instead of
    quantizing raw embeddings, quantize (embedding - cell centroid) and
    report per-cell reconstruction MSE both ways. With a FIXED grid the
    two MSEs are ~equal (floor-grid error is offset-independent); the
    production win comes from the residual's smaller dynamic range
    letting the same bit budget buy a finer grid — this query is the
    measurement that sizes that grid per cell. All arithmetic mirrors
    the oracle term-for-term: centroid from exact integer sums, floor
    quantization, left-fold sums."""
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    cv = _centroid_arrays(e)
    sq = lambda x: x * x  # noqa: E731
    qerr = lambda x: sq(x - F.floor(x * _QSCALE) / _QSCALE)  # noqa: E731
    res = (
        e.join(F.broadcast(cv), "label")
        .select(
            "label",
            "vec_id",
            F.zip_with(
                F.col("embedding").cast("array<double>"), "cvec", lambda x, c: x - c
            ).alias("res"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    res_mse = F.aggregate(
        F.transform("res", qerr), F.lit(0.0), lambda a, x: a + x
    ) / _DIM
    direct_mse = F.aggregate(
        F.transform("emb", qerr), F.lit(0.0), lambda a, x: a + x
    ) / _DIM
    return (
        res.select("label", res_mse.alias("res_mse"), direct_mse.alias("direct_mse"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("direct_mse"), 8).alias("avg_direct_mse"),
            F.round(F.avg("res_mse"), 8).alias("avg_residual_mse"),
        )
        .orderBy("label")
    )


@register(
    "hard_negative_mining",
    oracle=f"""
WITH {UNIT_CTE_SQL},
q AS (
  SELECT vec_id AS query_id, label AS qlabel, ue AS qe
  FROM unit WHERE vec_id % 100 = 0
),
scored AS (
  SELECT
    q.query_id,
    c.vec_id AS neighbor_id,
    c.label AS neg_label,
    round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id AND c.label <> q.qlabel
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
  ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, neg_label, rank, cos
FROM ranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for
    every query vector, the top-{_TOPK} most similar vectors from
    OTHER label classes — the negatives that sit closest to the
    decision boundary, which is what a contrastive/triplet trainer
    wants in its batches. Runs on operators/topk.py with label
    exclusion pushed into the scoring kernel (fold-order-exact numpy,
    per-partition partial top-k — see ann_brute_topk), so the corpus
    never shuffles and the oracle hash-matches bit-for-bit."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    # an UNLABELED vector cannot be certified as a negative (and a
    # query without a label has no class to contrast against) — the
    # oracle's c.label <> q.qlabel excludes NULLs by three-valued
    # logic, while numpy's != treats NaN as "different"; exclude
    # unlabeled rows explicitly so both engines mine the same set
    # (the planted-NULL audit's divergence)
    u = _unit_table(spark, sf_dir, extra=["label"], cache=False).filter(
        F.col("label").isNotNull()
    )
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("ue").alias("qe"),
        F.col("label").alias("xlabel"),
    )
    top = brute_topk(
        u, q, k=_TOPK, exclude_label=True, cache_key=f"annq_lab|{sf_dir}"
    )
    # attach the negative's label: the top-k table is k rows PER QUERY
    # — linear in the query count, i.e. corpus-scaled, so it is left
    # unhinted (r10 stats-less-join-side rule) and AQE promotes it to
    # the broadcast side at runtime from its true size; the label
    # table is corpus-sized and must never be the broadcast side (a
    # forced F.broadcast(top) — the pre-r10 form — would commit
    # statically at any query volume)
    # The label side is ALSO corpus-rooted: its column-pruned estimate
    # undershoots the broadcast threshold at sf10+ (found by the sweep
    # guard test the moment .benchdata/sf10 existed on disk), so the
    # static planner would build a HashedRelation over the whole
    # embeddings scan — the data_quality_report trap class. The binding
    # merge hint pins the join shuffled; both sides hash-partition on
    # the integer id.
    lab = u.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("neg_label"))
    return (
        top
        .join(lab.hint("shuffle_hash"), "neighbor_id")
        .select("query_id", "neighbor_id", "neg_label", "rank", "cos")
        .orderBy("query_id", "rank")
    )


@register(
    "ann_lsh_recall_report",
    # the ground-truth side is brute-force BY DESIGN (audit artifact)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_lsh_wide_topk", advice="Recall/ground-truth audits at scale run on a SAMPLED stratum (the brute side is the cost, and recall estimates need only a sample)."
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL},
q AS (SELECT vec_id AS query_id, ue AS qe FROM unit WHERE vec_id % 100 = 0),
bscored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id
),
btop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM bscored
  ) WHERE rank <= {_TOPK}
),
bk AS (SELECT vec_id, ue, {_bucket_sql('embedding')} AS bucket FROM unit),
qb AS (
  SELECT vec_id AS query_id, ue AS qe, bucket AS qbucket
  FROM bk WHERE vec_id % 100 = 0
),
lscored AS (
  SELECT qb.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('qb.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM qb JOIN bk c ON c.bucket = qb.qbucket AND c.vec_id <> qb.query_id
),
ltop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM lscored
  ) WHERE rank <= {_TOPK}
),
hits AS (
  SELECT b.query_id, count(l.neighbor_id) AS n_hits
  FROM btop b LEFT JOIN ltop l
    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
)
SELECT query_id,
       {_TOPK} AS k,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits * 1.0 / {_TOPK}, 4) AS recall
FROM hits
ORDER BY query_id
""",
)
def ann_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@{_TOPK} of the LSH index against exact brute
    force, as a REGISTERED artifact: both rankings are deterministic
    (rounded-cos + id tie-breaks), so the accuracy claim itself is
    driver-hash-checked instead of living only in a local test — the
    index-quality report an ANN deployment publishes next to its
    latency numbers.

    Scale shape: the brute side runs on operators/topk.py (partial
    top-k, corpus streams once); the LSH side is the bucket equi-join
    of ann_lsh_topk; the comparison joins two queries x k row sets —
    negligible. This is 'measure the index on the corpus it serves',
    not a second index build."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    u = _unit_table(spark, sf_dir, cache=False)
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
    )
    btop = brute_topk(u, q, k=_TOPK, cache_key=f"annq|{sf_dir}").select(
        "query_id", "neighbor_id"
    )
    ltop = ann_lsh_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        btop.alias("b")
        .join(
            ltop.alias("l"),
            (F.col("l.query_id") == F.col("b.query_id"))
            & (F.col("l.neighbor_id") == F.col("b.neighbor_id")),
            "left",
        )
        .groupBy(F.col("b.query_id").alias("query_id"))
        .agg(F.count(F.col("l.neighbor_id")).alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.lit(_TOPK).alias("k"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.col("n_hits") * 1.0 / _TOPK, 4).alias("recall"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# Wide-bucket LSH ANN — the centi-scale tier of the LSH family. The
# 4-bit demo layout (ann_lsh_topk) is candidate-QUADRATIC: expected
# candidates per table are n*q/2^bits, so at 2M vectors / 20k queries
# it degenerates exactly the way 32-bit simhash banding did at sf10
# (ROADMAP r4) — and the answer is the same one Manku-style width
# analysis gives: wider bucket keys, recall recovered by an
# OR-construction over independent tables, not by narrower keys.
# ---------------------------------------------------------------------------

_WIDE_TABLES = 4
_WIDE_BITS = 12  # 4096 buckets per table
_WIDE_PLANES = [
    _hyperplanes(tag=f"w{t}|", n=_WIDE_BITS) for t in range(_WIDE_TABLES)
]

_WIDE_BUCKET_COLS_SQL = ", ".join(
    f"{_bucket_sql('embedding', _WIDE_PLANES[t])} AS b{t}"
    for t in range(_WIDE_TABLES)
)
_WIDE_KEYS_SQL = " UNION ALL ".join(
    f"SELECT vec_id, {t} AS t, b{t} AS bucket FROM wbk"
    for t in range(_WIDE_TABLES)
)


@register(
    "ann_lsh_wide_topk",
    bench=True,  # the scale-path LSH ANN tier belongs in the headline set
    oracle=f"""
WITH {UNIT_CTE_SQL},
wbk AS MATERIALIZED (SELECT vec_id, ue, {_WIDE_BUCKET_COLS_SQL} FROM unit),
k AS MATERIALIZED ({_WIDE_KEYS_SQL}),
q AS (SELECT vec_id AS query_id, t, bucket FROM k WHERE vec_id % 100 = 0),
cand AS (
  SELECT q.query_id, c.vec_id AS neighbor_id
  FROM q JOIN k c
    ON c.t = q.t AND c.bucket = q.bucket AND c.vec_id <> q.query_id
  GROUP BY q.query_id, c.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round({dot_sql('qe.ue', 'ne.ue', _DIM)}, 4) AS cos
  FROM cand c
  JOIN wbk qe ON qe.vec_id = c.query_id
  JOIN wbk ne ON ne.vec_id = c.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
)
def ann_lsh_wide_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-{_TOPK} from {_WIDE_TABLES} independent
    {_WIDE_BITS}-bit hyperplane tables ({1 << _WIDE_BITS} buckets
    each, OR-construction): the registered CENTI-SCALE tier of the
    LSH ANN family. Expected candidates per table are n*q/2^bits —
    widening from {_N_PLANES} to {_WIDE_BITS} bits cuts candidate
    volume by 2^{_WIDE_BITS - _N_PLANES} while the {_WIDE_TABLES}-table
    OR keeps recall for close neighbors (collision prob per table is
    (1 - theta/pi)^{_WIDE_BITS}; the union recovers what one wide
    table loses). Same width law that took wide simhash from 186 s to
    20 s at sf10; at gate scale factors the wide buckets are mostly
    singleton, so the result honestly reports only genuinely-close
    collisions — the small-data degeneracy is the documented price of
    a layout sized for 10^6+ vectors (dedup_simhash_wide precedent).

    Scale shape: candidate generation is {_WIDE_TABLES} bucket
    equi-joins (one posexplode'd join), first-matching-table dedup via
    the carried bucket arrays (zero distinct shuffles), exact cosine
    only on surviving candidates, per-query windowed top-k. Bucket
    sign-bits come from md5-derived literal hyperplanes, so the DuckDB
    oracle replays the SAME index and the driver hash-checks it."""
    e = load_table(spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024)
    n = e.select(
        "vec_id",
        "embedding",
        norm_column("embedding").alias("nrm"),
        _plane_dots_all(
            "embedding", [p for tbl in _WIDE_PLANES for p in tbl]
        ).alias("pd"),
    )
    bucket_t = [
        reduce(
            lambda acc, p: acc
            + F.when(
                F.element_at("pd", t * _WIDE_BITS + p + 1) >= 0, F.lit(1 << p)
            ).otherwise(0),
            range(1, _WIDE_BITS),
            F.when(F.element_at("pd", t * _WIDE_BITS + 1) >= 0, F.lit(1)).otherwise(0),
        )
        for t in range(_WIDE_TABLES)
    ]
    base = n.select(
        "vec_id",
        unit_from("embedding", "nrm").alias("ue"),
        F.array(*bucket_t).alias("bks"),
    ).cache()
    base.count()  # eager: query and corpus sides both probe this index
    k = base.select("vec_id", "ue", "bks", F.posexplode("bks").alias("t", "bucket"))
    q = k.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("ue").alias("qe"),
        F.col("bks").alias("qbks"),
        "t",
        "bucket",
    )
    first_match = F.array_position(
        F.zip_with("qbks", "bks", lambda x, y: x == y), F.lit(True)
    )
    scored = (
        q.join(k, ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .filter(first_match - 1 == F.col("t"))  # dedup across tables
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot("qe", "ue"), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


def _pca_oracle() -> str:
    from http_log_anonymizer_spark.operators.pca import pca_power_sql

    return "WITH " + pca_power_sql()


@register("embedding_pca_power", oracle=_pca_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal component of the embedding table by
    integer-quantized POWER ITERATION (operators/pca.py) — the
    whitening / collapse-diagnostic step ahead of semantic dedup and
    quantizer training (SemDeDup whitens; PCA rotation concentrates
    variance for PQ). Returns 64 rows (pos, loading, eig_q): the unit-
    scaled eigenvector and the integer Rayleigh quotient.

    Determinism contract (module docstring has the full ladder): the
    corpus-sized work — exact integer first/second moments of the
    quantized vectors — is one explode + map-side-combined groupBy;
    the 64 x 64 moment matrix (constant size) then runs the fixed
    operators/pca.py:ROUNDS (= 20) power-iteration rounds — one CTE
    each in the SQL replay — in pure integer arithmetic with
    truncate-toward-zero division, so the driver hash-checks the
    TRAINED component itself, like kmeans/BPE/PageRank before it.
    Driver state is d^2 + d + 1 integers — scale-independent."""
    from http_log_anonymizer_spark.operators.pca import (
        SCALE,
        gram_tables,
        power_iterate,
    )

    e = load_table(
        spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024
    ).select("embedding")
    n, S, G = gram_tables(e)
    y, eig_q = power_iterate(n, S, G)
    return spark.createDataFrame(
        [(i + 1, round(y[i] / SCALE, 6), eig_q) for i in range(len(y))],
        "pos int, loading double, eig_q long",
    ).orderBy("pos")


@register(
    "ann_ivf_sqrt_recall_report",
    # the ground-truth side is brute-force BY DESIGN (audit artifact)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk", advice="Recall/ground-truth audits at scale run on a SAMPLED stratum (the brute side is the cost, and recall estimates need only a sample)."
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL},
{_sqrt_km_ctes()},
{_sqrt_search_ctes()},
stop AS (
  SELECT query_id, neighbor_id FROM kranked WHERE rank <= {_TOPK}
),
bscored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id
),
btop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM bscored
  ) WHERE rank <= {_TOPK}
),
hits AS (
  SELECT b.query_id, count(s.neighbor_id) AS n_hits
  FROM btop b LEFT JOIN stop s
    ON s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
)
SELECT query_id,
       {_TOPK} AS k,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits * 1.0 / {_TOPK}, 4) AS recall
FROM hits
ORDER BY query_id
""",
)
def ann_ivf_sqrt_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@{_TOPK} of the sqrt-scaled IVF tier against
    exact brute force, as a REGISTERED artifact (the
    ann_lsh_recall_report pattern applied to the flagship ANN tier):
    training, probe, search AND the accuracy claim are all replayed by
    the oracle, so the recall numbers SCALE.md reports for this tier
    are the kind of number the driver hash-checks, not a local-test
    aside. Both rankings are deterministic (rounded-cos + id
    tie-breaks), so the overlap is too.

    Scale shape: the brute side runs on operators/topk.py (partial
    top-k, corpus streams once, shared query-cache with the other
    recall report); the IVF side is ann_ivf_sqrt_topk's own kernels;
    the comparison joins two queries x k row sets — negligible."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    u = _unit_table(spark, sf_dir, cache=False)
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
    )
    btop = brute_topk(u, q, k=_TOPK, cache_key=f"annq|{sf_dir}").select(
        "query_id", "neighbor_id"
    )
    stop = ann_ivf_sqrt_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        btop.alias("b")
        .join(
            stop.alias("s"),
            (F.col("s.query_id") == F.col("b.query_id"))
            & (F.col("s.neighbor_id") == F.col("b.neighbor_id")),
            "left",
        )
        .groupBy(F.col("b.query_id").alias("query_id"))
        .agg(F.count(F.col("s.neighbor_id")).alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.lit(_TOPK).alias("k"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.col("n_hits") * 1.0 / _TOPK, 4).alias("recall"),
    ).orderBy("query_id")


def _sqrt_pq_ctes(src: str = "embeddings", pre: str = "") -> str:
    """unit .. pranked: the full IndexIVFPQ replay (coarse training,
    residuals, 8 codebook trainings, encode, decode, sqrt probe, ADC
    rank) — shared by the topk oracle and the registered recall
    report. ``src``/``pre`` point the whole replay at a derived corpus
    (the OPQ tier prepends its ``rotemb`` rotation CTE and swaps the
    source)."""
    from http_log_anonymizer_spark.operators.kmeans import kmeans_lloyd_sql

    sub_trains = []
    for m in range(_PQ_M):
        a = m * _PQ_DSUB + 1
        b = (m + 1) * _PQ_DSUB
        sub_trains.append(
            f"pqsrc{m} AS MATERIALIZED (SELECT vec_id, r[{a}:{b}] AS sub FROM resid)"
        )
        sub_trains.append(
            kmeans_lloyd_sql(
                k=_PQ_K8,
                rounds=_PQ_ROUNDS,
                dim=_PQ_DSUB,
                prefix=f"pq{m}_",
                src=f"pqsrc{m}",
                vec="sub",
                # FAISS posture, same as the coarse quantizer: codebooks
                # train on the deterministic sample (smod = 1 at the
                # gates, so gate hashes are unaffected), the final
                # assignment covers every row. The unprefixed kqv the
                # subquery counts is the coarse quantizer's — same
                # corpus, same smod as the Spark side.
                train_where=f"vec_id % {_SQRT_SMOD_SQL} = 0",
            )
        )
    code_joins = "\n  ".join(
        f"JOIN pq{m}_kassign{_PQ_ROUNDS} p{m} ON p{m}.vec_id = a.vec_id"
        for m in range(_PQ_M)
    )
    code_cols = ", ".join(f"p{m}.cluster AS c{m}" for m in range(_PQ_M))
    lut_joins = "\n  ".join(
        f"JOIN pq{m}_kcent{_PQ_ROUNDS} t{m} ON t{m}.cluster = s.c{m}"
        for m in range(_PQ_M)
    )
    cat = " || ".join(f"t{m}.c" for m in range(_PQ_M))
    return f"""{pre}{unit_cte_sql(src)},
{_sqrt_km_ctes(src)},
resid AS MATERIALIZED (
  SELECT e.vec_id, a.cluster,
         list_transform(generate_series(1, {_DIM}),
           i -> CAST(e.embedding[i] AS DOUBLE) - c.c[i]) AS r
  FROM {src} e
  JOIN kassign{_SQRT_ROUNDS} a ON a.vec_id = e.vec_id
  JOIN kcent{_SQRT_ROUNDS} c ON c.cluster = a.cluster
),
{",".join(sub_trains)},
codes AS MATERIALIZED (
  SELECT a.vec_id, a.cluster, {code_cols}
  FROM kassign{_SQRT_ROUNDS} a
  {code_joins}
),
recon AS MATERIALIZED (
  SELECT s.vec_id, s.cluster,
         list_transform(generate_series(1, {_DIM}),
           i -> kc.c[i] + ({cat})[i]) AS rec
  FROM codes s
  JOIN kcent{_SQRT_ROUNDS} kc ON kc.cluster = s.cluster
  {lut_joins}
),
{_sqrt_search_ctes()},
pscored AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         round({dot_sql('q.qemb', 'r.rec', _DIM)}, 4) AS adc
  FROM kprobed p
  JOIN q ON q.query_id = p.query_id
  JOIN recon r ON r.cluster = p.label AND r.vec_id <> q.query_id
),
pranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc DESC, neighbor_id
  ) AS rank FROM pscored
)"""


def _sqrt_pq_oracle(src: str = "embeddings", pre: str = "") -> str:
    return f"""
WITH {_sqrt_pq_ctes(src, pre)}
SELECT query_id, neighbor_id, adc, rank FROM pranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
"""


@register("ann_ivf_sqrt_pq_topk", oracle=_sqrt_pq_oracle())
def ann_ivf_sqrt_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS IndexIVFPQ at its PRODUCTION sizing: sqrt-scaled coarse
    cells (k = round(sqrt(n)), sampled training — exactly
    ann_ivf_sqrt_topk's quantizer) + {_PQ_M} x {_PQ_K8}-entry residual
    codebooks ({_PQ_M} bytes/vector) + sqrt-scaled probe width. This
    closes the scale boundary the fixed-8-cell PQ tiers hit (their
    candidate set is nprobe*n/8 per query — killed as structurally
    quadratic at sf100, SCALE.md): here candidates are
    nprobe * n/k = sqrt(k) * sqrt(n) = n^(3/4) per query, and the scan
    payload is codes, not floats.

    ADC via RECONSTRUCTION: adc(q, x) = dot(q, c_cell) + sum_m
    dot(q_m, codebook_m[code_m]) = dot(q, c_cell + concat(codebooks)),
    so each indexed vector decodes ONCE (n rows through {_PQ_M}
    broadcast codebook joins — not per candidate) and the search runs
    the SAME cogrouped per-cell kernel as the flat sqrt tier
    (operators/ivf.py: fold-order-exact, local top-(k+margin), the
    global window sees q*nprobe*(k+margin) rows). Identical math to
    FAISS's LUT formulation, arranged for a columnar engine: the
    decode join is one map-side pass, and a production index stores
    the reconstruction bucketed by cell so the scan shuffle is free.

    The oracle replays coarse training (dynamic-k, sampled), residual
    computation, all {_PQ_M} codebook trainings, encoding, decoding,
    the sqrt-probe and the ADC rank — end to end."""
    return _sqrt_pq_scan(spark, sf_dir, _TOPK).withColumnRenamed("cos", "adc")


def _sqrt_pq_scan(
    spark: SparkSession, sf_dir: str, topk: int, rotate: bool = False
) -> DataFrame:
    """Shared IndexIVFPQ build + ADC scan (the body of
    ann_ivf_sqrt_pq_topk): sqrt coarse cells with sampled training,
    {_PQ_M} x {_PQ_K8} residual codebooks, decode-once reconstruction,
    sqrt probe, cogrouped ADC top-``topk``. Returns (query_id,
    neighbor_id, cos, rank). ``ann_ivf_sqrt_pq_rerank_topk`` calls it
    with a wider ``topk`` as the compressed-domain shortlist for its
    exact-float second stage. ``rotate=True`` runs the IDENTICAL
    pipeline in the OPQ-rotated space (corpus and queries through
    :func:`_opq_rotate` first — the ann_ivf_sqrt_opq_pq_topk tier)."""
    import math

    from http_log_anonymizer_spark.operators.ivf import ivf_probe_cells, ivf_scan_topk
    from http_log_anonymizer_spark.operators.kmeans import (
        kmeans_quantized_multi,
        kmeans_quantized_table,
    )

    e = load_table(
        spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024
    ).select("vec_id", "embedding")
    if rotate:
        # materialize the rotation ONCE: the Hadamard fold is a ~4096-
        # int-op interpreted HOF per vector, and the trainings below
        # re-trigger their input many times — lazily recomputing the
        # rotated corpus per action measured 89-140 s at 20k vectors vs
        # ~20 s for the unrotated tier (r09 ladder). One localCheckpoint
        # makes every downstream pass read the rotated vectors, exactly
        # how a production index stores the pretransformed corpus.
        e = _opq_rotate(e).localCheckpoint()
    n = e.count()
    k = int(round(math.sqrt(n)))
    smod = max(1, n // (50 * k))
    assignments, centroids = kmeans_quantized_table(
        e,
        k=k,
        rounds=_SQRT_ROUNDS,
        qscale=1000,
        train_filter=(F.col("vec_id") % smod == 0),
    )
    cv = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "label int, cvec array<double>",
    )
    resid = (
        e.join(assignments.select("vec_id", F.col("cluster").alias("label")), "vec_id")
        .join(F.broadcast(cv), "label")
        .select(
            "vec_id",
            "label",
            F.zip_with(
                F.col("embedding").cast("array<double>"), "cvec", lambda x, c: x - c
            ).alias("r"),
        )
        .localCheckpoint()
    )

    # Fused subspace training (r10, guide §2.4/§5) — see _pq_impl: one
    # job per round for all 8 codebooks, code table emitted with zero
    # vec_id joins, same numbers (seeds/integer sums/argmin unchanged).
    codes, cents = kmeans_quantized_multi(
        resid,
        n_sub=_PQ_M,
        dsub=_PQ_DSUB,
        k=_PQ_K8,
        rounds=_PQ_ROUNDS,
        train_filter=(F.col("vec_id") % smod == 0),
        extra=("label",),
        vec_col="r",
    )
    luts = [
        spark.createDataFrame(
            [(int(j), [float(x) for x in c]) for j, c in enumerate(cents[m])],
            f"c{m} int, t{m} array<double>",
        )
        for m in range(_PQ_M)
    ]

    # decode ONCE: n rows through the broadcast codebook joins
    rec = codes.join(F.broadcast(cv), "label")
    for m in range(_PQ_M):
        rec = rec.join(F.broadcast(luts[m]), f"c{m}")
    u = rec.select(
        "vec_id",
        "label",
        F.zip_with(
            "cvec",
            F.concat(*[F.col(f"t{m}") for m in range(_PQ_M)]),
            lambda c, t: c + t,
        ).alias("ue"),
    )

    qsrc = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 100 == 0)
        .select("vec_id", "embedding")
    )
    if rotate:
        qsrc = _opq_rotate(qsrc)
    q = qsrc.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qemb"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    probed = ivf_probe_cells(q, centroids, _sqrt_nprobe(k))
    return ivf_scan_topk(u, probed, topk)


@register(
    "ann_ivf_sqrt_pq_recall_report",
    # the ground-truth side is brute-force BY DESIGN (audit artifact)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_pq_topk", advice="Recall/ground-truth audits at scale run on a SAMPLED stratum (the brute side is the cost, and recall estimates need only a sample)."
    ),
    oracle=f"""
WITH {_sqrt_pq_ctes()},
stop AS (
  SELECT query_id, neighbor_id FROM pranked WHERE rank <= {_TOPK}
),
bscored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id
),
btop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM bscored
  ) WHERE rank <= {_TOPK}
),
hits AS (
  SELECT b.query_id, count(s.neighbor_id) AS n_hits
  FROM btop b LEFT JOIN stop s
    ON s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
)
SELECT query_id,
       {_TOPK} AS k,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits * 1.0 / {_TOPK}, 4) AS recall
FROM hits
ORDER BY query_id
""",
)
def ann_ivf_sqrt_pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@{_TOPK} of the IndexIVFPQ composition
    (ann_ivf_sqrt_pq_topk) against exact unit-cosine brute force, as a
    REGISTERED artifact — the same pattern as
    ann_ivf_sqrt_recall_report, so the compressed tier's accuracy
    ladder (SCALE.md: 0.170 / 0.155 / 0.238 at n=20k / 200k / 2M) is
    the kind of number the driver hash-checks. The oracle replays the
    ENTIRE index build (coarse training, residuals, 8 codebook
    trainings, encode, decode, probe, ADC rank) AND the brute ground
    truth AND the overlap count in one statement.

    Scale shape: brute side on operators/topk.py partial top-k
    (corpus streams once, shared query cache); PQ side is the tier's
    own kernels; the comparison joins two queries x k row sets."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    u = _unit_table(spark, sf_dir, cache=False)
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
    )
    btop = brute_topk(u, q, k=_TOPK, cache_key=f"annq|{sf_dir}").select(
        "query_id", "neighbor_id"
    )
    stop = ann_ivf_sqrt_pq_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        btop.alias("b")
        .join(
            stop.alias("s"),
            (F.col("s.query_id") == F.col("b.query_id"))
            & (F.col("s.neighbor_id") == F.col("b.neighbor_id")),
            "left",
        )
        .groupBy(F.col("b.query_id").alias("query_id"))
        .agg(F.count(F.col("s.neighbor_id")).alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.lit(_TOPK).alias("k"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.col("n_hits") * 1.0 / _TOPK, 4).alias("recall"),
    ).orderBy("query_id")


# Two-stage PQ search (VERDICT r06 item 4): ADC over codes is the fast
# first pass, but 8 bytes/vector floors recall (~0.19@5 at n=200k);
# the standard production fix (FAISS IndexRefineFlat) reranks the PQ
# shortlist with exact floats. Shortlist width (FAISS k_factor) chosen
# by measured sweeps at BOTH gate-relevant scales (SCALE.md tables):
# n=20k (sf1) recall@5 0.327/0.379/0.424/0.437 at R=4k/8k/16k/24k;
# n=200k (sf10) 0.384/0.412/0.425/0.438/0.444 at R=16k/24k/32k/48k/
# 64k. R=32k is the smallest width holding >= 0.4 at n=200k WITH
# margin; the rerank stage stays queries x R rows and the ADC window
# q*nprobe*(R+margin) — both trivially bounded.
_PQ_RERANK_R = 32 * _TOPK


def _sqrt_pq_rerank_ctes() -> str:
    """rshort .. rranked: the exact-float second stage over the PQ
    shortlist — shared by the rerank topk oracle and its recall
    report."""
    return f"""rshort AS (
  SELECT query_id, neighbor_id FROM pranked WHERE rank <= {_PQ_RERANK_R}
),
rscored AS (
  SELECT s.query_id, s.neighbor_id,
         round({dot_sql('qu.ue', 'u.ue', _DIM)}, 4) AS cos
  FROM rshort s
  JOIN unit qu ON qu.vec_id = s.query_id
  JOIN unit u ON u.vec_id = s.neighbor_id
),
rranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
  ) AS rank FROM rscored
)"""


@register(
    "ann_ivf_sqrt_pq_rerank_topk",
    oracle=f"""
WITH {_sqrt_pq_ctes()},
{_sqrt_pq_rerank_ctes()}
SELECT query_id, neighbor_id, cos, rank FROM rranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
)
def ann_ivf_sqrt_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IndexIVFPQ search (FAISS IndexIVFPQ + RefineFlat,
    VERDICT r06 item 4): stage 1 is the compressed-domain ADC scan of
    ann_ivf_sqrt_pq_topk widened to a {_PQ_RERANK_R}-candidate
    shortlist; stage 2 fetches the shortlist's RAW vectors by id and
    reranks by exact unit cosine, fixing the 8-byte quantization
    error inside the shortlist (recall then approaches the flat sqrt
    tier's, while the corpus-wide scan still reads codes, not floats).

    Scale shape: the shortlist is queries x {_PQ_RERANK_R} rows —
    provably bounded, so the raw-vector fetch is ONE corpus scan with
    a broadcast hash semi-join on vec_id (query and neighbor ids
    fetched together; a production index stores vectors bucketed by
    vec_id so this fetch is partition-pruned). The rerank itself joins
    two shortlist-sized tables — no new shuffle shape, exactly the
    FAISS refine step re-expressed relationally."""
    sl = (
        _sqrt_pq_scan(spark, sf_dir, _PQ_RERANK_R)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    ids = (
        sl.select(F.col("neighbor_id").alias("vec_id"))
        .union(sl.select(F.col("query_id").alias("vec_id")))
        .distinct()
    )
    uu = _unit_table(spark, sf_dir, cache=False)
    # one scan of the corpus, broadcast semi-join fetch of raw vectors
    fetched = uu.join(F.broadcast(ids), "vec_id").localCheckpoint()
    scored = (
        sl.join(
            fetched.select(
                F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
            ),
            "query_id",
        )
        .join(
            fetched.select(
                F.col("vec_id").alias("neighbor_id"), F.col("ue").alias("ne")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot("qe", "ne"), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


@register(
    "ann_ivf_sqrt_pq_rerank_recall_report",
    # the ground-truth side is brute-force BY DESIGN (audit artifact)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_pq_rerank_topk", advice="Recall/ground-truth audits at scale run on a SAMPLED stratum (the brute side is the cost, and recall estimates need only a sample)."
    ),
    oracle=f"""
WITH {_sqrt_pq_ctes()},
{_sqrt_pq_rerank_ctes()},
stop AS (
  SELECT query_id, neighbor_id FROM rranked WHERE rank <= {_TOPK}
),
bscored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id
),
btop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM bscored
  ) WHERE rank <= {_TOPK}
),
hits AS (
  SELECT b.query_id, count(s.neighbor_id) AS n_hits
  FROM btop b LEFT JOIN stop s
    ON s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
)
SELECT query_id,
       {_TOPK} AS k,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits * 1.0 / {_TOPK}, 4) AS recall
FROM hits
ORDER BY query_id
""",
)
def ann_ivf_sqrt_pq_rerank_recall_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query recall@{_TOPK} of the two-stage (PQ shortlist +
    exact-float rerank) search against exact brute force — the number
    that shows the refine step actually buys recall back from the
    8-byte ADC floor (same registered-artifact pattern as
    ann_ivf_sqrt_pq_recall_report, so the driver hash-checks it)."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    u = _unit_table(spark, sf_dir, cache=False)
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
    )
    btop = brute_topk(u, q, k=_TOPK, cache_key=f"annq|{sf_dir}").select(
        "query_id", "neighbor_id"
    )
    stop = ann_ivf_sqrt_pq_rerank_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        btop.alias("b")
        .join(
            stop.alias("s"),
            (F.col("s.query_id") == F.col("b.query_id"))
            & (F.col("s.neighbor_id") == F.col("b.neighbor_id")),
            "left",
        )
        .groupBy(F.col("b.query_id").alias("query_id"))
        .agg(F.count(F.col("s.neighbor_id")).alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.lit(_TOPK).alias("k"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.col("n_hits") * 1.0 / _TOPK, 4).alias("recall"),
    ).orderBy("query_id")


@register(
    "ann_ivf_sqrt_opq_pq_topk",
    oracle=_sqrt_pq_oracle(src="rotemb", pre=_opq_rot_cte()),
)
def ann_ivf_sqrt_opq_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-ROTATED IndexIVFPQ at production sizing — the missing
    rotated tier of the r08 anisotropy ladder (SCALE.md): corpus AND
    queries go through the integer-exact HD rotation y = H(s ⊙ x)/8
    (Ge et al., "Optimized Product Quantization", CVPR 2013 §4's
    random-rotation init; FAISS ships it as the OPQ pretransform in
    front of IVFPQ), then the EXACT ann_ivf_sqrt_pq_topk pipeline —
    sqrt coarse cells with sampled training, {_PQ_M} x {_PQ_K8}
    residual codebooks, decode-once ADC, sqrt probe — runs unchanged
    in the rotated space.

    Why this tier exists: on decaying (anisotropic) spectra the
    contiguous-slice PQ subspaces capture wildly unequal variance and
    plain sqrt-PQ recall collapses (measured 0.145 on the aniso
    corpus, SCALE.md r08); the orthonormal rotation spreads variance
    evenly across the 8 subspaces, attacking the SAME failure mode the
    exact-float rerank stage papers over — but at encode time, for
    free at query time, instead of with a per-query
    {_PQ_RERANK_R}-candidate fetch.

    Cross-engine exactness: identical to ann_ivf_opq_topk's argument —
    inputs quantize to integers first (floor(x * 2^17) is exact on
    float32), the Hadamard fold is order-free int64 arithmetic, the
    final /2^20 is exact, so rotated vectors are BIT-IDENTICAL in both
    engines and the whole downstream train/encode/probe/ADC chain
    stays hash-checkable.

    Scale shape: exactly ann_ivf_sqrt_pq_topk's (n^(3/4) candidate
    work per query, codes-not-floats scan payload) plus one fused
    64-integer-dot projection per vector — no new shuffle, no Python,
    no materialized d x d matrix."""
    return _sqrt_pq_scan(spark, sf_dir, _TOPK, rotate=True).withColumnRenamed(
        "cos", "adc"
    )


@register(
    "ann_ivf_sqrt_opq_pq_recall_report",
    # the ground-truth side is brute-force BY DESIGN (audit artifact)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_opq_pq_topk", advice="Recall/ground-truth audits at scale run on a SAMPLED stratum (the brute side is the cost, and recall estimates need only a sample)."
    ),
    oracle=f"""
WITH {_sqrt_pq_ctes(src="rotemb", pre=_opq_rot_cte())},
stop AS (
  SELECT query_id, neighbor_id FROM pranked WHERE rank <= {_TOPK}
),
bscored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id
),
btop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM bscored
  ) WHERE rank <= {_TOPK}
),
hits AS (
  SELECT b.query_id, count(s.neighbor_id) AS n_hits
  FROM btop b LEFT JOIN stop s
    ON s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
)
SELECT query_id,
       {_TOPK} AS k,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits * 1.0 / {_TOPK}, 4) AS recall
FROM hits
ORDER BY query_id
""",
)
def ann_ivf_sqrt_opq_pq_recall_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query recall@{_TOPK} of the rotated IndexIVFPQ tier against
    exact brute force IN THE ROTATED SPACE (rotation is an isometry,
    so true neighbor sets are preserved and rotated ground truth IS
    ground truth) — the registered artifact behind the SCALE.md
    rotation-vs-rerank table, same wrapper as
    ann_ivf_sqrt_pq_recall_report (one shared recall-join code path).
    The oracle replays rotation, the entire index build, the rotated
    brute side and the overlap count in one statement."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    u = _unit_table(spark, sf_dir, cache=False, rotate=True)
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
    )
    btop = brute_topk(u, q, k=_TOPK, cache_key=f"annqrot|{sf_dir}").select(
        "query_id", "neighbor_id"
    )
    stop = ann_ivf_sqrt_opq_pq_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        btop.alias("b")
        .join(
            stop.alias("s"),
            (F.col("s.query_id") == F.col("b.query_id"))
            & (F.col("s.neighbor_id") == F.col("b.neighbor_id")),
            "left",
        )
        .groupBy(F.col("b.query_id").alias("query_id"))
        .agg(F.count(F.col("s.neighbor_id")).alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.lit(_TOPK).alias("k"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.col("n_hits") * 1.0 / _TOPK, 4).alias("recall"),
    ).orderBy("query_id")


# Matryoshka / dimension-truncation recall ladder (Kusupati et al.,
# NeurIPS 2022): how much exact-search recall survives when only the
# FIRST d' dims of the embedding are used. The cheap-prefilter question
# every 100 TB ANN deployment asks: scan 4x less vector payload, rerank
# the survivors at full width.
_MRL_DIMS = (16, 32)


def _mrl_trunc_ctes(dp: int, src: str = "embeddings") -> str:
    return f"""t{dp} AS (
  SELECT vec_id, embedding[1:{dp}] AS te FROM {src} WHERE embedding IS NOT NULL
),
_tn{dp} AS (
  SELECT vec_id, te,
         sqrt(list_sum(list_transform(te,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM t{dp}
),
tu{dp} AS (
  SELECT vec_id,
         list_transform(te, x -> CAST(x AS DOUBLE) / nrm) AS ue
  FROM _tn{dp}
),
tq{dp} AS (
  SELECT vec_id AS query_id, ue AS qe FROM tu{dp} WHERE vec_id % 100 = 0
),
tscored{dp} AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', dp)}, 4) AS cos
  FROM tq{dp} q JOIN tu{dp} c ON c.vec_id <> q.query_id
),
ttop{dp} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM tscored{dp}
  ) WHERE rank <= {_TOPK}
),
hits{dp} AS (
  SELECT b.query_id, count(s.neighbor_id) AS n_hits
  FROM btop b LEFT JOIN ttop{dp} s
    ON s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
)"""


@register(
    "ann_matryoshka_recall_report",
    # the ground-truth side is brute-force BY DESIGN (audit artifact)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk", advice="Recall/ground-truth audits at scale run on a SAMPLED stratum (the brute side is the cost, and recall estimates need only a sample)."
    ),
    oracle=f"""
WITH {UNIT_CTE_SQL},
q AS (
  SELECT vec_id AS query_id, ue AS qe FROM unit WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id
),
btop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM bscored
  ) WHERE rank <= {_TOPK}
),
{",".join(_mrl_trunc_ctes(dp) for dp in _MRL_DIMS)}
{" UNION ALL ".join(
    f'''SELECT {dp} AS trunc_dim, query_id, {_TOPK} AS k,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits * 1.0 / {_TOPK}, 4) AS recall
FROM hits{dp}''' for dp in _MRL_DIMS)}
ORDER BY trunc_dim, query_id
""",
)
def ann_matryoshka_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style DIMENSION-TRUNCATION recall ladder (Kusupati et
    al., NeurIPS 2022 — MRL; also the two-stage "PCA-prefix prefilter"
    folklore): per-query recall@{_TOPK} of EXACT cosine search over
    only the first d' in {_MRL_DIMS} dims against the full-{_DIM}-dim
    exact ground truth. This is the measurement behind the cheapest
    100 TB ANN accelerator there is — scan a d'/{_DIM} prefix of the
    vector payload (4x/2x less IO and FLOPs), then rerank survivors at
    full width; the report quantifies exactly what that prefilter
    costs in recall on THIS corpus, and the driver hash-checks it.

    Both rankings are deterministic (rounded-cos + id tie-breaks);
    truncated vectors are re-normalized over their own d' dims in both
    engines (slice -> norm -> unit, the two-projection pattern).

    Scale shape: three brute passes (full, 32-d, 16-d) on
    operators/topk.py — partial top-k per partition, corpus streams
    once per pass and the truncated passes stream d'/{_DIM} of the
    bytes; the overlap joins are queries x k rows. Exact baselines
    are quadratic BY DESIGN (this is a ground-truth artifact, like
    ann_brute_topk)."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    u = _unit_table(spark, sf_dir, cache=False)
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
    )
    btop = brute_topk(u, q, k=_TOPK, cache_key=f"annq|{sf_dir}").select(
        "query_id", "neighbor_id"
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    reports = []
    for dp in _MRL_DIMS:
        t = e.select("vec_id", F.slice("embedding", 1, dp).alias("te"))
        tn = t.select("vec_id", "te", norm_column("te").alias("nrm"))
        tu = tn.select("vec_id", unit_from("te", "nrm").alias("ue"))
        tq = tu.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
        )
        ttop = brute_topk(
            tu, tq, k=_TOPK, cache_key=f"annq{dp}|{sf_dir}"
        ).select("query_id", "neighbor_id")
        hits = (
            btop.alias("b")
            .join(
                ttop.alias("s"),
                (F.col("s.query_id") == F.col("b.query_id"))
                & (F.col("s.neighbor_id") == F.col("b.neighbor_id")),
                "left",
            )
            .groupBy(F.col("b.query_id").alias("query_id"))
            .agg(F.count(F.col("s.neighbor_id")).alias("n_hits"))
        )
        reports.append(
            hits.select(
                F.lit(dp).alias("trunc_dim"),
                "query_id",
                F.lit(_TOPK).alias("k"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.round(F.col("n_hits") * 1.0 / _TOPK, 4).alias("recall"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("trunc_dim", "query_id")


# ---------------------------------------------------------------------------
# Bitext margin mining (Artetxe & Schwenk, ACL 2019) — cross-lingual
# parallel-pair mining, the data-sourcing step of every multilingual
# translation/embedding corpus (CCMatrix, NLLB). A raw cosine threshold
# over-selects from dense "hub" regions; the margin criterion divides
# each candidate cosine by the average of BOTH endpoints' k-NN cosines,
# so only pairs that stand out from their local neighborhoods survive.
# ---------------------------------------------------------------------------

_BM_K = 4  # neighborhood size for the margin normalizer
_BM_TOP = 50  # mined pairs reported
_BM_PIVOT = "en"  # target side; every other lang is a source


def _bitext_oracle() -> str:
    ci = f"CAST(round({dot_sql('x.xe', 'y.ye', _DIM)} * 10000) AS BIGINT)"
    return f"""
WITH {UNIT_CTE_SQL},
l AS (SELECT doc_id, lang FROM documents),
x AS (
  SELECT u.vec_id AS xid, u.ue AS xe, l.lang AS x_lang
  FROM unit u JOIN l ON u.vec_id = l.doc_id WHERE l.lang <> '{_BM_PIVOT}'
),
y AS (
  SELECT u.vec_id AS yid, u.ue AS ye
  FROM unit u JOIN l ON u.vec_id = l.doc_id WHERE l.lang = '{_BM_PIVOT}'
),
sx AS (
  SELECT x.xid, y.yid, {ci} AS ci,
         row_number() OVER (
           PARTITION BY x.xid ORDER BY {ci} DESC, y.yid
         ) AS rnk
  FROM x JOIN y ON true
),
knn_x AS (SELECT xid, yid, ci FROM sx WHERE rnk <= {_BM_K}),
sy AS (
  SELECT y.yid, x.xid, {ci} AS ci,
         row_number() OVER (
           PARTITION BY y.yid ORDER BY {ci} DESC, x.xid
         ) AS rnk
  FROM y JOIN x ON true
),
knn_y AS (SELECT yid, xid, ci FROM sy WHERE rnk <= {_BM_K}),
ax AS (SELECT xid, CAST(sum(ci) AS BIGINT) AS sum_x, count(*) AS kx FROM knn_x GROUP BY xid),
ay AS (SELECT yid, CAST(sum(ci) AS BIGINT) AS sum_y, count(*) AS ky FROM knn_y GROUP BY yid),
pairs AS (
  SELECT p.xid, p.yid, p.ci,
         round(CAST(p.ci * 2 * a.kx * b.ky
                    - (a.sum_x * b.ky + b.sum_y * a.kx) AS DOUBLE)
               / (2 * a.kx * b.ky) / 10000.0, 6) AS margin
  FROM knn_x p JOIN ax a ON p.xid = a.xid JOIN ay b ON p.yid = b.yid
),
best AS (
  SELECT xid, yid, ci, margin,
         row_number() OVER (
           PARTITION BY xid ORDER BY margin DESC, yid
         ) AS rn
  FROM pairs
)
SELECT b.xid AS x_id, x.x_lang AS x_lang, b.yid AS y_id,
       b.ci / 10000.0 AS cos, b.margin AS margin
FROM best b JOIN x ON b.xid = x.xid
WHERE b.rn = 1
ORDER BY b.margin DESC, b.xid
LIMIT {_BM_TOP}
"""


@register(
    "bitext_margin_mining",
    # two-sided EXACT kNN: quadratic in the split sizes; at scale the
    # kNN inputs swap for the sqrt-IVF tier (docstring)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk"
    ),
    oracle=_bitext_oracle(),
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BM_TOP} mined cross-lingual pairs by the RATIO-margin
    criterion (Artetxe & Schwenk, ACL 2019 eq. 3): for each non-'{_BM_PIVOT}'
    document x, its best '{_BM_PIVOT}' candidate y scored by the
    DISTANCE margin (their eq. "distance"):

        margin(x, y) = cos(x, y) - 0.5 * (avg_k cos(x, NN_Y(x))
                                          + avg_k cos(y, NN_X(y)))

    with k = {_BM_K}. The paper's RATIO variant divides instead of
    subtracting; on near-orthogonal neighborhoods the denominator
    approaches zero and noise pairs blow up to absurd margins —
    reproduced in tests/test_bitext.py on random vectors, which is why
    production miners pair the ratio with absolute-cosine floors. The
    distance form needs no guard. All margin arithmetic runs on
    1e4-scaled INTEGER
    cosines (sum-order-independent, so partial aggregation can't
    perturb a bit) and the final ratio is one exact-integer division —
    the same determinization as pagerank/kmeans — making the full mine
    hash-replayable.

    Scale shape: both k-NN passes run through operators/topk.py
    (executor-side query shards, fold-order-exact numpy scoring,
    partial top-k per partition — never a corpus-wide rank window).
    This registered tier is the EXACT x*y mine — the ground-truth
    shape, like ann_brute_topk; a 100 TB mine swaps the two k-NN
    inputs for the sqrt-IVF tier's output (any (query, neighbor, cos)
    table drops in — the margin join is k-bounded either way:
    |X|*{_BM_K} candidate rows, two integer aggregates, one broadcast-
    sized join back)."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    u = _unit_table(spark, sf_dir, cache=False)
    ul = u.join(langs, u.vec_id == langs.doc_id).select("vec_id", "lang", "ue")
    xu = ul.filter(F.col("lang") != _BM_PIVOT)
    yu = ul.filter(F.col("lang") == _BM_PIVOT).select("vec_id", "ue")
    xq = xu.select(F.col("vec_id").alias("query_id"), F.col("ue").alias("qe"))
    yq = yu.select(F.col("vec_id").alias("query_id"), F.col("ue").alias("qe"))

    knn_x = brute_topk(
        yu, xq, k=_BM_K, cache_key=f"bitextx|{sf_dir}"
    ).select(
        F.col("query_id").alias("xid"),
        F.col("neighbor_id").alias("yid"),
        F.round(F.col("cos") * 10000).cast("long").alias("ci"),
    )
    knn_y = brute_topk(
        xu.select("vec_id", "ue"), yq, k=_BM_K, cache_key=f"bitexty|{sf_dir}"
    ).select(
        F.col("query_id").alias("yid"),
        F.round(F.col("cos") * 10000).cast("long").alias("ci"),
    )
    ax = knn_x.groupBy("xid").agg(
        F.sum("ci").alias("sum_x"), F.count("*").alias("kx")
    )
    ay = knn_y.groupBy("yid").agg(
        F.sum("ci").alias("sum_y"), F.count("*").alias("ky")
    )
    kxy2 = 2 * F.col("kx") * F.col("ky")
    num = F.col("ci") * kxy2 - (
        F.col("sum_x") * F.col("ky") + F.col("sum_y") * F.col("kx")
    )
    pairs = (
        knn_x.join(ax, "xid")
        .join(ay, "yid")
        .select(
            "xid",
            "yid",
            "ci",
            F.round(num.cast("double") / kxy2 / 10000.0, 6).alias("margin"),
        )
    )
    w = Window.partitionBy("xid").orderBy(F.desc("margin"), "yid")
    best = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(xu.select(F.col("vec_id").alias("xid"), "lang"), "xid")
        .select(
            F.col("xid").alias("x_id"),
            F.col("lang").alias("x_lang"),
            F.col("yid").alias("y_id"),
            (F.col("ci") / 10000.0).alias("cos"),
            "margin",
        )
        .orderBy(F.desc("margin"), "x_id")
        .limit(_BM_TOP)
    )


# ---------------------------------------------------------------------------
# SRHT / FJLT recall ladder (Ailon & Chazelle, STOC 2006): rotate with
# the integer-exact sign-flip + Walsh-Hadamard transform, THEN truncate.
# The rotation spreads every vector's energy evenly across coordinates,
# so a d'-dim prefix of the ROTATED vector is a proper
# Johnson-Lindenstrauss sketch that needs no training — the untrained
# counterpart of the Matryoshka prefix (which relies on the embedding
# having been TRAINED with prefix importance) and of the PCA projection
# (which must be fit). Same ladder dims and ground truth as
# ann_matryoshka_recall_report so the two reports compare row for row.
# ---------------------------------------------------------------------------


@register(
    "ann_srht_recall_report",
    # the ground-truth side is brute-force BY DESIGN (audit artifact)
    scale_gate=ScaleGate(
        table="embeddings", max_rows=250_000, wide_twin="ann_ivf_sqrt_topk", advice="Recall/ground-truth audits at scale run on a SAMPLED stratum (the brute side is the cost, and recall estimates need only a sample)."
    ),
    oracle=f"""
WITH {_opq_rot_cte()} {UNIT_CTE_SQL},
q AS (
  SELECT vec_id AS query_id, ue AS qe FROM unit WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({dot_sql('q.qe', 'c.ue', _DIM)}, 4) AS cos
  FROM q JOIN unit c ON c.vec_id <> q.query_id
),
btop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank FROM bscored
  ) WHERE rank <= {_TOPK}
),
{",".join(_mrl_trunc_ctes(dp, src="rotemb") for dp in _MRL_DIMS)}
{" UNION ALL ".join(
    f'''SELECT {dp} AS trunc_dim, query_id, {_TOPK} AS k,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits * 1.0 / {_TOPK}, 4) AS recall
FROM hits{dp}''' for dp in _MRL_DIMS)}
ORDER BY trunc_dim, query_id
""",
)
def ann_srht_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRHT recall ladder: per-query recall@{_TOPK} of exact cosine
    search over the first d' in {_MRL_DIMS} dims of the ROTATED
    embedding (seeded sign flips + 64-point Walsh-Hadamard — the
    ann_ivf_opq_topk rotation, integer-exact in both engines) against
    the full-{_DIM}-dim exact ground truth.

    Why rotate before truncating: a raw prefix keeps whatever energy
    the first coordinates happen to carry (the Matryoshka report's
    bet — valid only for MRL-trained embeddings); the Hadamard
    rotation equidistributes energy, making the prefix a
    Johnson-Lindenstrauss sketch with distortion guarantees that hold
    for ANY embedding, no training required (Ailon-Chazelle FJLT).
    Comparing this report against ann_matryoshka_recall_report row for
    row measures which regime the corpus is in.

    Scale shape: identical to the Matryoshka report (three brute
    passes via operators/topk.py, queries x k overlap joins) plus one
    map-only rotation projection; the rotation is O(d^2) per vector
    here (64x64 — trivial) and O(d log d) with the butterfly at
    production dims. Ground truth runs on the UNROTATED corpus — the
    rotation is an isometry, so full-dim rankings agree and the
    cheaper scan wins."""
    from http_log_anonymizer_spark.operators.topk import brute_topk

    u = _unit_table(spark, sf_dir, cache=False)
    q = u.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
    )
    btop = brute_topk(u, q, k=_TOPK, cache_key=f"annq|{sf_dir}").select(
        "query_id", "neighbor_id"
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # pinned (r10, guide §2.4): unpinned, every truncation rung re-ran
    # the rotation for BOTH its corpus scan and its query-shard pass
    # (4 re-derivations for the 2-dim ladder); the table is gate-bounded
    # (<= 250k rows), exactly the _sqrt_pq_scan pinning rationale.
    rot = _opq_rotate(e).localCheckpoint()
    reports = []
    for dp in _MRL_DIMS:
        t = rot.select("vec_id", F.slice("embedding", 1, dp).alias("te"))
        tn = t.select("vec_id", "te", norm_column("te").alias("nrm"))
        tu = tn.select("vec_id", unit_from("te", "nrm").alias("ue"))
        tq = tu.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("ue").alias("qe")
        )
        ttop = brute_topk(
            tu, tq, k=_TOPK, cache_key=f"srht{dp}|{sf_dir}"
        ).select("query_id", "neighbor_id")
        hits = (
            btop.alias("b")
            .join(
                ttop.alias("s"),
                (F.col("s.query_id") == F.col("b.query_id"))
                & (F.col("s.neighbor_id") == F.col("b.neighbor_id")),
                "left",
            )
            .groupBy(F.col("b.query_id").alias("query_id"))
            .agg(F.count(F.col("s.neighbor_id")).alias("n_hits"))
        )
        reports.append(
            hits.select(
                F.lit(dp).alias("trunc_dim"),
                "query_id",
                F.lit(_TOPK).alias("k"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.round(F.col("n_hits") * 1.0 / _TOPK, 4).alias("recall"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("trunc_dim", "query_id")


# ---------------------------------------------------------------------------
# Embedding covariance spectrum — the diagnostic that DECIDES between
# the prefix-truncation (Matryoshka) and rotation (OPQ/SRHT) tiers
# ---------------------------------------------------------------------------

_SPEC_GRID = 1_000_000  # 1e-6 component quantization (exact moments)
_SPEC_SUB = 8  # dims per PQ subspace (matches _PQ_M x 8 over _DIM=64)


@register(
    "embedding_spectrum_report",
    oracle=f"""
WITH x AS (
  -- CAST TO DOUBLE BEFORE the grid multiply: Spark computes
  -- float32 * int in FLOAT precision while DuckDB promotes to DOUBLE,
  -- so without the explicit widening the quantized integers themselves
  -- diverge (measured: 53/64 dims off on the anisotropic corpus)
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {_SPEC_GRID}) AS BIGINT) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
st AS (
  SELECT dim,
         count(*) AS n,
         CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
  FROM x GROUP BY dim
),
-- var floored to EXACT picounits (grid^2): (n*s2 - s1^2) // n^2 is an
-- integer both engines compute identically, where casting the >2^53
-- raw moment to DOUBLE is not correctly-rounded the same way in both
-- (measured 1-ulp divergence on the anisotropic corpus)
var AS (
  SELECT dim, CAST(dim // {_SPEC_SUB} AS BIGINT) AS subspace,
         CAST((s2 * n - s1 * s1) // (CAST(n AS HUGEINT) * n) AS BIGINT)
           AS var_pico
  FROM st
),
tot AS (SELECT CAST(sum(var_pico) AS BIGINT) AS tv FROM var),
cum AS (
  SELECT dim, subspace, var_pico,
         CAST(sum(var_pico) OVER (ORDER BY dim
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cv
  FROM var
)
SELECT c.dim, c.subspace,
       round(c.var_pico / ({_SPEC_GRID}.0 * {_SPEC_GRID}), 8) AS var,
       -- zero total energy (constant corpus): share is undefined ->
       -- NULL, gated on the exact integer total
       round(CASE WHEN t.tv > 0 THEN c.cv * 1.0 / t.tv END, 4)
         AS cum_energy_share
FROM cum c CROSS JOIN tot t
ORDER BY c.dim
""",
)
def embedding_spectrum_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance of the embedding corpus with cumulative
    energy share and PQ-subspace id — the covariance-spectrum
    diagnostic a pipeline reads BEFORE choosing an ANN accelerator
    tier: a flat spectrum (isotropic; this synthetic testdata) means
    prefix truncation is useless and rotation buys nothing (the r06
    honest negatives); a decaying spectrum (real CLIP/BERT corpora;
    sources/scale_gen.py:generate_anisotropic_embeddings) means the
    Matryoshka d'-prefix keeps cum_energy_share(d') of the energy and
    unbalanced subspace variances are exactly the OPQ-lift precondition
    (Ge et al. 2013). Measured consequence on the anisotropic series:
    recall@5 at d'=16 goes 0.08 -> 0.82 (SCALE.md r08).

    Determinism: components quantize to a 1e-6 integer grid, per-dim
    moments are exact integer sums (HUGEINT/decimal38 — the Gram/
    Neyman discipline), and the variance itself stays EXACT: var_pico
    = (n*s2 - s1^2) DIV n^2 is integer floor division of exact
    moments (casting the >2^53 raw moment to double first diverges by
    1 ulp between engines — measured on the anisotropic corpus), so
    the only doubles are edge divisions of <=2^53 integers, identical
    everywhere, rounded 8dp/4dp. The cumulative window runs over the
    DIM-bounded variance table ({_DIM} rows — never corpus-sized;
    single-task is the correct plan for a 64-row table).

    Scale shape: one posexplode scan with map-side combine into
    {_DIM} moment rows; everything after is dimension-bounded."""
    x = load_table(
        spark, sf_dir, "embeddings", spread=True, bytes_per_task=256 * 1024
    ).select(F.posexplode("embedding").alias("dim", "val"))
    return spectrum_from_moments(spectrum_moments(x))


def spectrum_moments(x: DataFrame) -> DataFrame:
    """(dim, n, s1, s2): exact integer per-dimension moments of a
    (dim, val) table on the 1e-6 grid — the ADDITIVE state the
    streaming spectrum monitor folds (streaming/spectrum.py) and the
    batch report aggregates in one pass."""
    dec = "decimal(38,0)"
    # double BEFORE the multiply — float32 * int stays float in Spark
    # but promotes to double in DuckDB (see the oracle's comment)
    q = x.select(
        "dim",
        F.round(F.col("val").cast("double") * _SPEC_GRID).cast("long").alias("v"),
    )
    return q.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s1"),
        F.sum((F.col("v").cast(dec) * F.col("v"))).alias("s2"),
    )


def spectrum_from_moments(st: DataFrame) -> DataFrame:
    """(dim, subspace, var, cum_energy_share) from the exact moment
    table — the report edge shared by the batch query and the
    streaming monitor readout, so stream and batch are the same
    integer arithmetic by construction."""
    var = st.select(
        "dim",
        (F.col("dim") / _SPEC_SUB).cast("long").alias("subspace"),
        F.expr(
            "CAST((s2 * n - s1 * s1) DIV (CAST(n AS DECIMAL(38,0)) * n)"
            " AS BIGINT)"
        ).alias("var_pico"),
    )
    tot = var.agg(F.sum("var_pico").cast("long").alias("tv"))
    w = Window.orderBy("dim").rowsBetween(Window.unboundedPreceding, 0)
    return (
        var.select(
            "dim",
            "subspace",
            "var_pico",
            F.sum("var_pico").over(w).cast("long").alias("cv"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "dim",
            "subspace",
            F.round(
                F.col("var_pico") / (float(_SPEC_GRID) * _SPEC_GRID), 8
            ).alias("var"),
            # exact integer gate: a constant corpus has tv = 0 and an
            # undefined share (ANSI divide-by-zero otherwise)
            F.round(
                F.when(F.col("tv") > 0, F.col("cv") * 1.0 / F.col("tv")), 4
            ).alias("cum_energy_share"),
        )
        .orderBy("dim")
    )
