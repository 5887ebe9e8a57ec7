"""K-means (Lloyd's) over embedding columns — the index-building
primitive behind IVF ANN (coarse quantizer cells) and the second
iterative distributed algorithm in the engine (with
operators/components.py).

Design:
- deterministic seeding: the k vectors with the smallest md5-based
  hash of their id — reproducible across runs and engines, no RNG;
- assignment is vectorized: centroids (k x dim, tiny) ship in the
  mapInPandas closure and each Arrow batch does one numpy argmin over
  a batch x k distance matrix;
- update collects only (cluster, partial_sum, count) per partition —
  k x dim doubles per task — then the driver reduces and re-broadcasts;
- stops when no assignment changes (or max_iter).

At 100 TB: per-iteration cost is one scan + one tiny shuffle of
partial sums; centroids stay driver-side (k x dim is KBs for any sane
k). The classic MLlib KMeans does the same dance; this implementation
exists so the engine has no MLlib dependency and the mechanics stay
inspectable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

ASSIGN_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("cluster", IntegerType())]
)


def _seed_centroids(df: DataFrame, k: int) -> np.ndarray:
    """Deterministic seeds: k vectors minimizing md5('seed|<id>')."""
    seeds = (
        df.select("vec_id", "embedding")
        .withColumn(
            "h",
            F.conv(
                F.substring(F.md5(F.concat(F.lit("seed|"), F.col("vec_id").cast("string"))), 1, 15),
                16,
                10,
            ).cast("long"),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    return np.array([r["embedding"] for r in seeds], dtype=np.float64)


def kmeans(
    df: DataFrame, k: int = 8, max_iter: int = 25
) -> tuple[DataFrame, np.ndarray, list[float]]:
    """Cluster (vec_id, embedding) rows.

    Returns (assignments DataFrame, final centroids, per-iteration
    inertia history). Assignments are deterministic given the data.
    """
    spark = df.sparkSession
    data = df.select("vec_id", "embedding")
    centroids = _seed_centroids(data, k)
    prev_assign: DataFrame | None = None
    history: list[float] = []

    for _ in range(max_iter):
        cent = centroids  # capture by value for the closure

        def assign(batches):
            for pdf in batches:
                mat = np.array(list(pdf["embedding"]), dtype=np.float64)
                d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].astype("int64"),
                        "cluster": d2.argmin(axis=1).astype("int32"),
                    }
                )

        assignments = data.mapInPandas(assign, ASSIGN_SCHEMA).localCheckpoint()

        # update step: per-cluster component sums via one partial-agg pass
        joined = data.join(assignments, "vec_id")
        comp = joined.select(
            "cluster", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        stats = (
            comp.groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_centroids = centroids.copy()
        counts = np.zeros(k)
        for r in stats:
            new_centroids[r["cluster"], r["pos"]] = r["s"] / r["n"]
            counts[r["cluster"]] = r["n"]
        # empty clusters keep their previous centroid
        del counts  # (kept implicitly via new_centroids defaults)

        centroids = new_centroids
        if prev_assign is not None:
            changed = (
                assignments.alias("n")
                .join(prev_assign.alias("p"), "vec_id")
                .filter(F.col("n.cluster") != F.col("p.cluster"))
                .count()
            )
            if changed == 0:
                history.append(_inertia(data, centroids))
                return assignments, centroids, history
        prev_assign = assignments
        history.append(_inertia(data, centroids))

    return prev_assign, centroids, history


def kmeans_quantized(
    df: DataFrame, k: int = 8, rounds: int = 4, qscale: int = 1000
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means whose every step is reproducible in ANSI SQL —
    the variant the registry queries use so the driver's DuckDB oracle
    can replay the identical training run (VERDICT r02 item 2).

    Determinization, mirrored term-for-term by
    :func:`kmeans_lloyd_sql`:

    - vectors quantize once to integers (``floor(x * qscale)``), so
      centroid numerators are EXACT integer sums — order-independent,
      bit-identical in any engine;
    - a centroid component is the single IEEE division
      ``sum / (n * qscale)`` — deterministic given identical integer
      inputs;
    - seeds are the k rows minimizing ``md5('seed|' || vec_id)``
      (cluster id = seed rank), no RNG;
    - assignment ranks clusters by ``(round(d2, 6), cluster)`` — the
      same rounded-distance + id tie-break ``_probe_cells`` uses, so
      sub-ulp summation differences between engines cannot flip an
      argmin;
    - exactly ``rounds`` update steps, NO data-dependent early stop
      (convergence checks diverge between engines near fixpoints).

    Scale shape: the quantized corpus materializes once (eager local
    checkpoint); per round, assignment is a whole-stage-codegen
    expression over k literal centroid arrays (argmin via array_min of
    (d2, cluster) structs — no shuffle, no Python), and the update is
    one groupBy(cluster, pos) whose partial aggregation collapses each
    partition to k*dim rows before the shuffle; only k*dim (sum, n)
    pairs ever reach the driver. Identical per-round cost to the
    mapInPandas :func:`kmeans` above, minus the Arrow crossings.
    """
    spark_qscale = float(qscale)
    qv = df.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * qscale).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=True)

    seed_rows = (
        qv.withColumn(
            "h",
            F.substring(
                F.md5(F.concat(F.lit("seed|"), F.col("vec_id").cast("string"))), 1, 15
            ),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    cent: list[list[float]] = [[x / spark_qscale for x in r["qv"]] for r in seed_rows]

    def assign_col(centroids: list[list[float]]) -> F.Column:
        structs = []
        for c, cvec in enumerate(centroids):
            carr = F.array(*[F.lit(v) for v in cvec])
            diff = F.zip_with(
                "qv", carr, lambda x, cc: (x / spark_qscale - cc) * (x / spark_qscale - cc)
            )
            d2 = F.aggregate(diff, F.lit(0.0), lambda acc, t: acc + t)
            structs.append(
                F.struct(F.round(d2, 6).alias("d2"), F.lit(c).alias("cluster"))
            )
        return F.array_min(F.array(*structs))["cluster"]

    for _ in range(rounds):
        a = qv.select("qv", assign_col(cent).alias("cluster"))
        stats = (
            a.select("cluster", F.posexplode("qv"))
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_cent = [list(c) for c in cent]  # empty clusters keep previous
        for r in stats:
            new_cent[r["cluster"]][r["pos"]] = r["s"] / (r["n"] * spark_qscale)
        cent = new_cent

    assignments = qv.select("vec_id", assign_col(cent).alias("cluster"))
    return assignments, cent


_KM_PARTIAL_SCHEMA = StructType(
    [
        StructField("cluster", IntegerType()),
        StructField("pos", IntegerType()),
        StructField("s", LongType()),
        StructField("n", LongType()),
    ]
)


def _km_argmin(qmat: "np.ndarray", cent: "np.ndarray", qscale: float) -> "np.ndarray":
    """Nearest-centroid index per row, replaying the SQL comparator
    exactly: d2 accumulates one DIMENSION at a time
    (``acc += (x_d - c_d)^2`` — every element sums ``0.0 + t1 + t2 +
    ...`` in the fold's / the SQL sum chain's IEEE order, the
    operators/topk.py bit-parity trick; a BLAS matmul would
    pairwise-sum and break it), then rank by (round-half-away(d2, 6),
    cluster) — np.argmin's first-minimum IS the lowest cluster id."""
    n, dim = qmat.shape
    acc = np.zeros((n, cent.shape[0]))
    for d in range(dim):
        t = qmat[:, d, None] / qscale - cent[None, :, d]
        acc += t * t
    p = 1e6
    rounded = np.where(acc >= 0, np.floor(acc * p + 0.5), np.ceil(acc * p - 0.5)) / p
    return rounded.argmin(axis=1)


def kmeans_quantized_table(
    df: DataFrame,
    k: int,
    rounds: int = 4,
    qscale: int = 1000,
    train_filter=None,
) -> tuple[DataFrame, list[list[float]]]:
    """:func:`kmeans_quantized` for DATA-SCALED cell counts (k ~
    sqrt(n), the FAISS IndexIVF sizing rule) — bit-identical math (same
    md5 seeds, exact integer sums, ``round(d2, 6)`` + cluster-id
    tie-break, fixed round count), so :func:`kmeans_lloyd_sql` replays
    it unchanged, but the n·k·d assignment runs as a vectorized
    fold-order-exact numpy kernel (mapInPandas) instead of k literal
    expression branches: at k in the hundreds the literal-array plan
    stops compiling usefully, and the zip_with/aggregate fold drops to
    interpreted eval (measured 66 s/pass at n=200k, k=447 vs ~3 s for
    the kernel).

    Per training round the kernel FUSES assignment and the centroid
    update: each Arrow batch scatter-adds its vectors' INTEGER
    components into a (touched-clusters x dim) partial-sum block, so
    one scan emits <= min(batch, k) * dim partial rows and one tiny
    groupBy reduces them — only k x dim (sum, n) pairs reach the
    driver. Centroids ship per-executor via a broadcast variable:
    k x dim doubles is 16 MB even at n = 10^9 (k = 31623), d = 64 —
    sqrt growth is exactly what keeps the closure bounded at 100 TB.
    Row chunks inside a batch are sized so the n_chunk x k distance
    block stays ~40M doubles regardless of k.

    ``train_filter`` (a boolean Column over the quantized rows, e.g.
    ``F.col("vec_id") % smod == 0``) restricts SEEDS and the training
    rounds to a deterministic sample while the returned assignments
    still cover every row — the FAISS posture (train on a bounded
    sample, add the full corpus): full-corpus training is
    n * k * d = n^1.5 * d per round at k = sqrt(n) (measured 1128 s
    cold at n=2M), while sample training is linear and only the single
    final assignment pass stays n^1.5.
    """
    spark = df.sparkSession
    spark_qscale = float(qscale)
    qv = df.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * qscale).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=True)

    qv_t = qv if train_filter is None else qv.filter(train_filter).localCheckpoint(
        eager=True
    )
    seed_rows = (
        qv_t.withColumn(
            "h",
            F.substring(
                F.md5(F.concat(F.lit("seed|"), F.col("vec_id").cast("string"))), 1, 15
            ),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    cent: list[list[float]] = [[x / spark_qscale for x in r["qv"]] for r in seed_rows]

    def _chunks(pdf: pd.DataFrame, kk: int):
        rows_per_chunk = max(256, int(40_000_000 / max(kk, 1)))
        for lo in range(0, len(pdf), rows_per_chunk):
            chunk = pdf.iloc[lo : lo + rows_per_chunk]
            yield chunk, np.array(list(chunk["qv"]), dtype=np.float64)

    def partials_fn(centroids: list[list[float]]):
        bc = spark.sparkContext.broadcast(np.array(centroids, dtype=np.float64))

        def gen(batches):
            cmat = bc.value
            kk, dim = cmat.shape
            for pdf in batches:
                if not len(pdf):
                    continue
                for chunk, qmat in _chunks(pdf, kk):
                    a = _km_argmin(qmat, cmat, spark_qscale)
                    qint = np.array(list(chunk["qv"]), dtype=np.int64)
                    touched = np.unique(a)
                    s = np.zeros((len(touched), dim), dtype=np.int64)
                    remap = np.searchsorted(touched, a)
                    np.add.at(s, remap, qint)
                    n_per = np.bincount(remap, minlength=len(touched))
                    yield pd.DataFrame(
                        {
                            "cluster": np.repeat(touched, dim).astype("int32"),
                            "pos": np.tile(np.arange(dim), len(touched)).astype(
                                "int32"
                            ),
                            "s": s.reshape(-1),
                            "n": np.repeat(n_per, dim),
                        }
                    )

        return gen

    for _ in range(rounds):
        partials = qv_t.select("qv").mapInPandas(partials_fn(cent), _KM_PARTIAL_SCHEMA)
        stats = (
            partials.groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new_cent = [list(c) for c in cent]  # empty clusters keep previous
        for r in stats:
            new_cent[r["cluster"]][r["pos"]] = r["s"] / (r["n"] * spark_qscale)
        cent = new_cent

    bc_final = spark.sparkContext.broadcast(np.array(cent, dtype=np.float64))

    def assign_gen(batches):
        cmat = bc_final.value
        for pdf in batches:
            if not len(pdf):
                continue
            for chunk, qmat in _chunks(pdf, cmat.shape[0]):
                a = _km_argmin(qmat, cmat, spark_qscale)
                yield pd.DataFrame(
                    {
                        "vec_id": chunk["vec_id"].astype("int64"),
                        "cluster": a.astype("int32"),
                    }
                )

    assignments = qv.mapInPandas(assign_gen, ASSIGN_SCHEMA)
    return assignments, cent


_KM_MULTI_PARTIAL_SCHEMA = StructType(
    [
        StructField("sub", IntegerType()),
        StructField("cluster", IntegerType()),
        StructField("pos", IntegerType()),
        StructField("s", LongType()),
        StructField("n", LongType()),
    ]
)


def kmeans_quantized_multi(
    df: DataFrame,
    n_sub: int,
    dsub: int,
    k: int,
    rounds: int = 4,
    qscale: int = 1000,
    train_filter=None,
    extra: tuple[str, ...] = (),
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Train ``n_sub`` INDEPENDENT :func:`kmeans_quantized` instances —
    one per ``dsub``-dim slice of ``vec_col`` — in ONE fused pass per
    round (r10 optimization, guide §2.4/§5). The PQ tiers previously
    trained their {n_sub} subspace codebooks sequentially: each slice
    paid its own eager checkpoint, seed collect, per-round
    partial+collect jobs, and a final assignment that had to be joined
    back on vec_id ({n_sub} joins). All of that is loop-invariant
    across subspaces:

    - the seed rows minimize md5('seed|'||vec_id) — a function of
      vec_id only, so ALL subspaces share the same k seed ROWS (one
      collect, sliced locally);
    - quantization commutes with slicing (floor is elementwise), so one
      64-dim quantized table serves every subspace;
    - per round, one mapInPandas kernel computes every subspace's
      argmin + integer scatter-add and emits (sub, cluster, pos, s, n)
      partials — ONE job and ONE k*n_sub*dsub-row collect per round
      instead of n_sub;
    - the final pass emits (vec_id, *extra, c0..c{{n_sub-1}}) directly —
      the PQ code table with ZERO joins.

    Bit-identity: integer sums are order-free, the argmin comparator is
    :func:`_km_argmin` (the comparator the per-subspace table kernel
    uses, equivalence-tested against the literal-expression variant),
    and seeds/updates are the same numbers — so results are unchanged
    vs. n_sub separate trainings and the DuckDB ``kmeans_lloyd_sql``
    replays per-subspace CTEs verbatim. ``extra`` columns pass through
    to the output assignment table (saves the label re-join).
    """
    spark = df.sparkSession
    spark_qscale = float(qscale)
    extra = tuple(extra)
    extra_fields = [df.schema[c] for c in extra]
    qv = df.select(
        "vec_id",
        *extra,
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * qscale).cast("long"),
        ).alias("qv"),
    ).localCheckpoint(eager=True)

    qv_t = qv if train_filter is None else qv.filter(train_filter).localCheckpoint(
        eager=True
    )
    seed_rows = (
        qv_t.withColumn(
            "h",
            F.substring(
                F.md5(F.concat(F.lit("seed|"), F.col("vec_id").cast("string"))), 1, 15
            ),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    cent: list[list[list[float]]] = [
        [
            [x / spark_qscale for x in r["qv"][m * dsub : (m + 1) * dsub]]
            for r in seed_rows
        ]
        for m in range(n_sub)
    ]

    def _chunks(pdf: pd.DataFrame, kk: int):
        rows_per_chunk = max(256, int(40_000_000 / max(kk * n_sub, 1)))
        for lo in range(0, len(pdf), rows_per_chunk):
            chunk = pdf.iloc[lo : lo + rows_per_chunk]
            yield chunk, np.array(list(chunk["qv"]), dtype=np.int64)

    def partials_fn(centroids: list[list[list[float]]]):
        bc = spark.sparkContext.broadcast(
            [np.array(cm, dtype=np.float64) for cm in centroids]
        )

        def gen(batches):
            cents = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                for chunk, qint in _chunks(pdf, k):
                    frames = []
                    for m in range(n_sub):
                        sl = qint[:, m * dsub : (m + 1) * dsub]
                        a = _km_argmin(sl.astype(np.float64), cents[m], spark_qscale)
                        touched = np.unique(a)
                        s = np.zeros((len(touched), dsub), dtype=np.int64)
                        remap = np.searchsorted(touched, a)
                        np.add.at(s, remap, sl)
                        n_per = np.bincount(remap, minlength=len(touched))
                        frames.append(
                            pd.DataFrame(
                                {
                                    "sub": np.full(
                                        len(touched) * dsub, m, dtype="int32"
                                    ),
                                    "cluster": np.repeat(touched, dsub).astype(
                                        "int32"
                                    ),
                                    "pos": np.tile(
                                        np.arange(dsub), len(touched)
                                    ).astype("int32"),
                                    "s": s.reshape(-1),
                                    "n": np.repeat(n_per, dsub),
                                }
                            )
                        )
                    yield pd.concat(frames, ignore_index=True)

        return gen

    for _ in range(rounds):
        partials = qv_t.select("qv").mapInPandas(
            partials_fn(cent), _KM_MULTI_PARTIAL_SCHEMA
        )
        stats = (
            partials.groupBy("sub", "cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new_cent = [[list(c) for c in cm] for cm in cent]
        for r in stats:
            new_cent[r["sub"]][r["cluster"]][r["pos"]] = r["s"] / (
                r["n"] * spark_qscale
            )
        cent = new_cent

    bc_final = spark.sparkContext.broadcast(
        [np.array(cm, dtype=np.float64) for cm in cent]
    )

    def assign_gen(batches):
        cents = bc_final.value
        for pdf in batches:
            if not len(pdf):
                continue
            for chunk, qint in _chunks(pdf, k):
                cols = {"vec_id": chunk["vec_id"].astype("int64")}
                for c in extra:
                    cols[c] = chunk[c]
                for m in range(n_sub):
                    sl = qint[:, m * dsub : (m + 1) * dsub].astype(np.float64)
                    cols[f"c{m}"] = _km_argmin(sl, cents[m], spark_qscale).astype(
                        "int32"
                    )
                yield pd.DataFrame(cols)

    out_schema = StructType(
        [StructField("vec_id", LongType())]
        + extra_fields
        + [StructField(f"c{m}", IntegerType()) for m in range(n_sub)]
    )
    codes = qv.mapInPandas(assign_gen, out_schema)
    return codes, cent


def kmeans_lloyd_sql(
    k: int | str = 8,
    rounds: int = 4,
    qscale: int = 1000,
    dim: int = 64,
    prefix: str = "",
    src: str = "embeddings",
    vec: str = "embedding",
    train_where: str = "",
) -> str:
    """DuckDB CTE chunk replaying :func:`kmeans_quantized` exactly:
    unrolled Lloyd iterations (no recursion, no RNG). Exposes
    ``{prefix}kassign{rounds}`` (vec_id, qv, cluster) and
    ``{prefix}kcent{rounds}`` (cluster, c). ``k`` may be an int or a
    SQL scalar expression (dynamic sizing); ``prefix``/``src``/``vec``
    let several independent trainings coexist in ONE query (the PQ
    subspace codebooks train independent instances over residual
    slices); ``train_where`` (a boolean SQL over ``{prefix}kqv`` rows)
    restricts seeds and the training rounds to a deterministic sample
    while the FINAL assignment still covers every row — mirrors
    :func:`kmeans_quantized_table`'s ``train_filter``.
    Embed via ``WITH {kmeans_lloyd_sql(...)}, ...``."""
    d2 = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> (v.qv[i] / {qscale}.0 - c.c[i]) * (v.qv[i] / {qscale}.0 - c.c[i])))"
    )
    train = f"{prefix}kqv_t" if train_where else f"{prefix}kqv"
    parts = [
        f"""{prefix}kqv AS (
  SELECT vec_id,
         list_transform({vec},
           x -> CAST(floor(CAST(x AS DOUBLE) * {qscale}) AS BIGINT)) AS qv
  FROM {src} WHERE {vec} IS NOT NULL
)"""
    ]
    if train_where:
        parts.append(
            f"""{prefix}kqv_t AS MATERIALIZED (
  SELECT * FROM {prefix}kqv WHERE {train_where}
)"""
        )
    parts.append(
        f"""{prefix}kcent0 AS (
  SELECT cluster, list_transform(qv, x -> x / {qscale}.0) AS c FROM (
    SELECT qv,
           row_number() OVER (
             ORDER BY substring(md5('seed|' || CAST(vec_id AS VARCHAR)), 1, 15), vec_id
           ) - 1 AS cluster
    FROM {train}
  ) WHERE cluster < {k}
)"""
    )
    for r in range(rounds + 1):
        asrc = f"{prefix}kqv" if r == rounds else train
        parts.append(
            f"""{prefix}kassign{r} AS (
  SELECT vec_id, qv, cluster FROM (
    SELECT vec_id, qv, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 6), cluster) AS rk
    FROM (
      SELECT v.vec_id, v.qv, c.cluster, {d2} AS d2
      FROM {asrc} v CROSS JOIN {prefix}kcent{r} c
    )
  ) WHERE rk = 1
)"""
        )
        if r < rounds:
            parts.append(
                f"""{prefix}kcent{r + 1} AS (
  SELECT p.cluster, COALESCE(u.c, p.c) AS c
  FROM {prefix}kcent{r} p LEFT JOIN (
    SELECT cluster, list(s / (n * {qscale}.0) ORDER BY pos) AS c
    FROM (
      SELECT cluster, pos, sum(x) AS s, count(*) AS n
      FROM (
        SELECT cluster, generate_subscripts(qv, 1) AS pos, unnest(qv) AS x
        FROM {prefix}kassign{r}
      )
      GROUP BY cluster, pos
    )
    GROUP BY cluster
  ) u ON u.cluster = p.cluster
)"""
            )
    return ",\n".join(parts)


def _inertia(data: DataFrame, centroids: np.ndarray) -> float:
    """Sum of squared distances to nearest centroid (per-partition
    partial sums, one scan)."""
    from pyspark.sql.types import DoubleType

    cent = centroids

    def part(batches):
        for pdf in batches:
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).min(axis=1)
            yield pd.DataFrame({"d2": [float(d2.sum())]})

    parts = data.mapInPandas(part, StructType([StructField("d2", DoubleType())]))
    return float(parts.agg(F.sum("d2")).collect()[0][0])
