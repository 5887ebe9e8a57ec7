"""Scale-up generator: replicate the driver's sf0.1 tables to sf>=1 for
bench headroom (VERDICT r02 item 7 — several plans coalesce to trivial
work at sf0.1, so round-over-round deltas need a larger series).

TPC-H-style scaling semantics: each replica is an independent
sub-database (every key column shifts by ``replica * stride`` where the
stride is the next power of 10 above the source key domain), while the
fixed-cardinality dimensions (region, nation) stay single-copy — joins
keep identical per-replica fan-out, aggregates scale linearly, and no
cross-replica key ever collides.

Content columns are perturbed deterministically so duplicate-detection
workloads scale instead of degenerating into planted cross-replica
twins:

- ``documents.text``: replica r > 0 prefixes EVERY token with a
  replica tag — a bijective whole-vocabulary rename. Cross-replica
  token sets are disjoint, so shingle Jaccard is exactly 0 and SimHash
  signatures are fully independent (P[hamming <= 4 of 32] ~ 1e-5 —
  ~5.6k incidental pairs across all 45 replica combos at sf1, vs 25M
  when only half the vocab was renamed: partially-shared vocabularies
  COMPRESS signature diversity because the strong common-token votes
  agree everywhere while the renamed half degenerates to coin flips;
  measured r03). Per-replica internal structure is isomorphic to
  sf0.1 under the rename (identical token positions and equalities,
  fresh hash values), which is what a scale series needs — same
  workload shape, 10x the rows, no planted cross-replica twins.
- ``embeddings.embedding``: component signs flip by a per-replica
  md5-derived +/-1 pattern. Norms (and so unit vectors, cell geometry,
  quantization error profiles) are exactly preserved; relative sign
  patterns between distinct replicas are ~balanced, so cross-replica
  cosines concentrate near 0 and ANN/near-dup outputs stay
  candidate-bounded.

Everything runs as Spark jobs (explode over replica ids — no driver
materialization), so the same module generates sf10 on a cluster.
"""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# key columns per table, all shifted by the same per-domain stride
_KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# key -> (table, column) whose max defines the shared stride
_DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

_EMB_DIM = 64


def _parquet_parts(path: str) -> list:
    from pathlib import Path

    p = Path(path)
    if p.is_file():
        return [str(p)]
    return sorted(str(f) for f in p.rglob("*.parquet") if f.is_file())


def _pq_file_meta(path: str):
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata


def _stride_for(spark: SparkSession, src: str, table: str, col: str) -> int:
    mx = spark.read.parquet(f"{src}/{table}.parquet").agg(F.max(col)).first()[0]
    return 10 ** int(math.ceil(math.log10(int(mx) + 2)))


def _sign_pattern(replica: int, dim: int = _EMB_DIM) -> list[int]:
    """Deterministic +/-1 per (replica, component); replica 0 is all +1
    so the first copy is byte-identical to the source."""
    if replica == 0:
        return [1] * dim
    return [
        1 - 2 * (hashlib.md5(f"sign|{replica}:{d}".encode()).digest()[0] & 1)
        for d in range(dim)
    ]


# Parquet row-group ceiling for generated tables. The default writer
# produced single ~240 MB row groups on the sf100 text columns
# (VERDICT r07 item 5): a row group is the parquet SPLIT unit, so a
# 240 MB group forces one task per 240 MB of text — scan parallelism
# collapses and the single shared JVM needed a 16 GiB heap just to
# decode. 32 MiB groups restore split parallelism at default heap.
_ROW_GROUP_BYTES = 32 * 1024 * 1024


def generate(
    spark: SparkSession,
    src: str,
    out: str,
    mult: int = 10,
    tables: list[str] | None = None,
) -> None:
    """Write ``mult``-times-scaled copies of every table to ``out``
    (all of TABLES, or just ``tables`` for a targeted regeneration)."""
    strides = {
        name: _stride_for(spark, src, t, c) for name, (t, c) in _DOMAINS.items()
    }

    def key_stride(col: str) -> int:
        for name, s in strides.items():
            if col.endswith(name):
                return s
        raise KeyError(col)

    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("_r")

    for table in tables if tables is not None else TABLES:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if table in ("region", "nation"):
            out_df = df  # fixed-cardinality dimensions stay single-copy
        else:
            # Spread the byte-small source BEFORE the x-mult explode:
            # Spark sizes scan parallelism by bytes, so a one-split
            # source would run the entire explode+perturb (mult x rows)
            # in ONE task — measured at mult=1000: lineitem alone held
            # a single core for >30 min; with the spread the same stage
            # runs 32-wide. The repartition shuffles only the tiny
            # source, never the exploded output (same rule as
            # load_table(spread=True); SCALE.md "bytes-vs-CPU").
            df = df.repartition(spark.sparkContext.defaultParallelism)
            wide = df.select("*", rep)
            shifted = [
                (F.col(c) + F.col("_r") * key_stride(c)).alias(c)
                if c in _KEYS[table]
                else F.col(c)
                for c in df.columns
            ]
            out_df = wide.select(*shifted, "_r")
            if table == "documents":
                toks = F.split("text", " ")
                tagged = F.array_join(
                    F.transform(
                        toks,
                        lambda x: F.when(
                            F.col("_r") > 0,
                            F.concat(F.lit("q"), F.col("_r").cast("string"), F.lit("_"), x),
                        ).otherwise(x),
                    ),
                    " ",
                )
                out_df = out_df.withColumn("text", tagged).withColumn(
                    "n_chars", F.length("text")
                )
            if table == "embeddings":
                signs = F.array(
                    *[
                        F.array(*[F.lit(float(s)) for s in _sign_pattern(r)])
                        for r in range(mult)
                    ]
                )
                flipped = F.zip_with(
                    "embedding",
                    F.element_at(signs, F.col("_r") + 1),
                    lambda x, s: (x * s).cast("float"),
                )
                out_df = out_df.withColumn("embedding", flipped)
            out_df = out_df.drop("_r")
        # Bound the split unit by BYTES, not a fixed row count: 400k
        # rows of text is ~240 MB uncompressed and the parquet writer's
        # lazy block-size check can leave it a single row group —
        # exactly the sf100 layout that collapsed scan parallelism
        # (VERDICT r07 item 5). maxRecordsPerFile derives from the
        # SOURCE footers' measured uncompressed bytes/row, so every
        # generated file (hence row group) stays near _ROW_GROUP_BYTES
        # whatever the table's row width.
        src_md = [
            _pq_file_meta(p)
            for p in _parquet_parts(f"{src}/{table}.parquet")
        ]
        src_rows = sum(m.num_rows for m in src_md)
        src_unc = sum(
            m.row_group(i).total_byte_size
            for m in src_md
            for i in range(m.num_row_groups)
        )
        bytes_per_row = max(1.0, src_unc / max(1, src_rows))
        rows_per_file = max(10_000, int(_ROW_GROUP_BYTES / bytes_per_row))
        n_rows = df.count() * mult
        n_files = max(1, n_rows // max(rows_per_file, 1))
        out_df.repartition(int(n_files)).write.mode("overwrite").option(
            "parquet.block.size", str(_ROW_GROUP_BYTES)
        ).option("maxRecordsPerFile", str(rows_per_file)).parquet(
            f"{out}/{table}.parquet"
        )


def generate_anisotropic_embeddings(
    spark: SparkSession,
    out: str,
    n: int,
    dim: int = _EMB_DIM,
    half_life: int = 8,
) -> None:
    """Decaying-spectrum embedding corpus (VERDICT r07 item 9): the
    testdata embeddings are isotropic (iid components), so the
    OPQ/SRHT/Matryoshka recall harnesses report honest negatives —
    rotation and prefix-truncation have nothing to exploit. Real
    embedding corpora (CLIP/BERT) are strongly ANISOTROPIC: their
    covariance spectrum decays, most energy rides the leading
    directions. This generator plants exactly that structure, axis-
    aligned: component k has standard deviation 2^(-k/half_life)
    (half_life=8 => 64-dim spectrum spans a 2^8 = 256x sigma ratio,
    the eigenvalue-decay ballpark of sentence-embedding covariance),
    so prefix dims carry most energy (the Matryoshka/MRL premise,
    Kusupati et al. 2022) and contiguous PQ subspaces are maximally
    UNbalanced (the OPQ premise, Ge et al. 2013 — rotation lift
    appears where variance is unevenly distributed across code
    subspaces).

    Determinism: components are hash-derived, no RNG — g_k(v) is a
    standardized sum of 4 xxhash64-uniforms (Irwin-Hall, CLT-gaussian
    enough for geometry), so regeneration is bit-stable and the
    recall reports over this corpus are reproducible measurements.
    Writes ``<out>/embeddings.parquet`` in the testdata schema
    (vec_id long, embedding array<float>, label int) — the recall
    harnesses take any sf_dir containing it.
    """
    grid = 1 << 24

    def uniform(k: int, j: int):
        h = F.xxhash64(F.col("vec_id"), F.lit(k), F.lit(j))
        return (F.pmod(h, F.lit(grid))).cast("double") / grid

    def component(k: int):
        # Irwin-Hall(4): mean 2, var 4/12 — standardize, then scale by
        # the decaying sigma; one Catalyst expression per component
        g = sum(uniform(k, j) for j in range(4))
        sigma = 2.0 ** (-k / half_life)
        return ((g - F.lit(2.0)) / F.lit(math.sqrt(4 / 12.0)) * F.lit(sigma)).cast(
            "float"
        )

    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[component(k) for k in range(dim)]).alias("embedding"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("label")), F.lit(16))
        .cast("int")
        .alias("label"),
    )
    n_files = max(1, n // 400_000)
    df.repartition(n_files).write.mode("overwrite").option(
        "parquet.block.size", str(_ROW_GROUP_BYTES)
    ).parquet(f"{out}/embeddings.parquet")


def generate_boilerplate_documents(
    spark: SparkSession,
    out: str,
    n_docs: int,
    n_templates: int = 20,
    header_len: int = 40,
    footer_len: int = 30,
    body_len: int = 20,
    dup_every: int = 4,
) -> None:
    """Boilerplate-heavy / high-duplication documents corpus (VERDICT
    r08 item 5): the suffix-array operator's ACTUAL target workload.
    The stock synthetic corpus is the PLCP worst case — a ~31-word
    saturated vocabulary with no true cross-document duplication gives
    7.4% LCP reducibility, so the PLCP variant descends 93% of pairs
    anyway and loses its A/B (SCALE.md). Real crawl corpora are the
    opposite: shared templates (headers, footers, nav chrome) and
    outright page duplicates make long repeated runs dominate, and
    PLCP reducibility — plcp(i) = plcp(i-1) - 1 inside a repeated run
    — scales with exactly that duplication.

    Structure, all hash-derived (bit-stable, no RNG):
      - each doc belongs to template family ``doc_id % n_templates``
        and wraps its body in the family's fixed {header_len}-token
        header and {footer_len}-token footer (the boilerplate);
      - the body is {body_len} unique tokens drawn from a 100k-word
        vocabulary via xxhash64(content_id, j);
      - every ``dup_every``-th doc is an EXACT full copy of its
        predecessor (content_id = doc_id - 1), planting the page-level
        duplication SA dedup hunts.

    Writes ``<out>/documents.parquet`` in the testdata schema
    (doc_id, text, lang, source, n_chars)."""
    tmpl = {
        f: (
            " ".join(f"hb{f}x{k}" for k in range(header_len)),
            " ".join(f"fb{f}x{k}" for k in range(footer_len)),
        )
        for f in range(n_templates)
    }
    hdr = F.element_at(
        F.array(*[F.lit(tmpl[f][0]) for f in range(n_templates)]),
        (F.col("fam") + 1).cast("int"),
    )
    ftr = F.element_at(
        F.array(*[F.lit(tmpl[f][1]) for f in range(n_templates)]),
        (F.col("fam") + 1).cast("int"),
    )
    body = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("content_id"), F.lit(j)), F.lit(100_000))
                .cast("string"),
            )
            for j in range(body_len)
        ],
    )
    df = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            # every dup_every-th doc copies its predecessor verbatim
            F.when(
                (F.col("id") % dup_every == 1) & (F.col("id") > 0),
                F.col("id") - 1,
            )
            .otherwise(F.col("id"))
            .alias("content_id"),
        )
        .withColumn("fam", F.col("content_id") % n_templates)
        .select(
            "doc_id",
            F.concat_ws(" ", hdr, body, ftr).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("tmpl"), F.col("fam").cast("string")).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    n_files = max(1, n_docs // 400_000)
    df.repartition(n_files).write.mode("overwrite").option(
        "parquet.block.size", str(_ROW_GROUP_BYTES)
    ).parquet(f"{out}/documents.parquet")


def ensure(spark: SparkSession, out: str, src: str = "/root/testdata/sf0.1", mult: int = 10) -> str:
    """Generate once; a _DONE marker makes reruns free."""
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        generate(spark, src, out, mult)
        with open(marker, "w") as f:
            f.write(f"src={src} mult={mult}\n")
    return out


if __name__ == "__main__":
    import argparse

    from http_log_anonymizer_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.benchdata/sf1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    generate(get_spark(app_name="scale-gen"), args.src, args.out, args.mult)
