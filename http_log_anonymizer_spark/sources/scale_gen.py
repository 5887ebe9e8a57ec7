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
        n_files = max(1, (df.count() * mult) // 400_000)
        out_df.repartition(n_files).write.mode("overwrite").option(
            "parquet.block.size", str(_ROW_GROUP_BYTES)
        ).parquet(f"{out}/{table}.parquet")


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
