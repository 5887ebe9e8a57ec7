"""Registry-wide NULL-hostility audit: plant NULLs in every nullable
user-data column (documents.text/lang/source, events.ts/event_type/
value/props, embeddings.embedding/label) and run ALL registry queries
through the driver-equivalent oracle compare. The divergence classes
this hunts: engine-specific NULL propagation through string/array
expressions (Spark concat vs DuckDB concat treat NULLs differently),
kernels that crash on None rows, cohort columns where a NULL group
silently drops on one engine, and three-valued-logic filters that keep
NULL on one side only.

Too heavy for the per-commit suite (~15 min, 200+ compares); run after
touching text normalization, cohort unions or any Python kernel:

    python examples/hostile_nulls_audit.py

Result of record (r08 continuation session 4, all 226 queries):
0 fails, 0 errors — after the sweep caught and fixed the PII
refactor's NULL-text undercount (tests/test_null_hostile.py). Divergences found by earlier runs of this audit
are fixed with planted regression tests in tests/test_null_hostile.py
(see ROADMAP.md).
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.session import get_spark
from oracle import compare

SRC = "/root/testdata/sf0.001"
TMP = "/tmp/hostile_nulls"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_corpus() -> None:
    """Co-prime moduli so every combination of present/NULL columns
    occurs, including all-NULL rows; keys stay non-null."""
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text,
         CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
         CASE WHEN doc_id % 13 = 0 THEN NULL ELSE source END AS source,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS n_chars
  FROM '{SRC}/documents.parquet'
) TO '{TMP}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  SELECT event_id,
         CASE WHEN event_id % 17 = 0 THEN NULL ELSE ts END AS ts,
         user_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS event_type,
         CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value,
         CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS props
  FROM '{SRC}/events.parquet'
) TO '{TMP}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  SELECT vec_id,
         CASE WHEN vec_id % 11 = 0 THEN NULL ELSE embedding END AS embedding,
         CASE WHEN vec_id % 7 = 0 THEN NULL ELSE label END AS label
  FROM '{SRC}/embeddings.parquet'
) TO '{TMP}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in TABLES:
        if t not in ("documents", "events", "embeddings"):
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{TMP}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()


def main() -> None:
    build_corpus()
    spark = get_spark(app_name="hostile-nulls-audit", shuffle_partitions=8)
    fails, errs = [], []
    for i, (name, q) in enumerate(REGISTRY.items()):
        if q.oracle is None:
            continue
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{TMP}/{t}.parquet'"
                )
            ok, msg = compare(q.spark_fn(spark, TMP), con.execute(q.oracle).df())
            if not ok:
                fails.append((name, msg[:200]))
                print("FAIL", name, msg[:200], flush=True)
        except Exception as e:  # noqa: BLE001 — audit must survey everything
            errs.append((name, f"{type(e).__name__}: {e}"[:200]))
            print("ERR", name, errs[-1][1][:150], flush=True)
        finally:
            con.close()
            # long-lived sweep session: queries cache/localCheckpoint
            # bounded tables; drop them between queries so the 200+
            # compare loop doesn't accumulate executor memory pressure
            spark.catalog.clearCache()
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(REGISTRY)}", flush=True)
    print(f"DONE fails: {len(fails)} errs: {len(errs)}")
    for kind, items in (("FAIL", fails), ("ERR", errs)):
        for name, msg in items:
            print(kind, name, "::", msg)
    raise SystemExit(1 if fails or errs else 0)


if __name__ == "__main__":
    main()
