"""Registry-wide tie-hostility audit: duplicate every document, event
and embedding under fresh keys (exact-duplicate CONTENT, so ties
appear in every score, count, distance and support point) and run ALL
registry queries through the driver-equivalent oracle compare. Any
peer-order-dependent window, unstable top-k, or union-without-regroup
shows up as a hash mismatch — the class that produced the late-r08
classifier_auc/ks_drift/watermark fixes (see tests/test_all_cohort.py
for the planted-'ALL' sibling, which IS in the suite).

Too heavy for the per-commit suite (~15 min, 209 compares); run after
touching window frames, rank tie-breaks or pooled-cohort unions:

    python examples/hostile_ties_audit.py

Result of record (r08 continuation session 4, all 225 queries —
benford_first_digit_report registered after the snapshot, verified
individually against the same corpus): 0 fails, 0 errors.
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
TMP = "/tmp/hostile_ties"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_corpus() -> None:
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
  SELECT * FROM '{SRC}/documents.parquet'
  UNION ALL
  SELECT doc_id + 100000, text, lang, source, n_chars
  FROM '{SRC}/documents.parquet'
) TO '{TMP}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  SELECT * FROM '{SRC}/events.parquet'
  UNION ALL
  SELECT event_id + 1000000, ts, user_id, event_type, value, props
  FROM '{SRC}/events.parquet'
) TO '{TMP}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  SELECT * FROM '{SRC}/embeddings.parquet'
  UNION ALL
  SELECT vec_id + 100000, embedding, label FROM '{SRC}/embeddings.parquet'
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
    spark = get_spark(app_name="hostile-ties-audit", shuffle_partitions=8)
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
    raise SystemExit(1 if fails or errs else 0)


if __name__ == "__main__":
    main()
