"""line_dedup_report: the C4 keep-first removal policy on a planted
corpus, including the partial tail chunk and oracle agreement (the
parity suite only proves both engines match on the synthetic corpus;
this pins that what they agree ON is the intended policy)."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

A = " ".join(f"a{i}" for i in range(10))  # the repeated "line"
B = " ".join(f"b{i}" for i in range(10))
C = " ".join(f"c{i}" for i in range(10))
TAIL = " ".join(f"t{i}" for i in range(15))  # 10-chunk + 5-token tail


def test_keep_first_occurrence_policy(spark, tmp_path):
    docs = [
        (1, f"{A} {B}", "s"),   # first occurrence of A -> kept
        (2, f"{A} {C}", "s"),   # second A -> removed
        (3, f"{A} {A}", "s"),   # third + fourth A -> both removed
        (4, TAIL, "s"),         # unique; exercises the short tail chunk
    ]
    spark.createDataFrame(docs, "doc_id long, text string, source string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    q = REGISTRY["line_dedup_report"]
    row = q.spark_fn(spark, str(tmp_path)).collect()[0]
    assert row.source == "s"
    assert row.n_docs == 4
    assert row.n_chunks == 8  # 2+2+2+2 (doc 4: one full + one 5-token tail)
    assert row.n_tokens == 75
    assert row.n_removed_chunks == 3  # doc2's A, doc3's two A's
    assert row.n_removed_tokens == 30
    assert abs(row.removed_token_frac - 0.4) < 1e-9

    # shared-flaw guard: the oracle must agree on the planted corpus
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        duck = con.execute(q.oracle).df()
    finally:
        con.close()
    ok, msg = compare(q.spark_fn(spark, str(tmp_path)), duck)
    assert ok, msg
