"""bitext_margin_mining: a planted parallel pair (identical embedding
on both sides of the language split) must be mined rank-1 with a margin
that dominates the noise pairs, and the oracle must agree on the
planted corpus."""

from __future__ import annotations

import random

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare

_DIM = 64


def _vec(rng):
    return [rng.uniform(-1.0, 1.0) for _ in range(_DIM)]


def test_planted_parallel_pair_is_mined_first(spark, tmp_path):
    rng = random.Random(5)
    shared = _vec(rng)
    docs, embs = [], []
    # x side: doc 1 is the planted translation; 2-3 noise
    for i, lang in [(1, "fr"), (2, "de"), (3, "es")]:
        docs.append((i, f"doc {i}", lang))
        embs.append((i, shared if i == 1 else _vec(rng)))
    # y side: doc 10 is the pivot-language twin; 11-16 noise
    for i in range(10, 17):
        docs.append((i, f"doc {i}", "en"))
        embs.append((i, shared if i == 10 else _vec(rng)))

    spark.createDataFrame(docs, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    spark.createDataFrame(embs, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    q = REGISTRY["bitext_margin_mining"]
    rows = q.spark_fn(spark, str(tmp_path)).collect()
    assert rows[0].x_id == 1 and rows[0].y_id == 10
    assert rows[0].cos > 0.999
    assert rows[0].margin > rows[1].margin  # the pair stands out

    con = duckdb.connect()
    try:
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{tmp_path}/{t}.parquet/*.parquet'"
            )
        duck = con.execute(q.oracle).df()
    finally:
        con.close()
    ok, msg = compare(q.spark_fn(spark, str(tmp_path)), duck)
    assert ok, msg
