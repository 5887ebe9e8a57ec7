"""Planted semantics for embedding_spectrum_report: a decaying-spectrum
corpus concentrates cumulative energy in the prefix dims, a constant
corpus has zero variance everywhere, and parity holds on the planted
table (the MRL/OPQ decision diagnostic, VERDICT r07 item 9)."""

from __future__ import annotations

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _write(spark, tmp_path, rows, dim=8):
    spark.createDataFrame(
        [(i, [float(v) for v in e], 0) for i, e in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["embedding_spectrum_report"]
    got = {r.dim: r for r in q.spark_fn(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{tmp_path}/embeddings.parquet/*.parquet'"
        )
        ok, msg = compare(q.spark_fn(spark, str(tmp_path)), con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return got


def test_decaying_spectrum_concentrates_prefix_energy(spark, tmp_path):
    # dim k alternates +/- 2^-k: var(dim k) = 4^-k exactly, energy
    # concentrates geometrically in the prefix
    rows = [[((-1) ** i) * 2.0 ** (-k) for k in range(8)] for i in range(40)]
    _write(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    assert got[0].var == 1.0 and got[1].var == 0.25
    # prefix of 2 dims already holds 1.25/sum(4^-k) ~ 93.7% of energy
    assert got[1].cum_energy_share > 0.9
    assert got[7].cum_energy_share == 1.0
    assert got[0].subspace == 0 and got[7].subspace == 0


def test_constant_corpus_has_zero_variance(spark, tmp_path):
    rows = [[1.5] * 8 for _ in range(10)]
    _write(spark, tmp_path, rows)
    q = REGISTRY["embedding_spectrum_report"]
    out = q.spark_fn(spark, str(tmp_path)).collect()
    assert all(r.var == 0.0 for r in out)
    # zero total energy: the share is NULL (0/0 guarded by the engine
    # returning NULL on 0-denominator double division), never a crash
    assert all(r.cum_energy_share is None for r in out)
