"""Alternate source formats: a corpus exported as ORC or JSON lines
must answer registry queries IDENTICALLY to its parquet source —
load_table resolves the format transparently, so every query runs
unchanged. Representative queries cover timestamps (events windowing),
decimals/dates (lineitem), text arrays (documents), float arrays
(embeddings) and derived binary (multimodal)."""

from __future__ import annotations

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.sources.formats import export_corpus

SF = "/root/testdata/sf0.001"

_QUERIES = [
    "http_totals",  # events: timestamps, grouping
    "pricing_summary",  # lineitem: dates, decimals-as-doubles
    "gopher_quality_flags",  # documents: token arrays, folds
    "embed_hashing_trick",  # embeddings: array<float> bit-exactness
    "multimodal_payload_stats",  # derived binary payloads
    "sliding_window_traffic",  # window over timestamps
]


def _rows(spark, name, sf_dir):
    return [tuple(r) for r in REGISTRY[name].spark_fn(spark, sf_dir).collect()]


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_exported_corpus_answers_identically(spark, tmp_path, fmt):
    out = export_corpus(spark, SF, str(tmp_path / fmt), fmt=fmt)
    for name in _QUERIES:
        assert _rows(spark, name, out) == _rows(spark, name, SF), (fmt, name)


def test_exported_schema_round_trips(spark, tmp_path):
    out = export_corpus(
        spark, SF, str(tmp_path / "j"), fmt="json", tables=["events", "embeddings"]
    )
    for t in ("events", "embeddings"):
        src = load_table(spark, SF, t)
        back = load_table(spark, out, t)
        assert back.schema == src.schema, t


def test_csv_schema_and_arrays_round_trip(spark, tmp_path):
    """CSV is flat: the float-array embedding column must survive the
    JSON-encode/decode round trip bit-exactly (shortest-round-trip
    float serialization), and the sidecar-driven schema must match the
    source exactly — no inference widening."""
    out = export_corpus(spark, SF, str(tmp_path / "csv"), fmt="csv")
    for t in ("embeddings", "events", "documents"):
        src = load_table(spark, SF, t)
        rt = load_table(spark, out, t)
        assert rt.schema == src.schema, t
    src = load_table(spark, SF, "embeddings").orderBy("vec_id").collect()
    rt = load_table(spark, out, "embeddings").orderBy("vec_id").collect()
    assert len(src) == len(rt)
    for a, b in zip(src, rt):
        assert a.vec_id == b.vec_id
        assert list(a.embedding) == list(b.embedding)  # bit-exact floats


def test_parquet_still_wins_when_both_exist(spark, tmp_path):
    # a dir holding BOTH parquet and orc for a table must resolve to
    # parquet (the format of record for oracle/gates/spread sizing)
    import os
    import shutil

    d = tmp_path / "mixed"
    d.mkdir()
    src = f"{SF}/region.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, d / "region.parquet")
    else:
        shutil.copy(src, d / "region.parquet")
    export_corpus(spark, SF, str(d), fmt="orc", tables=["region"])
    df = load_table(spark, str(d), "region")
    assert [tuple(r) for r in df.orderBy("r_regionkey").collect()] == [
        tuple(r)
        for r in load_table(spark, SF, "region").orderBy("r_regionkey").collect()
    ]
