"""Alternate batch source formats: ORC and JSON-lines corpus copies.

The registry's queries all load through ``sources.batch.load_table``,
which resolves ``<sf_dir>/<table>.parquet`` first and falls back to
``<table>.orc``, ``<table>.csv``, then ``<table>.json`` — so ANY query runs unchanged over
a corpus exported in either format (tests/test_formats.py proves result
parity table-by-table and query-by-query). Parquet stays the format of
record: the DuckDB oracle, the ScaleGate row counts (footer metadata)
and the byte-based spread sizing all assume it, and at 100 TB columnar
+ predicate pushdown is the only sane scan. The exporters exist for the
boundary: upstream feeds that land ORC (Hive/Trino estates) or JSON
lines (API dumps, log shippers) can be queried directly or converted
once.

Fidelity notes:
- ORC is lossless for every type this corpus uses (longs, strings,
  timestamps, float arrays); Spark's ORC scan supports predicate
  pushdown and column pruning like parquet.
- JSON lines carries no schema, so ``export_corpus`` writes a
  ``<table>.json.schema`` sidecar (Spark's StructType JSON) and the
  loader applies it — without it, inference would widen ints, lose
  timestamp types and mis-type empty arrays. Binary columns would
  round-trip as base64 under an explicit BinaryType schema; this
  corpus stores none (media payloads are derived in-flight).
- CSV (the warehouse-export / log-shipper format) is FLAT: complex
  columns (the embeddings table's float array) are JSON-encoded into
  strings on export and rebuilt with from_json on read, driven by the
  same ``.schema`` sidecar — the encode/decode pair is exact for this
  corpus's types (floats serialize shortest-round-trip). Reads run
  with header + explicit flat schema (inference would widen ints and
  lose timestamps), quote-escaping on, and multiLine on so embedded
  newlines in text cannot shear rows. CSV has no NULL-vs-empty-string
  distinction for STRING columns; this corpus stores no empty strings,
  and non-string NULLs round-trip via the schema. Parquet remains the
  format of record (columnar scan, pushdown, footer row counts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from http_log_anonymizer_spark.sources.batch import TABLES, load_table

FORMATS = ("orc", "json", "csv")


def export_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    fmt: str = "orc",
    tables: list[str] | None = None,
) -> str:
    """Write every table of ``sf_dir`` to ``out_dir/<table>.<fmt>``.

    Tables are read through load_table so the export carries the
    NORMALIZED schema (session-TZ-pinned timestamps, never raw nanos) —
    an exported corpus answers queries identically to its source."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    for name in tables if tables is not None else TABLES:
        df = load_table(spark, sf_dir, name)
        path = os.path.join(out_dir, f"{name}.{fmt}")
        if fmt == "csv":
            out = df
            for field in df.schema.fields:
                if field.dataType.typeName() in ("array", "map", "struct"):
                    out = out.withColumn(field.name, F.to_json(F.col(field.name)))
            (out.write.mode("overwrite")
                .options(header=True, quote='"', escape='"')
                .csv(path))
            with open(path + ".schema", "w") as f:
                f.write(df.schema.json())  # ORIGINAL (pre-flatten) schema
            continue
        df.write.mode("overwrite").format(fmt).save(path)
        if fmt == "json":
            with open(path + ".schema", "w") as f:
                f.write(df.schema.json())
    return out_dir


def read_fallback(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame | None:
    """Resolve ``<sf_dir>/<name>.{orc,json}`` when no parquet exists —
    the load_table fallback. Returns None if neither format is
    present (the caller then raises parquet's own error)."""
    orc = os.path.join(sf_dir, f"{name}.orc")
    if os.path.exists(orc):
        return spark.read.orc(orc)
    csv = os.path.join(sf_dir, f"{name}.csv")
    if os.path.exists(csv):
        import json as _json

        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        from pyspark.sql.types import StringType, StructField

        with open(csv + ".schema") as f:  # written by export_corpus
            schema = StructType.fromJson(_json.loads(f.read()))
        flat = StructType(
            [
                field
                if field.dataType.typeName() not in ("array", "map", "struct")
                else StructField(field.name, StringType(), field.nullable)
                for field in schema.fields
            ]
        )
        df = (
            spark.read.options(
                header=True, quote='"', escape='"', multiLine=True
            )
            .schema(flat)
            .csv(csv)
        )
        for field in schema.fields:
            if field.dataType.typeName() in ("array", "map", "struct"):
                df = df.withColumn(
                    field.name, F.from_json(F.col(field.name), field.dataType)
                )
        return df
    js = os.path.join(sf_dir, f"{name}.json")
    if os.path.exists(js):
        from pyspark.sql.types import StructType

        sidecar = js + ".schema"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                schema = StructType.fromJson(__import__("json").loads(f.read()))
            return spark.read.schema(schema).json(js)
        return spark.read.json(js)
    return None
