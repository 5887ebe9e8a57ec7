"""storage_estimate_report (reference requirement README.md:64-66):
the planning grid's arithmetic must replay exactly in plain Python,
the schema must be float-free (capacity numbers are exact integers),
and the pinned compression permille must stay inside the band the
sorted-layout measurement actually produces."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.http_log import (
    _STORAGE_COMP_PERMILLE,
    _STORAGE_FIXED_BYTES,
    _STORAGE_RATES,
    _STORAGE_RETENTION_DAYS,
    http_log_view,
)
from http_log_anonymizer_spark.schema import SORT_KEY

SF = "/root/testdata/sf0.001"


def test_grid_arithmetic_replays_exactly(spark):
    rows = {
        (r.rate_per_s, r.retention_days): r
        for r in REGISTRY["storage_estimate_report"].spark_fn(spark, SF).collect()
    }
    assert len(rows) == len(_STORAGE_RATES) * len(_STORAGE_RETENTION_DAYS)
    # the measured base quantities, recomputed independently
    log = http_log_view(spark, SF)
    base = log.select(
        (
            F.lit(_STORAGE_FIXED_BYTES)
            + F.octet_length(F.regexp_replace("remote_addr", "[0-9]+$", "0"))
            + F.octet_length("url")
        ).alias("b")
    ).agg(F.sum("b").alias("L"), F.count("*").alias("n")).collect()[0]
    bpr_milli = (1000 * base.L) // base.n
    for rate in _STORAGE_RATES:
        for days in _STORAGE_RETENTION_DAYS:
            r = rows[(rate, days)]
            stored = rate * 86400 * days
            assert r.months_retained == (days + 29) // 30
            assert r.stored_rows == stored
            assert r.bytes_per_row_milli == bpr_milli
            assert r.est_logical_bytes == stored * bpr_milli // 1000
            disk = stored * bpr_milli * _STORAGE_COMP_PERMILLE // 1_000_000
            assert r.est_disk_bytes == disk
            assert r.est_disk_mib == disk // 1_048_576


def test_schema_is_float_free(spark):
    sdf = REGISTRY["storage_estimate_report"].spark_fn(spark, SF)
    assert all(f.dataType.simpleString() == "bigint" for f in sdf.schema.fields)


def test_pinned_compression_permille_matches_sorted_layout(spark, tmp_path):
    """Re-measure the MergeTree-analog layout (SORT_KEY-ordered
    columnar write) and assert the pinned planning constant stays in
    band. Band, not equality: the permille drifts a few points with
    corpus size (measured 360 at 10k rows -> 304 at 100k as
    dictionaries amortize); a pin outside [250, 400] means the layout
    or the corpus changed enough that the constant needs re-measuring."""
    anon = http_log_view(spark, "/root/testdata/sf0.01").withColumn(
        "remote_addr", F.regexp_replace("remote_addr", "[0-9]+$", "0")
    )
    logical = anon.select(
        (
            F.lit(_STORAGE_FIXED_BYTES)
            + F.octet_length("remote_addr")
            + F.octet_length("url")
        ).alias("b")
    ).agg(F.sum("b").alias("L")).collect()[0].L
    anon.orderBy(*SORT_KEY).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "t")
    )
    comp = 0
    for f in glob.glob(str(tmp_path / "t" / "*.parquet")):
        m = pq.ParquetFile(f).metadata
        comp += sum(
            m.row_group(i).column(j).total_compressed_size
            for i in range(m.num_row_groups)
            for j in range(m.num_columns)
        )
    measured = round(1000 * comp / logical)
    assert 250 <= _STORAGE_COMP_PERMILLE <= 400
    assert abs(measured - _STORAGE_COMP_PERMILLE) <= 100, measured


def test_pin_is_conservative_at_scale(spark, tmp_path):
    """r10 (VERDICT r09 item 5): the at-scale sorted layout must
    compress AT OR BELOW the pinned planning permille — the pin is a
    conservative upper envelope, so the grid can only over-provision.
    Measured r10: 10 permille at sf10, 6 at sf100 (closed-domain decay;
    see the constant's comment + SCALE.md). Runs only when the sf10
    series is on disk; a one-file sample (~1M rows) keeps it cheap."""
    import os

    d = "/root/repo/.benchdata/sf10"
    if not os.path.exists(os.path.join(d, "_DONE")):
        import pytest

        pytest.skip("sf10 series not generated")
    anon = (
        http_log_view(spark, d)
        .limit(1_000_000)
        .withColumn("remote_addr", F.regexp_replace("remote_addr", "[0-9]+$", "0"))
    )
    logical = anon.select(
        (
            F.lit(_STORAGE_FIXED_BYTES)
            + F.octet_length("remote_addr")
            + F.octet_length("url")
        ).alias("b")
    ).agg(F.sum("b").alias("L")).collect()[0].L
    anon.orderBy(*SORT_KEY).coalesce(4).write.mode("overwrite").parquet(
        str(tmp_path / "big")
    )
    comp = 0
    for f in glob.glob(str(tmp_path / "big" / "*.parquet")):
        m = pq.ParquetFile(f).metadata
        comp += sum(
            m.row_group(i).column(j).total_compressed_size
            for i in range(m.num_row_groups)
            for j in range(m.num_columns)
        )
    measured = round(1000 * comp / logical)
    assert measured <= _STORAGE_COMP_PERMILLE, measured
