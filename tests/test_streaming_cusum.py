"""Streaming CUSUM: fed the 80 monthly slices of the orders table, the
sink's final state must EQUAL the batch recursive-CTE query key for key
(both S and Smax); empty slices still decay; replay reconstructs."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.analytics import _CUSUM_T
from http_log_anonymizer_spark.streaming.cusum import StreamingCUSUMSink

SF = "/root/testdata/sf0.001"


def _orders_cents(spark):
    from http_log_anonymizer_spark.sources.batch import load_table

    return load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("key"),
        ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("value"),
    )


def _baseline(spark):
    return (
        _orders_cents(spark)
        .groupBy("key")
        .agg(F.expr(f"sum(value) DIV {_CUSUM_T}").alias("baseline"))
    )


def test_streaming_fold_equals_batch_recursion(spark, tmp_path):
    o = _orders_cents(spark).persist()
    sink = StreamingCUSUMSink(str(tmp_path / "state"), _baseline(spark))
    for t in range(1, _CUSUM_T + 1):
        sink.write(o.filter(F.col("t") == t).select("key", "value"), t)
    o.unpersist()

    got = {r.key: (r.s, r.s_max) for r in sink.state(spark).collect()}

    batch = REGISTRY["cusum_spend_monitor"].spark_fn(spark, SF).collect()
    assert len(batch) > 0
    for r in batch:  # top-25 by max — every one must match the stream
        assert got[r.custkey] == (r.final_cusum_cents, r.max_cusum_cents), r.custkey


def test_empty_slice_still_decays_and_replay_reconstructs(spark, tmp_path):
    baseline = spark.createDataFrame([(1, 10)], "key long, baseline long")
    sink = StreamingCUSUMSink(str(tmp_path / "state"), baseline)
    b = lambda rows: spark.createDataFrame(rows, "key long, value long")  # noqa: E731

    sink.write(b([(1, 100)]), 0)  # s = 90
    sink.write(b([]), 1)          # empty slice: s = 80 (decay still steps)
    st = {r.key: (r.s, r.s_max) for r in sink.state(spark).collect()}
    assert st[1] == (80, 90)

    # replaying slice 1 (same id) recomputes from the pre-batch state
    sink.write(b([]), 1)
    st = {r.key: (r.s, r.s_max) for r in sink.state(spark).collect()}
    assert st[1] == (80, 90)

    # clamp at zero
    for t in range(2, 12):
        sink.write(b([]), t)
    st = {r.key: (r.s, r.s_max) for r in sink.state(spark).collect()}
    assert st[1] == (0, 90)

    assert [r.key for r in sink.alarms(spark, 1).collect()] == []


def test_spark_recursive_cte_is_a_third_agreeing_formulation(spark):
    """The registered plan is the prefix-scan form and the DuckDB
    oracle the naive recursion; Spark 4.1's OWN recursive CTE
    (WITH RECURSIVE / UnionLoop) is the third formulation and must
    produce the identical result — this is where the new SQL surface
    is exercised."""
    from http_log_anonymizer_spark.plans.analytics import _cusum_sql
    from http_log_anonymizer_spark.sources.batch import load_table

    load_table(spark, SF, "orders").createOrReplaceTempView("orders_cusum_rc")
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(2**31 - 1))
    rec = spark.sql(_cusum_sql("DIV", table="orders_cusum_rc")).collect()
    win = REGISTRY["cusum_spend_monitor"].spark_fn(spark, SF).collect()
    assert [tuple(r) for r in rec] == [tuple(r) for r in win]
