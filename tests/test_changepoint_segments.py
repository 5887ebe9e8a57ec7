"""Hierarchical segmentation: planted three-regime data must come back
as exactly the right segments; boundaries must tile the calendar;
segment means must be consistent with the parent query's split."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from tests.test_changepoint import _write_orders


def test_three_regimes_recovered(spark, tmp_path):
    d0 = dt.date(2024, 1, 1)
    series = []
    for i in range(30):
        base = 100.0 if i < 10 else (500.0 if i < 20 else 900.0)
        series.append((d0 + dt.timedelta(days=i), [base, base]))
    sf = _write_orders(spark, tmp_path, series)
    segs = REGISTRY["changepoint_segments"].spark_fn(spark, sf).collect()
    # depth 2 always splits both sides; the three true regimes force
    # boundaries at days 9 and 19, the fourth split lands inside one
    # regime (zero-gain split, earliest-date tie-break)
    bounds = {s.end_date for s in segs}
    assert str(d0 + dt.timedelta(days=9)) in bounds
    assert str(d0 + dt.timedelta(days=19)) in bounds
    means = sorted({s.mean_cents for s in segs})
    assert set(means) <= {10000, 50000, 90000}
    assert len(segs) == 4


def test_segments_tile_the_calendar(spark):
    segs = REGISTRY["changepoint_segments"].spark_fn(spark, SF_SMOKE).collect()
    assert [s.segment_id for s in segs] == list(range(1, len(segs) + 1))
    for a, b in zip(segs, segs[1:]):
        assert a.end_date < b.start_date
    # total order count equals the corpus's
    from http_log_anonymizer_spark.sources.batch import load_table

    n = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(s.n_orders for s in segs) == n


def test_root_split_matches_parent_query(spark):
    segs = REGISTRY["changepoint_segments"].spark_fn(spark, SF_SMOKE).collect()
    top = REGISTRY["changepoint_revenue"].spark_fn(spark, SF_SMOKE).collect()[0]
    assert any(s.end_date == str(top.split_date) for s in segs)
