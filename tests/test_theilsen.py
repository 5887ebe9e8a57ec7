"""Theil-Sen trend: slope must match a brute-force pairwise-median
replay; a planted outlier day must move OLS but leave Theil-Sen
untouched (the whole point of the estimator)."""

from __future__ import annotations

import datetime as dt

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from tests.test_changepoint import _write_orders

EPOCH = dt.date(1992, 1, 1)


def _trunc_div(a: int, b: int) -> int:
    return abs(a) // b * (1 if a >= 0 else -1)


def _brute(series):
    """series: [(date, daily_cents)] -> (n_pairs, theil_sen_milli)."""
    pts = [((d - EPOCH).days, y) for d, y in series]
    slopes = sorted(
        _trunc_div((yb - ya) * 1000, xb - xa)
        for i, (xa, ya) in enumerate(pts)
        for xb, yb in pts[i + 1 :]
    )
    return len(slopes), slopes[(len(slopes) - 1) // 2]


def test_matches_bruteforce(spark):
    from collections import defaultdict

    from http_log_anonymizer_spark.sources.batch import load_table

    daily = defaultdict(int)
    for r in load_table(spark, SF_SMOKE, "orders").collect():
        d = r.o_orderdate
        if isinstance(d, dt.datetime):
            d = d.date()
        daily[d] += round(r.o_totalprice * 100)
    n_pairs, ts = _brute(sorted(daily.items()))
    row = REGISTRY["theilsen_trend_report"].spark_fn(spark, SF_SMOKE).collect()[0]
    assert (row.n_pairs, row.theil_sen_milli) == (n_pairs, ts)


def test_outlier_moves_ols_not_theilsen(spark, tmp_path):
    d0 = dt.date(2024, 1, 1)
    # clean +$1/day trend over 21 days
    clean = [
        (d0 + dt.timedelta(days=i), [100.0 + i]) for i in range(21)
    ]
    sf = _write_orders(spark, tmp_path / "clean", clean)
    base = REGISTRY["theilsen_trend_report"].spark_fn(spark, sf).collect()[0]
    assert base.theil_sen_milli == 100_000  # 100 cents/day in milli
    assert abs(base.ols_milli - 100_000) <= 1

    # one 50x flash-sale day at the END (an outlier at the series
    # midpoint would leave the OLS slope unchanged by symmetry)
    spiked = [
        (d, [v[0] * (50 if i == 20 else 1)]) for i, (d, v) in enumerate(clean)
    ]
    sf2 = _write_orders(spark, tmp_path / "spiked", spiked)
    hit = REGISTRY["theilsen_trend_report"].spark_fn(spark, sf2).collect()[0]
    assert hit.theil_sen_milli == base.theil_sen_milli  # robust: unmoved
    assert abs(hit.ols_milli - base.ols_milli) > 50_000  # OLS dragged
