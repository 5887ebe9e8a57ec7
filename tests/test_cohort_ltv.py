"""Cohort LTV: the curve must match a brute-force per-user replay, be
monotone within each cohort, and conserve total purchase revenue."""

from __future__ import annotations

from collections import defaultdict

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def report(spark):
    return REGISTRY["cohort_ltv_report"].spark_fn(spark, SF_SMOKE).collect()


@pytest.fixture(scope="module")
def brute(spark):
    from http_log_anonymizer_spark.sources.batch import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    first = {}
    for r in ev:
        if r.user_id not in first or r.ts < first[r.user_id]:
            first[r.user_id] = r.ts
    cohort = {u: (t.year, t.month) for u, t in first.items()}
    size = defaultdict(int)
    for u in first:
        size[cohort[u]] += 1
    rev = defaultdict(int)  # (cohort, age) -> cents
    for r in ev:
        if r.event_type != "purchase":
            continue
        cy, cm = cohort[r.user_id]
        age = (r.ts.year * 12 + r.ts.month) - (cy * 12 + cm)
        rev[(cohort[r.user_id], age)] += round(r.value * 100)
    return size, rev


def test_matches_bruteforce(report, brute):
    size, rev = brute
    got = {}
    for r in report:
        y, m = map(int, r.cohort_month.split("-")[:2])
        got[((y, m), r.age_months)] = r
    assert set(got) == set(rev)
    for key, r in got.items():
        ck, age = key
        assert r.revenue_cents == rev[key]
        assert r.cohort_size == size[ck]
        cum = sum(v for (c2, a2), v in rev.items() if c2 == ck and a2 <= age)
        assert r.cum_revenue_cents == cum
        assert r.ltv_per_user_milli == cum * 1000 // size[ck]


def test_monotone_within_cohort_and_conservation(report):
    by_cohort = defaultdict(list)
    for r in report:
        by_cohort[r.cohort_month].append(r)
    total = 0
    for rows in by_cohort.values():
        rows.sort(key=lambda r: r.age_months)
        cums = [r.cum_revenue_cents for r in rows]
        assert cums == sorted(cums)
        assert cums[-1] == sum(r.revenue_cents for r in rows)
        total += cums[-1]
    assert total == sum(r.revenue_cents for r in report)
