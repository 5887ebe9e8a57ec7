"""Association rules: both directions of a rule must carry the right
conditional probabilities, and all stats must match a brute-force
basket replay on the small corpus."""

from __future__ import annotations

from collections import defaultdict

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def rules(spark):
    return REGISTRY["association_rules_report"].spark_fn(spark, SF_SMOKE).collect()


@pytest.fixture(scope="module")
def baskets(spark):
    from http_log_anonymizer_spark.sources.batch import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by = defaultdict(set)
    for r in li:
        by[r.l_orderkey].add(r.l_partkey)
    return list(by.values())


def test_stats_match_bruteforce(rules, baskets):
    assert rules, "no rules at sf0.001"
    n = len(baskets)
    for r in rules:
        s_ante = sum(1 for b in baskets if r.antecedent in b)
        s_cons = sum(1 for b in baskets if r.consequent in b)
        s_both = sum(1 for b in baskets if r.antecedent in b and r.consequent in b)
        assert (r.support_ante, r.support_cons, r.support_both) == (
            s_ante,
            s_cons,
            s_both,
        )
        assert abs(r.confidence - round(s_both / s_ante, 6)) <= 1e-9
        assert abs(r.lift - round(s_both * n / (s_ante * s_cons), 6)) <= 1e-9


def test_rules_sorted_by_lift(rules):
    lifts = [r.lift for r in rules]
    assert lifts == sorted(lifts, reverse=True)


def test_lift_symmetric_within_pair(rules):
    by_pair = {}
    for r in rules:
        key = tuple(sorted((r.antecedent, r.consequent)))
        by_pair.setdefault(key, []).append(r.lift)
    for lifts in by_pair.values():
        assert len(set(lifts)) == 1
