"""Physical-plan pins for the session-3 queries: the properties their
100x stories depend on — no cartesian products, no Python eval in any
hot path, and rho's occurrence-stream join staying a merge join (the
type-table discipline: a post-agg size estimate must not bait the
static planner into broadcasting a corpus-proportional table)."""

from __future__ import annotations

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_ORACLE

_NEW = [
    "gopher_repetition_report",
    "soft_dedup_weights",
    "quality_filter_tradeoff",
    "rho_excess_loss_report",
    "epochs_per_source_report",
    "split_leakage_report",
]


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", _NEW)
def test_no_cartesian_and_no_python(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_rho_type_table_joins_are_merge(spark):
    # the excess TYPE table grows with the corpus (not the vocabulary);
    # its join onto the occurrence stream must never be a static
    # broadcast — shuffle_hash hints (r10-opt; previously merge) are
    # BINDING, so this pin holds against AQE
    plan = _plan(spark, "rho_excess_loss_report")
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 1
    assert "BroadcastHashJoin" not in plan


def test_epochs_totals_are_broadcast_onto_sources(spark):
    # the 1-row totals must broadcast; anything else would shuffle the
    # per-source table to join a single row
    plan = _plan(spark, "epochs_per_source_report")
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan
