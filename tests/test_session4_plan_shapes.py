"""Physical-plan pins for the session-4 queries: the properties their
100x stories depend on — the record-linkage candidate join must stay a
block-key EQUI-join (never a cartesian/NLJ pair enumeration), the
mixing audit's window must partition by shard (never a single-task
global window), the silhouette distances must be a pure expression
over literal centroids (no join for the k x d side), and no Python
eval anywhere."""

from __future__ import annotations

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_ORACLE

_NEW = [
    "record_linkage_em",
    "shuffle_mixing_report",
    "kmeans_silhouette_report",
    "pii_source_summary",  # refactored into the monitor's shared halves
    "sequential_patterns",
    "textrank_keywords",
    "hits_copurchase",
    "benford_first_digit_report",
    "decontaminate_docs",  # refactored into the monitor's shared halves
]


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", _NEW)
def test_no_cartesian_and_no_python(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_linkage_candidates_come_from_a_block_equi_join(spark):
    # the pair universe must be keyed on the block id (hash or merge
    # join on `div 50` both sides) — a nested-loop pair enumeration
    # would be the quadratic trap the blocking pass exists to avoid
    plan = _plan(spark, "record_linkage_em")
    assert "div 50" in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)
    # BNLJ may appear only for the final-output 1-row constant, never
    # for building candidates: the classify step here is literal
    # parameters, so no BNLJ at all is expected
    assert "BroadcastNestedLoopJoin" not in plan


def test_mixing_window_partitions_by_shard(spark):
    # the lead() window must carry a partition spec — an empty
    # partitionBy would serialize the whole corpus through one task
    plan = _plan(spark, "shuffle_mixing_report")
    assert "windowspecdefinition(shard" in plan
    assert "windowspecdefinition(skey" not in plan  # order cols only follow shard


def test_silhouette_centroids_are_literals_not_a_join(spark):
    # distances to the k centroids are a codegen expression over
    # literal arrays; the only join is vec_id->cluster assignment
    plan = _plan(spark, "kmeans_silhouette_report")
    assert "CartesianProduct" not in plan
    assert plan.count("Join") <= 2  # qv<->assignment (+AQE reuse), nothing else
