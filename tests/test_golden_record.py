"""Golden-record survivorship: rules must hold against a brute-force
replay over the clusters that dedup_clusters reports, and the two
queries must agree on the cluster partition itself."""

from __future__ import annotations

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def golden(spark):
    return REGISTRY["golden_record_report"].spark_fn(spark, SF_SMOKE).collect()


@pytest.fixture(scope="module")
def members(spark):
    """cluster_id -> list of (doc_id, lang, source, n_chars), via the
    same component pipeline the queries share."""
    from http_log_anonymizer_spark.operators.components import connected_components
    from http_log_anonymizer_spark.plans.dedup import minhash_verified_pairs
    from http_log_anonymizer_spark.sources.batch import load_table

    comp = connected_components(
        minhash_verified_pairs(spark, SF_SMOKE), src="doc_a", dst="doc_b"
    )
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = comp.join(docs, comp.node == docs.doc_id).collect()
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r.cluster, []).append((r.doc_id, r.lang, r.source, r.n_chars))
    return out


def test_one_row_per_cluster_and_sizes(golden, members):
    assert {r.cluster_id for r in golden} == set(members)
    for r in golden:
        assert r.n_members == len(members[r.cluster_id])
        assert r.n_sources == len({m[2] for m in members[r.cluster_id]})


def test_completeness_rule(golden, members):
    for r in golden:
        want = min(members[r.cluster_id], key=lambda m: (-m[3], m[0]))
        assert (r.canonical_doc, r.canonical_chars) == (want[0], want[3])


def test_frequency_rule(golden, members):
    for r in golden:
        langs: dict[str, int] = {}
        for m in members[r.cluster_id]:
            langs[m[1]] = langs.get(m[1], 0) + 1
        want = min(langs, key=lambda lg: (-langs[lg], lg))
        assert r.lang_survived == want


def test_agrees_with_dedup_clusters_rollup(spark, golden):
    rollup = REGISTRY["dedup_clusters"].spark_fn(spark, SF_SMOKE).collect()
    assert {(r.cluster_id, r.n_docs) for r in rollup} == {
        (r.cluster_id, r.n_members) for r in golden
    }
