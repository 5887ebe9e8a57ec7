"""Retrieval evaluation: metrics must match a brute-force replay that
re-derives relevance and re-scores the ranking the registry's own
bm25_query_table reports; the pooled row must be reproducible from the
member rows; all metrics bounded in [0, 1e6]."""

from __future__ import annotations

from collections import defaultdict

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.plans.text import _EVAL_IDCG, _EVAL_W
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def report(spark):
    return REGISTRY["retrieval_eval_report"].spark_fn(spark, SF_SMOKE).collect()


@pytest.fixture(scope="module")
def ground_truth(spark):
    """query_id -> (relevant doc set, ranked top-k list) by brute force."""
    from http_log_anonymizer_spark.sources.batch import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    term_sets = {d: set(t) for d, t in toks.items()}
    qt = defaultdict(set)
    for d, t in toks.items():
        if d % 100 == 0:
            tf: dict[str, int] = {}
            for w in t:
                tf[w] = tf.get(w, 0) + 1
            top = sorted(tf, key=lambda w: (-tf[w], w))[:5]
            qt[d] = set(top)
    rel = {
        q: {d for d, ts in term_sets.items() if d != q and terms <= ts}
        for q, terms in qt.items()
    }
    ranked = defaultdict(list)
    for r in REGISTRY["bm25_query_table"].spark_fn(spark, SF_SMOKE).collect():
        ranked[r.query_id].append((r.rank, r.doc_id))
    return rel, ranked


def test_metrics_match_bruteforce(report, ground_truth):
    rel, ranked = ground_truth
    per = {r.query_id: r for r in report if r.query_id != -1}
    want_ids = {q for q, s in rel.items() if s}
    assert set(per) == want_ids and per, "evaluable query set mismatch"
    for q, row in per.items():
        hits = [(rk, d) for rk, d in sorted(ranked[q]) if d in rel[q]]
        assert row.n_relevant == len(rel[q])
        assert row.hits_at_k == len(hits)
        assert row.recall_ppm == len(hits) * 10**6 // len(rel[q])
        assert row.mrr_ppm == (10**6 // hits[0][0] if hits else 0)
        dcg = sum(_EVAL_W[rk - 1] for rk, _ in hits)
        idcg = _EVAL_IDCG[min(len(rel[q]), 10) - 1]
        assert row.ndcg_ppm == dcg * 10**6 // idcg


def test_pooled_row_matches_members(report):
    pooled = next(r for r in report if r.query_id == -1)
    per = [r for r in report if r.query_id != -1]
    assert pooled.n_relevant == sum(r.n_relevant for r in per)
    assert pooled.hits_at_k == sum(r.hits_at_k for r in per)
    assert pooled.recall_ppm == pooled.hits_at_k * 10**6 // pooled.n_relevant
    assert pooled.mrr_ppm == sum(r.mrr_ppm for r in per) // len(per)
    assert pooled.ndcg_ppm == sum(r.ndcg_ppm for r in per) // len(per)


def test_metric_bounds(report):
    for r in report:
        assert 0 <= r.recall_ppm <= 10**6
        assert 0 <= r.mrr_ppm <= 10**6
        assert 0 <= r.ndcg_ppm <= 10**6
        if r.query_id != -1:  # the pooled row sums hits across queries
            assert r.hits_at_k <= 10
