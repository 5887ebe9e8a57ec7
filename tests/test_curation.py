"""Targeted tests for the corpus-curation family (plans/curation.py)
beyond the registry-wide oracle gate: semantic invariants (unit norm,
accounting conservation, reason precedence) and the plan-shape
properties that make the family scale (map-only feature computation,
single fingerprint shuffle in the composition report)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from tests.conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_hashed_embeddings_unit_norm_and_deterministic(spark):
    df = REGISTRY["embed_hashing_trick"].spark_fn(spark, SF_ORACLE)
    dims = [f"e{j:02d}" for j in range(16)]
    rows = df.limit(50).collect()
    assert rows, "no embeddings produced"
    for r in rows:
        nrm = math.sqrt(sum(r[d] ** 2 for d in dims))
        # rounded to 4 dp per component -> norm within rounding slack
        assert abs(nrm - 1.0) < 0.01, f"doc {r['doc_id']}: norm {nrm}"
    again = REGISTRY["embed_hashing_trick"].spark_fn(spark, SF_ORACLE).limit(50).collect()
    assert rows == again


def test_quality_classifier_discriminates(spark):
    """The 0.5 threshold must actually split the corpus — an always-keep
    or always-drop calibration would leave the filter path vacuous."""
    df = REGISTRY["quality_classifier"].spark_fn(spark, SF_ORACLE)
    tot = df.agg(F.sum("n_docs").alias("n"), F.sum("n_keep").alias("k")).first()
    assert 0 < tot["k"] < tot["n"]


def test_corpus_report_conserves_documents_and_tokens(spark):
    """Every document lands in exactly one reason bucket: the report's
    doc and token totals must equal the corpus totals."""
    rep = REGISTRY["llm_corpus_report"].spark_fn(spark, SF_ORACLE)
    got = rep.agg(F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")).first()
    d = load_table(spark, SF_ORACLE, "documents")
    want = d.agg(
        F.count("*").alias("d"),
        F.sum(F.size(F.split("text", " "))).alias("t"),
    ).first()
    assert got["d"] == want["d"] and got["t"] == want["t"]


def test_corpus_report_lang_precedence(spark):
    """A doc outside the language allowlist must be counted under
    'lang' (never 'quality'), regardless of its quality score — i.e.
    no reason bucket for a disallowed lang except exact_dup/lang."""
    rep = REGISTRY["llm_corpus_report"].spark_fn(spark, SF_ORACLE)
    d = load_table(spark, SF_ORACLE, "documents")
    disallowed = (
        d.filter(~F.col("lang").isin("en", "de", "fr")).count()
    )
    lang_bucket = (
        rep.filter(F.col("reason") == "lang").agg(F.sum("n_docs")).first()[0] or 0
    )
    # every disallowed doc is either a dup (earlier reason) or 'lang'
    assert lang_bucket <= disallowed
    kept_or_quality_langs = (
        REGISTRY["llm_corpus_report"].spark_fn(spark, SF_ORACLE)
        .filter(F.col("reason").isin("kept", "quality"))
        .count()
    )
    assert kept_or_quality_langs > 0  # allowed langs do flow through


def test_feature_queries_are_map_only_jvm(spark):
    """Per-doc features must be pure Catalyst projections: no Python
    eval in the plan, and no exchange except the final tiny groupBy."""
    for name in (
        "bpe_pretokenize_stats",
        "quality_classifier",
        "blocklist_hit_report",
        "embed_hashing_trick",
    ):
        plan = _plan(spark, name)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_embed_hashing_trick_has_no_aggregate_exchange(spark):
    """The embedding generator is row-local: any HashAggregate in its
    plan would mean a per-token or per-bucket shuffle crept in."""
    plan = _plan(spark, "embed_hashing_trick")
    assert "HashAggregate" not in plan


def test_corpus_report_single_data_shuffle(spark):
    """The composition report pays exactly one data-sized exchange (the
    dedup fingerprint window); the groupBy on (source, reason) rides on
    tiny cardinality. Guard: at most 2 hash exchanges total, and the
    window partitions on fp."""
    plan = _plan(spark, "llm_corpus_report")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan
    assert "hashpartitioning(fp" in plan


def test_pack_sequences_conserves_and_bins_contiguously(spark):
    """Packing must conserve the subword total and produce contiguous
    bin ids 0..max per source (a gap would mean an empty batch)."""
    rep = REGISTRY["pack_sequences"].spark_fn(spark, SF_ORACLE)
    rows = rep.collect()
    per_src: dict[str, list[int]] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["bin_id"])
        assert r["n_docs"] > 0 and r["bin_subwords"] > 0
    for src, bins in per_src.items():
        assert sorted(bins) == list(range(len(bins))), src
    total = sum(r["bin_subwords"] for r in rows)
    d = load_table(spark, SF_ORACLE, "documents")
    from http_log_anonymizer_spark.plans.curation import _subword_count

    want = d.select(_subword_count().alias("n")).agg(F.sum("n")).first()[0]
    assert total == want


def test_apply_mix_sampling_weight_semantics(spark):
    """Downsample-only mix: weights <= 1, the dominant language is
    downsampled, and a weight-1.0 language keeps every document (the
    hash gate is vacuous at weight 1)."""
    rep = REGISTRY["apply_mix_sampling"].spark_fn(spark, SF_ORACLE).collect()
    assert all(r["weight"] <= 1.0 for r in rep)
    assert any(r["weight"] < 1.0 for r in rep)  # dominant lang capped
    for r in rep:
        assert r["docs_kept"] <= r["n_docs"]
        if r["weight"] == 1.0:
            assert r["docs_kept"] == r["n_docs"]
    # the gate thins: at least one capped lang actually dropped docs
    assert any(r["docs_kept"] < r["n_docs"] for r in rep if r["weight"] < 1.0)
