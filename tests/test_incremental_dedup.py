"""Incremental MinHash index maintenance: appending a document batch
must not require recomputing the whole index — new signatures probe the
existing band index, plus new-vs-new pairs; the merged result equals a
full recompute over the union.

At 100 TB this is the difference between a nightly full dedup scan and
an append-only pipeline: the persisted band index grows by the new
batch only, and candidate generation touches old documents solely via
index probes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans.dedup import (
    _hashed_shingle_arrays,
    _shingle_arrays,
    band_candidates,
    band_index,
    minhash_signatures,
    verify_pairs,
)
from tests.conftest import SF_ORACLE


def _cand_from(bands_a, bands_b):
    """Candidates between two band indexes (da < db)."""
    return band_candidates(bands_a, bands_b)


def test_incremental_index_equals_full_recompute(spark):
    docs = _hashed_shingle_arrays(spark, SF_ORACLE).cache()
    docs.count()
    base = docs.filter(F.col("doc_id") % 5 != 0)  # the existing corpus
    new = docs.filter(F.col("doc_id") % 5 == 0)  # the appended batch

    # persisted index for the base corpus (built once, reused)
    base_bands = band_index(minhash_signatures(base)).cache()
    base_bands.count()
    base_pairs = verify_pairs(_cand_from(base_bands, base_bands), docs)

    # append: only the new batch's signatures are computed
    new_bands = band_index(minhash_signatures(new)).cache()
    new_bands.count()
    cross = _cand_from(base_bands, new_bands).unionAll(
        _cand_from(new_bands, base_bands)
    )
    intra = _cand_from(new_bands, new_bands)
    inc_pairs = base_pairs.unionAll(verify_pairs(cross.unionAll(intra).distinct(), docs))

    # ground truth: full recompute over the union
    full_bands = band_index(minhash_signatures(docs))
    full_pairs = verify_pairs(_cand_from(full_bands, full_bands), docs)

    key = lambda r: (r.doc_a, r.doc_b, round(r.jr, 6))
    got = sorted(map(key, inc_pairs.distinct().collect()))
    want = sorted(map(key, full_pairs.collect()))
    assert got == want and len(want) > 0


def test_incremental_winnow_index_equals_full_recompute(spark):
    """Same append-only contract for the winnowing index: fingerprints
    are a pure per-document function, so appending a batch adds index
    rows without touching existing ones, and (base pairs) + (probe of
    the persisted base index by the new batch) + (new-vs-new) must
    equal a full recompute over the union."""
    from http_log_anonymizer_spark.plans.dedup import (
        winnow_candidates,
        winnow_fingerprints,
    )
    from http_log_anonymizer_spark.functions.text import tokens_ws

    docs = _shingle_arrays(spark, SF_ORACLE).cache()
    docs.count()
    toks = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", tokens_ws("text").alias("toks"))
        .cache()
    )
    base_t = toks.filter(F.col("doc_id") % 5 != 0)
    new_t = toks.filter(F.col("doc_id") % 5 == 0)

    base_fps = winnow_fingerprints(base_t).cache()
    base_fps.count()  # the persisted index
    new_fps = winnow_fingerprints(new_t).cache()
    new_fps.count()  # only the appended batch is fingerprinted

    base_pairs = verify_pairs(winnow_candidates(base_fps, base_fps), docs)
    cross = winnow_candidates(base_fps, new_fps).unionAll(
        winnow_candidates(new_fps, base_fps)
    )
    intra = winnow_candidates(new_fps, new_fps)
    inc_pairs = base_pairs.unionAll(
        verify_pairs(cross.unionAll(intra).distinct(), docs)
    )

    full_fps = winnow_fingerprints(toks)
    full_pairs = verify_pairs(winnow_candidates(full_fps, full_fps), docs)

    key = lambda r: (r.doc_a, r.doc_b, round(r.jr, 6))
    got = sorted(map(key, inc_pairs.distinct().collect()))
    want = sorted(map(key, full_pairs.collect()))
    assert got == want and len(want) > 0
