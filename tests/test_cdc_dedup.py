"""cdc_dedup_report: content-defined boundaries must be SHIFT-ROBUST —
a junk prefix realigns nothing for the fixed-grid line dedup but leaves
CDC chunks aligned after the first content boundary. Also pins chunk
accounting (chunks partition every doc exactly) and oracle agreement on
the planted corpus."""

from __future__ import annotations

import duckdb
import random

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _corpus(spark, tmp_path, docs):
    spark.createDataFrame(docs, "doc_id long, text string, source string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_cdc_is_shift_robust_where_fixed_grid_is_not(spark, tmp_path):
    rng = random.Random(77)
    shared = " ".join(f"w{rng.randrange(10_000)}" for _ in range(120))
    docs = [
        (1, shared, "s"),
        (2, "junk1 junk2 junk3 " + shared, "s"),  # 3-token shift
    ]
    sf = _corpus(spark, tmp_path, docs)

    cdc = REGISTRY["cdc_dedup_report"].spark_fn(spark, sf).collect()[0]
    line = REGISTRY["line_dedup_report"].spark_fn(spark, sf).collect()[0]

    # the fixed 10-token grid finds NOTHING: every chunk of doc 2 is
    # offset by 3 tokens, so no chunk text repeats
    assert line.n_removed_tokens == 0

    # CDC boundaries are content-determined: everything in doc 2 after
    # the first in-shared boundary dedups against doc 1
    assert cdc.n_removed_tokens > 60  # > half the shared span

    # chunks PARTITION each doc: token accounting is exact
    assert cdc.n_tokens == 120 + 123
    assert line.n_tokens == 120 + 123

    # shared-flaw guard: the oracle agrees on the planted corpus
    q = REGISTRY["cdc_dedup_report"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        duck = con.execute(q.oracle).df()
    finally:
        con.close()
    ok, msg = compare(q.spark_fn(spark, sf), duck)
    assert ok, msg


def test_short_docs_form_one_chunk(spark, tmp_path):
    # below the rolling window there are no shingles, hence no interior
    # boundaries: the whole doc is one chunk in both engines
    sf = _corpus(
        spark,
        tmp_path,
        [(1, "a b", "s"), (2, "a b", "s"), (3, "x", "s")],
    )
    row = REGISTRY["cdc_dedup_report"].spark_fn(spark, sf).collect()[0]
    assert row.n_chunks == 3
    assert row.n_tokens == 5
    # doc 2 is an exact duplicate chunk of doc 1 -> removed
    assert row.n_removed_chunks == 1 and row.n_removed_tokens == 2


def test_chunking_matches_python_reference_on_random_corpus(spark, tmp_path):
    """Randomized (fixed seed) agreement with a plain-Python CDC
    reference — an independent third implementation of the boundary
    rule. n_tokens equality proves the chunks PARTITION every document
    (nothing dropped, nothing double-counted); n_chunks equality proves
    boundary-for-boundary agreement."""
    import hashlib

    rng = random.Random(123)
    docs = []
    for i in range(200):
        n = rng.choice([0, 1, 2, 3, 5, 8, 15, 40, 80])
        docs.append(
            (i, " ".join(f"t{rng.randrange(50)}" for _ in range(n)), "s")
        )

    def _h64(s: str) -> int:
        return int(hashlib.md5(f"cdc|{s}".encode()).hexdigest()[:15], 16)

    exp_chunks = exp_tokens = 0
    for _i, text, _s in docs:
        toks = text.split(" ")  # '' -> [''] like both engines
        n = len(toks)
        k = 3
        hs = (
            [_h64(" ".join(toks[p - 1 : p - 1 + k])) for p in range(1, n - k + 2)]
            if n >= k
            else []
        )
        bounds = (
            [1]
            + [p for p in range(2, len(hs) + 1) if hs[p - 1] % 8 == 0]
            + [n + 1]
        )
        exp_chunks += len(bounds) - 1
        exp_tokens += n

    sf = _corpus(spark, tmp_path, docs)
    row = REGISTRY["cdc_dedup_report"].spark_fn(spark, sf).collect()[0]
    assert row.n_chunks == exp_chunks
    assert row.n_tokens == exp_tokens
