"""Suffix-array exact-substring dedup (operators/suffix_array.py +
plans/dedup.py:suffix_array_dup_report): construction invariants on a
hand-checkable corpus, and the equivalence contract with the fixed-K
window approximation (dup_span_report)."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.operators.suffix_array import (
    adjacent_lcp,
    build_rank_tables,
    cumsum_by_range,
    ranked,
    suffix_order,
)

SF = "/root/testdata/sf0.001"


def _tiny_corpus(spark):
    # "a b c a b" + sentinel — small enough to verify by hand
    toks = ["a", "b", "c", "a", "b", "\x00x"]
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(toks)], "gpos long, tok string"
    )


def test_ranked_is_dense_rank(spark):
    df = spark.createDataFrame([(x,) for x in [3, 1, 3, 7, 1]], "v long")
    got = {r.v: r.r for r in ranked(df, ["v"]).collect()}
    assert got == {1: 1, 3: 2, 7: 3}


def test_cumsum_by_range_matches_sequential(spark):
    rows = [(i, i % 3) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.cum for r in cumsum_by_range(df, "k", "v").collect()}
    acc, want = 0, {}
    for k, v in rows:
        acc += v
        want[k] = acc
    assert got == want


def test_suffix_order_and_lcp_on_tiny_corpus(spark):
    """Reference check: suffixes of 'a b c a b $' sorted, with the
    known adjacent LCPs ($ sorts first; 'a b c...' vs 'a b $' share 2
    tokens; 'b c a b $' vs 'b $' share 1)."""
    tokens = _tiny_corpus(spark)
    tables = build_rank_tables(tokens, 3)  # 2^3 = 8 >= corpus length
    sa = suffix_order(tables[-1])
    order = [
        r.gpos for r in sa.orderBy("sa_idx").collect()
    ]
    # suffixes: 1:'a b c a b $' 2:'b c a b $' 3:'c a b $' 4:'a b $'
    #           5:'b $'         6:'$'
    assert order == [6, 4, 1, 5, 2, 3]
    al = {r.sa_idx: r.lcp for r in adjacent_lcp(sa, tables).collect()}
    # $ | a b $ (0) | a b c.. (2) | b $ (0) | b c .. (1) | c .. (0)
    assert al == {1: 0, 2: 0, 3: 2, 4: 0, 5: 1, 6: 0}


def test_report_equals_fixed_k_approximation(spark):
    """The directive's equivalence bar (VERDICT r04 item 9): at the
    same threshold, maximal-span coverage from the suffix array must
    union to EXACTLY the windows the hash-based approximation marks —
    per doc: same n_dup_tokens, same islands, same fraction. (The SA
    adds max_dup_span, which the window method cannot observe.)"""
    from http_log_anonymizer_spark.plans import REGISTRY

    sa = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.dup_frac, r.n_islands)
        for r in REGISTRY["suffix_array_dup_report"].spark_fn(spark, SF).collect()
    }
    ap = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.dup_frac, r.n_islands)
        for r in REGISTRY["dup_span_report"].spark_fn(spark, SF).collect()
    }
    assert sa == ap


def test_max_dup_span_bounds(spark):
    """max_dup_span sanity: zero iff no duplicated tokens; otherwise
    >= the threshold and <= the document's token count."""
    from http_log_anonymizer_spark.plans import REGISTRY
    from http_log_anonymizer_spark.plans.dedup import _SA_MINLEN

    rows = REGISTRY["suffix_array_dup_report"].spark_fn(spark, SF).collect()
    assert any(r.max_dup_span > 0 for r in rows)
    for r in rows:
        if r.n_dup_tokens == 0:
            assert r.max_dup_span == 0
        else:
            assert _SA_MINLEN <= r.max_dup_span <= r.n_tokens
            assert r.max_dup_span <= r.n_dup_tokens
