"""BPE merge learning: distributed learner vs pure-Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.operators.bpe import (
    _merge_adjacent,
    corpus_vocab,
    learn_bpe_merges,
)


def _ref_bpe(vocab: dict[str, int], k: int) -> list[tuple[int, str, str, int]]:
    """Reference BPE (Sennrich et al. 2016): greedy left-to-right merge
    application, ties broken by (count desc, pair lexicographic)."""
    syms = {w: list(w) for w in vocab}
    merges = []
    for step in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, c))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_merge_adjacent_is_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a"],), (["a", "b", "a", "a"],)], "sym: array<string>")
    got = [r[0] for r in df.select(_merge_adjacent(F.col("sym"), "a", "a")).collect()]
    assert got == [["aa", "a"], ["a", "b", "aa"]]


def test_char_split_has_no_empty_symbols(spark):
    v = corpus_vocab(spark.createDataFrame([("spark",), ("db",)], ["tok"]))
    syms = {r["word"]: r["sym"] for r in v.collect()}
    assert syms == {"spark": list("spark"), "db": list("db")}


def test_learner_matches_reference_on_documents(spark):
    from http_log_anonymizer_spark.functions.text import tokens_ws
    from http_log_anonymizer_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    toks = (
        load_table(spark, sf, "documents")
        .select(F.explode(tokens_ws("text")).alias("tok"))
    )
    vocab_rows = toks.groupBy("tok").count().collect()
    vocab = {r["tok"]: r["count"] for r in vocab_rows}
    want = _ref_bpe(vocab, 8)
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(corpus_vocab(toks), 8)
    ]
    assert got == want
    assert len(got) == 8


def test_registered_query_shape(spark):
    from http_log_anonymizer_spark.plans import REGISTRY

    out = REGISTRY["bpe_learn_merges"].spark_fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert [r["step"] for r in rows] == list(range(len(rows)))
    assert all(r["pair_count"] > 0 for r in rows)
    # learned merges must fuse real adjacent characters: applying the
    # first merge to the vocab must strictly reduce total symbol count
    assert len(rows) == 8
