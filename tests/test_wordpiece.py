"""WordPiece merge learning: distributed learner vs pure-Python
reference, plus divergence-from-BPE evidence (likelihood != frequency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.operators.bpe import corpus_vocab, learn_bpe_merges
from http_log_anonymizer_spark.operators.wordpiece import (
    SCALE,
    learn_wordpiece_merges,
)

SF = "/root/testdata/sf0.001"


def _ref_wordpiece(vocab: dict[str, int], k: int) -> list[tuple[int, str, str, int, int]]:
    """Reference WordPiece trainer: integer-quantized likelihood argmax
    score = (c * SCALE) // (count(a) * count(b)), ties (score desc,
    pair lexicographic); greedy left-to-right merge application."""
    syms = {w: list(w) for w in vocab}
    merges = []
    for step in range(k):
        counts: dict[tuple[str, str], int] = {}
        singles: dict[str, int] = {}
        for w, f in vocab.items():
            s = syms[w]
            for x in s:
                singles[x] = singles.get(x, 0) + f
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        scored = {
            (a, b): (c * SCALE) // (singles[a] * singles[b])
            for (a, b), c in counts.items()
        }
        (a, b), sc = min(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, counts[(a, b)], sc))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def _corpus_tokens(spark):
    from http_log_anonymizer_spark.functions.text import tokens_ws
    from http_log_anonymizer_spark.sources.batch import load_table

    return load_table(spark, SF, "documents").select(
        F.explode(tokens_ws("text")).alias("tok")
    )


def test_learner_matches_reference_on_documents(spark):
    toks = _corpus_tokens(spark)
    vocab = {r["tok"]: r["count"] for r in toks.groupBy("tok").count().collect()}
    want = _ref_wordpiece(vocab, 8)
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"], r["score"])
        for r in learn_wordpiece_merges(corpus_vocab(toks), 8)
    ]
    assert got == want
    assert len(got) == 8


def test_selection_diverges_from_bpe(spark):
    """The point of the trainer: likelihood-driven selection must pick
    a DIFFERENT merge table than frequency-driven BPE on the same
    corpus — otherwise it is not testing anything BPE doesn't."""
    toks = _corpus_tokens(spark)
    vocab = corpus_vocab(toks)
    wp = [(r["left"], r["right"]) for r in learn_wordpiece_merges(vocab, 8)]
    bpe = [(r["left"], r["right"]) for r in learn_bpe_merges(vocab, 8)]
    assert wp != bpe, "WordPiece and BPE chose identical merges"


def test_registered_query_shape(spark):
    from http_log_anonymizer_spark.plans import REGISTRY

    rows = REGISTRY["wordpiece_learn_merges"].spark_fn(spark, SF).collect()
    assert [r["step"] for r in rows] == list(range(len(rows)))
    assert all(r["pair_count"] > 0 and r["score"] > 0 for r in rows)
