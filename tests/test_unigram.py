"""Unigram-LM trainer (operators/unigram.py): the distributed
integer-quantized Viterbi-EM must match a pure-Python reference
implementation exactly, and its SQL replay must match in DuckDB (the
registry gate re-checks the latter at sf0.01; here a tiny corpus keeps
the failure surface readable)."""

from __future__ import annotations

import collections

import duckdb
from pyspark.sql import functions as F

from http_log_anonymizer_spark.operators.unigram import (
    MAX_PIECE,
    MAX_WORD,
    train_unigram,
    unigram_sql,
)

SEP = "\x1f"


def _reference_train(words: list[str], rounds: int) -> dict[str, int]:
    """Plain-Python twin of train_unigram: same objective
    (fewest pieces, max cumulative count, lexicographic path), same
    seed counts, same fixed rounds."""
    freq = collections.Counter(w for w in words if 1 <= len(w) <= MAX_WORD)

    counts: dict[str, int] = collections.Counter()
    for w, f in freq.items():
        for i in range(len(w)):
            for l in range(1, min(MAX_PIECE, len(w) - i) + 1):
                counts[w[i : i + l]] += f

    for _ in range(rounds):
        new: dict[str, int] = collections.Counter()
        for w, f in freq.items():
            # DP: state[i] = (k, negs, path) best cover of w[:i]
            state = [(0, 0, "")] + [None] * len(w)
            for i in range(1, len(w) + 1):
                cands = []
                for j in range(max(0, i - MAX_PIECE), i):
                    piece = w[j:i]
                    k, negs, path = state[j]
                    cands.append(
                        (k + 1, negs - counts.get(piece, 0), path + SEP + piece)
                    )
                state[i] = min(cands)
            for piece in state[len(w)][2].split(SEP):
                if piece:
                    new[piece] += f
        counts = new
    return dict(counts)


def _corpus_words() -> list[str]:
    lines = [
        "the cat sat on the mat",
        "the cats eat fish",
        "a mat a cat a hat",
        "fishing the fish",
        "scan the column store",
        "columnar scans scan columns",
        "a verylongwordthatexceedsthecap appears here",
    ]
    return [w for line in lines for w in line.split(" ")]


def test_matches_python_reference(spark):
    words = _corpus_words()
    toks = spark.createDataFrame([(w,) for w in words], "tok string")
    got = {r.piece: r.cnt for r in train_unigram(toks, rounds=2).collect()}
    assert got == _reference_train(words, rounds=2)


def test_sql_replay_matches(spark):
    words = _corpus_words()
    toks = spark.createDataFrame([(w,) for w in words], "tok string")
    out = (
        train_unigram(toks, rounds=2)
        .orderBy(F.desc("cnt"), "piece")
        .limit(30)
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE toks AS SELECT * FROM (VALUES "
        + ",".join(f"('{w}')" for w in words)
        + ") t(tok)"
    )
    drows = con.execute(unigram_sql(2, "SELECT tok FROM toks", 30)).fetchall()
    assert [(r.piece, r.cnt) for r in out] == [(p, int(c)) for p, c, _ in drows]


def test_em_rounds_move_mass(spark):
    """Round-2 counts differ from seed counts (the EM actually
    iterates) and every piece respects the length cap."""
    words = _corpus_words()
    toks = spark.createDataFrame([(w,) for w in words], "tok string")
    r2 = {r.piece: r.cnt for r in train_unigram(toks, rounds=2).collect()}
    assert all(1 <= len(p) <= MAX_PIECE for p in r2)
    # seed counts count ALL substrings; usage counts only chosen pieces
    seed_total = sum(
        f * sum(min(MAX_PIECE, len(w) - i) for i in range(len(w)))
        for w, f in collections.Counter(
            w for w in words if 1 <= len(w) <= MAX_WORD
        ).items()
    )
    assert sum(r2.values()) < seed_total


def test_greedy_encode_matches_python_reference(spark):
    """greedy_segment_stats: the longest-match walk must equal a plain
    Python greedy tokenizer over the same trained vocabulary."""
    from http_log_anonymizer_spark.operators.unigram import greedy_segment_stats

    words = _corpus_words()
    toks = spark.createDataFrame([(w,) for w in words], "tok string")
    got = {
        r.word: (r.n_pieces, r.n_unk)
        for r in greedy_segment_stats(toks, rounds=2, min_count=2).collect()
    }

    counts = _reference_train(words, rounds=2)
    vocab = {p for p, c in counts.items() if c >= 2}
    ref = {}
    for w in sorted({w for w in words if 1 <= len(w) <= MAX_WORD}):
        pos, np_, nu = 0, 0, 0
        while pos < len(w):
            for l in range(min(MAX_PIECE, len(w) - pos), 0, -1):
                if w[pos : pos + l] in vocab:
                    pos += l
                    np_ += 1
                    break
            else:
                pos += 1
                np_ += 1
                nu += 1
        ref[w] = (np_, nu)
    assert got == ref
