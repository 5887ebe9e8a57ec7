"""Distributed BPE merge learning (Sennrich et al., ACL 2016).

Learns the first ``k`` byte-pair-encoding merges from a corpus the way
the reference algorithm does — iteratively take the most frequent
adjacent symbol pair and fuse it — but with every corpus-sized step
expressed as a DataFrame aggregation:

- The corpus collapses to a (word, freq) VOCABULARY first (classic BPE
  operates on the weighted vocab, not the token stream): one shuffle on
  the word key, after which every iteration touches vocab-sized data
  only. At 100 TB the vocab is millions of rows where the corpus is
  trillions — this is what makes iterating feasible.
- Per iteration: adjacent-pair counts are an explode + groupBy(pair)
  with map-side combine; the argmax pair (count desc, then lexicographic
  — the deterministic tie-break) is a 1-row takeOrdered to the driver;
  the merge application is a pure array fold per word (greedy
  left-to-right, matching the reference implementation) — zero shuffle.
- Driver state per iteration is ONE (left, right, count) row; the vocab
  stays distributed, lineage truncated per round via localCheckpoint.

The iteration is not SQL-expressible (k data-dependent rounds), so the
registry entry is rows-only; tests/test_bpe.py proves the distributed
learner identical to a pure-Python reference BPE on the same vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def _merge_adjacent(sym: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right fusion of adjacent (left, right) symbol
    pairs inside one symbol array — the fold mirrors the reference
    merge loop: a freshly fused symbol immediately becomes the 'last'
    element, so overlapping occurrences (e.g. 'aaa' under (a,a)) fuse
    left-first exactly like sentencepiece/subword-nmt."""
    fused = F.lit(left + right)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def corpus_vocab(tokens: DataFrame, token_col: str = "tok") -> DataFrame:
    """(word, freq, sym) weighted vocabulary with character-split
    symbol arrays — the working set BPE iterates over."""
    return (
        tokens.groupBy(F.col(token_col).alias("word"))
        .agg(F.count("*").alias("freq"))
        .select("word", "freq", F.split("word", "(?!$)").alias("sym"))
    )


def learn_bpe_merges(vocab: DataFrame, k: int) -> list[Row]:
    """First ``k`` BPE merges [(step, left, right, pair_count)] from a
    (word, freq, sym) vocabulary. Stops early when no adjacent pair
    remains. Ties break deterministically: highest count, then
    lexicographic (left, right)."""
    v = vocab.select("freq", "sym").localCheckpoint()
    merges: list[Row] = []
    for step in range(k):
        pairs = (
            v.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("sym") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("sym") - 1),
                            lambda i: F.struct(
                                F.element_at("sym", i).alias("l"),
                                F.element_at("sym", i + F.lit(1)).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), "l", "r").take(1)
        if not top:
            break
        best = top[0]
        merges.append(
            Row(step=step, left=best["l"], right=best["r"], pair_count=int(best["c"]))
        )
        v = v.select(
            "freq", _merge_adjacent(F.col("sym"), best["l"], best["r"]).alias("sym")
        ).localCheckpoint()
    return merges
