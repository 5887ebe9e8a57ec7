"""Per-stratum reservoir sampling — top-k-by-priority per group without
a full window sort.

`stratified_sample` (plans/sampling.py) ranks every row of a stratum
with a window function: correct, but a stratum with 10^9 rows pays a
full per-group sort for a k-row answer. This operator is the scale
path: a deterministic reservoir expressed as *partial top-k pruning*.

Mechanics (the classic combiner pattern, same contract as Spark's own
TakeOrderedAndProject but per group):

1. each input partition prunes locally — for every group present in the
   Arrow batch, keep only the k rows with the smallest priority
   (pandas sort + groupby head, vectorized);
2. the survivors (≤ k · groups · batches rows — tiny) flow into one
   exact row_number window for the final per-group rank.

With priority = hash64(key) the "reservoir" is deterministic and
engine-reproducible: the result is exactly the k smallest hash values
per group — identical to what the full window sort would return, so a
plain SQL window is the oracle. (A classic randomized reservoir keeps
uniform-without-replacement semantics; hash-priority sampling IS that
scheme with the hash as the random tag — Efraimidis-Spirakis with
uniform weights — minus the irreproducibility.)

At 100 TB: the heavy phase is embarrassingly parallel, shuffles only
k·groups·partitions rows instead of the whole table, and never
materializes a per-group global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partial_topk_prune(
    df: DataFrame, group_cols: list[str], k: int, sort_cols: list[str]
) -> DataFrame:
    """Phase 1 alone: per input partition, keep only the k best
    ``sort_cols`` rows per group (or globally when ``group_cols`` is
    empty). Narrow — no shuffle; the output is a superset of the exact
    per-group top-k, suitable for feeding an exact finisher or a
    streaming state merge."""

    def prune(batches):
        # The prune must keep a SUPERSET of what the exact Spark window
        # finisher ranks, under Spark's semantics: (a) a NULL group key
        # is a real group (pandas groupby silently DROPS NaN keys by
        # default — the planted-NULL audit lost a whole stratum to
        # that), and (b) ascending ORDER BY ranks NULLS FIRST in Spark,
        # so NaN sort keys must go first or the prune cuts exactly the
        # rows the finisher would rank on top.
        for pdf in batches:
            if len(pdf) == 0:
                continue
            s = pdf.sort_values(sort_cols, kind="mergesort", na_position="first")
            yield (
                s.groupby(group_cols, sort=False, dropna=False).head(k)
                if group_cols
                else s.head(k)
            )

    return df.mapInPandas(prune, df.schema)


def reservoir_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    priority_col: str,
    tiebreak_cols: list[str],
) -> DataFrame:
    """k rows with the smallest ``(priority, tiebreak...)`` per group,
    with their exact rank in ``rnk``.

    ``priority_col`` must already exist on ``df`` (compute it with a
    Catalyst expression — e.g. ``hash64`` — so the oracle can reproduce
    it); ``tiebreak_cols`` must make the ordering total or ranks are
    nondeterministic.
    """
    sort_cols = [priority_col, *tiebreak_cols]
    reduced = partial_topk_prune(df, group_cols, k, sort_cols)
    w = Window.partitionBy(*group_cols).orderBy(*sort_cols)
    return reduced.select("*", F.row_number().over(w).alias("rnk")).filter(
        F.col("rnk") <= k
    )
