"""End-to-end demo: the three-tier retrieval stack, Spark-native.

Tier 1 RETRIEVE — two independent rankers over the corpus:
  - sparse: BM25 over a query TABLE (posting-list equi-join;
    plans/text.py:bm25_query_table)
  - dense: hyperplane-LSH ANN over embeddings
    (plans/similarity.py:ann_lsh_topk)
Tier 2 FUSE — reciprocal-rank fusion (rank-only, no score
  calibration; plans/text.py:hybrid_rrf_fusion).
Tier 3 RERANK — exact interaction features on the rank-bounded pool
  only (unit-cosine + token Jaccard — the deterministic stand-in for a
  cross-encoder Pandas UDF; plans/text.py:rerank_fusion_topk).

Every tier is a registered, DuckDB-oracle-checked query; this script
just runs them in sequence on the sample data and prints what moved
between the fused and reranked orderings.

Run: python examples/retrieval_stack.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from http_log_anonymizer_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="retrieval-stack-demo", shuffle_partitions=8)
    from http_log_anonymizer_spark.plans import REGISTRY

    lex = REGISTRY["bm25_query_table"].spark_fn(spark, sf_dir)
    dense = REGISTRY["ann_lsh_topk"].spark_fn(spark, sf_dir)
    fused = REGISTRY["hybrid_rrf_fusion"].spark_fn(spark, sf_dir)
    rerank = REGISTRY["rerank_fusion_topk"].spark_fn(spark, sf_dir)

    print(f"-- corpus: {sf_dir}")
    print(f"-- sparse candidates : {lex.count()} (query,doc) rows")
    print(f"-- dense candidates  : {dense.count()} (query,vec) rows")
    f = fused.cache()
    r = rerank.cache()
    print(f"-- fused pool        : {f.count()} rows")
    print(f"-- reranked output   : {r.count()} rows")

    # which candidates did the rerank tier promote past the RRF order?
    moved = r.filter(r.new_rank < r.rrf_rank).orderBy("query_id", "new_rank")
    print("-- promotions (rerank_rank < rrf_rank):")
    for row in moved.limit(10).collect():
        print(
            f"   query {row.query_id}: cand {row.cand} "
            f"rrf#{row.rrf_rank} -> rerank#{row.new_rank} "
            f"(score {row.rerank_score})"
        )
    f.unpersist()
    r.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
