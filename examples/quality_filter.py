"""End-to-end demo: LM-perplexity quality filtering, Spark-native.

The CCNet recipe (Wenzek et al., LREC 2020) as this engine runs it —
the quality gate most large-scale text pipelines put between crawl
and training:

1. TRAIN a Kneser-Ney LM on the corpus itself — here the per-language
   interpolated-KN bigram of plans/text.py:ccnet_kn_buckets (the
   modified-KN TRIGRAM `mkn_trigram_perplexity`, i.e. the KenLM
   order-3 algorithm, is the registered corpus-level scorer);
2. SCORE every document by average negative log-likelihood;
3. CUT each language into perplexity terciles: "head" is kept
   outright, "middle" kept or re-filtered, "tail" dropped;
4. HAND OFF the kept share to the curation stack (dedup, mixing,
   sharding — see examples/curate_stream.py and
   plans/curation.py:llm_corpus_report).

All model quantities are exact integer aggregates, so the entire
train+score+cut pipeline is replayed by each query's DuckDB oracle
and hash-checked by the driver — the filter you ship is the filter
you tested.

Run: python examples/quality_filter.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from http_log_anonymizer_spark.plans import REGISTRY  # noqa: E402
from http_log_anonymizer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quality-filter-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # corpus-level scorers: unsmoothed MLE vs interpolated KN vs
    # modified-KN trigram — the ladder of LM quality signals
    for name in ("doc_perplexity", "kn_doc_perplexity", "mkn_trigram_perplexity"):
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        stats = df.agg(
            F.count("*").alias("docs"),
            F.round(F.avg("avg_nll"), 3).alias("mean_nll"),
            F.round(F.max("avg_nll"), 3).alias("max_nll"),
        ).first()
        print(f"{name:24s} docs={stats.docs:5d} mean_nll={stats.mean_nll} "
              f"max_nll={stats.max_nll}")

    # the CCNet cut itself, per language, KN-driven
    buckets = REGISTRY["ccnet_kn_buckets"].spark_fn(spark, sf_dir)
    print("\nper-language KN perplexity terciles (the keep/drop gate):")
    buckets.show(30, truncate=False)

    kept = (
        buckets.filter(F.col("bucket") != "tail")
        .groupBy()
        .agg(F.sum("n_docs").alias("kept"))
        .first()
        .kept
    )
    total = buckets.agg(F.sum("n_docs")).first()[0]
    print(f"keep head+middle: {kept}/{total} docs "
          f"({100.0 * kept / total:.1f}% of the corpus survives the gate)")
    spark.stop()


if __name__ == "__main__":
    main()
