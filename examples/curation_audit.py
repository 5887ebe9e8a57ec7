"""The curation AUDIT panel: every read a training-data run consults
before committing compute, over one corpus, in one process — the
composition showcase for the registry's curation/analysis families:

  1. llm_corpus_report      — what survives dedup + lang + quality
  2. watermark_greenlist_report — which sources leak LLM output
  3. zipf_fit_report + heaps_fit_report — corpus-health power laws
     (template-text flags; the type-table growth forecast)
  4. token_burstiness_report — boilerplate terms (adaptation ~ 1)
  5. kcenter_coreset         — the diversity skeleton of the
                               embedding space + coverage radius
  6. training_shard_report   — the curation -> trainer handoff

Each stage is a registered, oracle-checked query; this script just
reads them side by side the way an operator would. Run manually
(~1 min):

    python examples/curation_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="curation-audit", shuffle_partitions=8)

    corpus = REGISTRY["llm_corpus_report"].spark_fn(spark, SF_DIR).collect()
    kept_docs = sum(r.n_docs for r in corpus if r.reason == "kept")
    kept_tokens = sum(r.n_tokens for r in corpus if r.reason == "kept")

    wm = {r.cohort: r for r in REGISTRY["watermark_greenlist_report"].spark_fn(spark, SF_DIR).collect()}
    zipf = {r.cohort: r for r in REGISTRY["zipf_fit_report"].spark_fn(spark, SF_DIR).collect()}
    heaps = REGISTRY["heaps_fit_report"].spark_fn(spark, SF_DIR).collect()[0]
    burst = REGISTRY["token_burstiness_report"].spark_fn(spark, SF_DIR).collect()
    coreset = REGISTRY["kcenter_coreset"].spark_fn(spark, SF_DIR).collect()
    shards = REGISTRY["training_shard_report"].spark_fn(spark, SF_DIR).collect()

    audit = {
        "sf_dir": SF_DIR,
        "corpus_rows": len(corpus),
        "kept_docs": kept_docs,
        "kept_tokens": kept_tokens,
        "watermark": {
            "flagged_sources": [c for c, r in wm.items() if r.wm_flag and c != "ALL"],
            "pooled_z": wm["ALL"].z,
            "docs_screened_out": wm["ALL"].n_docs_flagged,
        },
        "corpus_health": {
            "zipf_slope_all": zipf["ALL"].zipf_slope,
            "zipf_r2_all": zipf["ALL"].r2,
            "heaps_beta": heaps.heaps_beta,
            "heaps_k": heaps.heaps_k,
            "vocab_types": heaps.n_types,
        },
        "boilerplate_terms": [
            r.term for r in burst if r.adaptation is not None and r.adaptation >= 0.95
        ][:10],
        "diversity_coreset": {
            "center_vec_ids": [r.vec_id for r in coreset[:-1]],
            "coverage_radius_sq": coreset[-1].radius_sq,
        },
        "n_shards": len(shards),
    }
    print(json.dumps(audit))


if __name__ == "__main__":
    main()
