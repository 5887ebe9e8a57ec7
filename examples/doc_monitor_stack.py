"""The document-feed monitor stack on ONE stream: a single
readStream -> foreachBatch query fans each micro-batch of
(source, doc_id, text) rows into the five content monitors —
Gopher repetition (extractor regressions / templated output), the
quality-filter operating curve (is the deployed cutoff still sane),
LLM-watermark screening (model output leaking into the feed),
PII exposure (a scrub stage silently bypassed), and benchmark
decontamination (eval text leaking into training) — then prints
every readout. Together with examples/monitor_stack.py
(privacy trio + PSI + spectrum over event rows) this covers the
engine's full ingest-monitoring surface; each monitor keeps its own
state root + epoch tags, so one batch function feeds them all and a
crash replays each from exactly its own committed state. Run manually
(~1 min):

    python examples/doc_monitor_stack.py
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from http_log_anonymizer_spark.session import get_spark
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.streaming.quality_curve import (
    StreamingQualityCurveMonitor,
)
from http_log_anonymizer_spark.streaming.repetition import (
    StreamingRepetitionMonitor,
)
from http_log_anonymizer_spark.streaming.decontamination import (
    StreamingDecontaminationMonitor,
)
from http_log_anonymizer_spark.streaming.pii import StreamingPIIMonitor
from http_log_anonymizer_spark.streaming.watermark import StreamingWatermarkMonitor


def main() -> None:
    spark = get_spark(app_name="doc-monitor-stack", shuffle_partitions=8)
    root = Path(tempfile.mkdtemp(prefix="doc_monitor_stack_"))

    src = root / "src"
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "source", "doc_id", "text"
    )
    docs.coalesce(3).write.mode("overwrite").json(str(src))

    rep = StreamingRepetitionMonitor(str(root / "rep"))
    curve = StreamingQualityCurveMonitor(str(root / "curve"))
    wm = StreamingWatermarkMonitor(str(root / "wm"))
    # the RAW corpus text carries no PII (markers live in the derived
    # pii view), so this demonstrates the clean-feed quiet path; the
    # leak path is exercised in tests/test_streaming_pii.py
    pii = StreamingPIIMonitor(str(root / "pii"), alarm_pct=50, text_col="text")
    decon = StreamingDecontaminationMonitor(
        str(root / "decon"), "/root/testdata/sf0.001"
    )

    def fan_out(batch_df, batch_id: int) -> None:
        batch_df.persist()
        rep.write(batch_df, batch_id)
        curve.write(batch_df, batch_id)
        wm.write(batch_df, batch_id)
        pii.write(batch_df, batch_id)
        decon.write(batch_df.filter("doc_id % 20 != 0"), batch_id)
        batch_df.unpersist()

    q = (
        spark.readStream.schema("source string, doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .writeStream.foreachBatch(fan_out)
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    curve_rows = {r.threshold: r for r in curve.report(spark).collect()}
    rep_rows = rep.report(spark).collect()
    report = {
        "repetition_alarms": rep.alarms(spark),
        "rep_n_sources": len(rep_rows),
        "rep_total_keep": sum(r.n_keep for r in rep_rows),
        "curve_alarms": curve.alarms(spark),
        "keep_at_deployed_cutoff": curve_rows[0.5].pct_docs_kept,
        # NOTE: the synthetic corpus's low-entropy jargon text trips
        # the pooled watermark z on purpose-free data — the documented
        # caveat of greenlist detection on repetitive text (see
        # watermark_greenlist_report's docstring). On natural text a
        # clean feed stays quiet (tests/test_streaming_watermark.py).
        "wm_alarms": wm.alarms(spark),
        "pii_alarms": pii.alarms(spark),
        "pii_sources": pii.report(spark).count(),
        "decon_alarms": decon.alarms(spark),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
