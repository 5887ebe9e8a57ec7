"""The full ingest-time monitor stack on ONE stream: a single
readStream -> foreachBatch query fans each micro-batch into the five
independent epoch-protocol monitors — k-anonymity, l-diversity,
t-closeness (the privacy trio), PSI drift, and the embedding spectrum
— then prints every readout. Demonstrates that the monitors compose:
each keeps its own state root + epoch tags, so one batch function can
feed them all and a crash replays each from exactly its own committed
state. Run manually (~1 min):

    python examples/monitor_stack.py
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from http_log_anonymizer_spark.session import get_spark
from http_log_anonymizer_spark.streaming.kanon import StreamingKAnonymityMonitor
from http_log_anonymizer_spark.streaming.ldiversity import StreamingLDiversityMonitor
from http_log_anonymizer_spark.streaming.psi import StreamingPSISink
from http_log_anonymizer_spark.streaming.spectrum import StreamingSpectrumMonitor
from http_log_anonymizer_spark.streaming.storage import StreamingStorageMonitor
from http_log_anonymizer_spark.streaming.tcloseness import StreamingTClosenessMonitor

QI = ("remote_addr", "cache_status")


def main() -> None:
    spark = get_spark(app_name="monitor-stack", shuffle_partitions=8)
    root = Path(tempfile.mkdtemp(prefix="monitor_stack_"))

    # --- source: anonymized http rows + a synthetic embedding per row,
    # written as json files so a real readStream drives the batch ids
    from http_log_anonymizer_spark.functions import anonymize_ip_fast
    from http_log_anonymizer_spark.plans.http_log import http_log_view

    rows = (
        http_log_view(spark, "/root/testdata/sf0.001")
        .select(
            "timestamp",
            anonymize_ip_fast("remote_addr").alias("remote_addr"),
            "cache_status",
            "response_status",
            "url",
            (F.col("bytes_sent") / 1000.0).alias("value"),
        )
        .limit(4000)
    )
    emb = F.array(
        *[
            (
                F.pmod(F.xxhash64("remote_addr", F.lit(k)), F.lit(1000)).cast(
                    "double"
                )
                / 1000.0
                * F.lit(2.0 ** (-k / 8.0))
            ).cast("float")
            for k in range(16)
        ]
    )
    src = root / "src"
    out = rows.withColumn("embedding", emb)
    out.coalesce(3).write.mode("overwrite").json(str(src))

    # --- the five monitors, one state root each
    kanon = StreamingKAnonymityMonitor(str(root / "kanon"), QI)
    ldiv = StreamingLDiversityMonitor(str(root / "ldiv"), QI, "response_status")
    tclose = StreamingTClosenessMonitor(str(root / "tclose"), QI, "response_status")
    ref = rows.select("remote_addr", "cache_status", "value").limit(2000)
    lo, hi = (
        ref.select(F.round(F.col("value") * 100).cast("long").alias("c"))
        .agg(F.min("c"), F.max("c"))
        .collect()[0]
    )
    psi = StreamingPSISink(
        str(root / "psi"), ref, int(lo), int(hi), cohort_col="cache_status"
    )
    spectrum = StreamingSpectrumMonitor(str(root / "spectrum"))
    # capacity twin of storage_estimate_report; the demo feed's
    # observed rate is tiny (4k rows spread over the corpus's event
    # span), so even a 1 GiB budget stays quiet — the paging path is
    # exercised in tests/test_streaming_storage.py
    storage = StreamingStorageMonitor(
        str(root / "storage"), retention_days=365, disk_budget_bytes=1 << 30
    )

    def fan_out(batch_df, batch_id: int) -> None:
        batch_df.persist()
        kanon.write(batch_df, batch_id)
        ldiv.write(batch_df, batch_id)
        tclose.write(batch_df, batch_id)
        psi.write(batch_df, batch_id)
        spectrum.write(batch_df.select("embedding"), batch_id)
        storage.write(batch_df, batch_id)
        batch_df.unpersist()

    schema = (
        "timestamp timestamp, remote_addr string, cache_status string,"
        " response_status long, url string, value double,"
        " embedding array<float>"
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .writeStream.foreachBatch(fan_out)
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    report = {
        "k": kanon.k(spark),
        "l": ldiv.l(spark),
        "t": tclose.t(spark),
        "psi_alarms": [r.cohort for r in psi.alarms(spark).collect()],
        "prefix_energy_d8": spectrum.prefix_energy(spark, 8),
        "l1_classes": ldiv.alarms(spark).count(),
        "storage_alarms": storage.alarms(spark),
        "bytes_per_row_milli": storage.observed(spark).collect()[0].bytes_per_row_milli,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
