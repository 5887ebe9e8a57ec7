"""End-to-end demo: ingest-time LINE/CDC dedup + online change
detection, Spark-native.

A document stream is chunk-deduped AS IT ARRIVES (the C4 keep-first
rule, streaming/chunk_dedup.py — switch ``--cdc`` for content-defined
boundaries that survive insertions), while a Count-Min sink tracks
chunk-hash frequencies and a CUSUM sink watches the per-batch removed-
token rate for a regime shift (a crawler suddenly re-serving boiler-
plate is exactly a CUSUM alarm). All state is crash-consistent parquet
— the same tables a nightly backfill reads and extends.

Run: python examples/chunk_dedup_stream.py [n_batches] [--cdc]
"""

from __future__ import annotations

import random
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from http_log_anonymizer_spark.session import get_spark
from http_log_anonymizer_spark.streaming.chunk_dedup import StreamingChunkDedupSink
from http_log_anonymizer_spark.streaming.cusum import StreamingCUSUMSink
from http_log_anonymizer_spark.streaming.frequency import StreamingCMSSink


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(args[0]) if args else 6
    chunker = "cdc" if "--cdc" in sys.argv else "line"

    spark = get_spark(app_name="chunk-dedup-stream", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = Path(tempfile.mkdtemp(prefix="chunk_dedup_demo_"))
    print(f"state root: {root}  chunker={chunker}")

    dedup = StreamingChunkDedupSink(str(root / "dedup"), compact_every=4, chunker=chunker)
    cms = StreamingCMSSink(str(root / "cms"), key_col="h")
    # alarm when a batch's removed-token count exceeds its own baseline
    baseline = spark.createDataFrame([(0, 15)], "key long, baseline long")
    cusum = StreamingCUSUMSink(str(root / "cusum"), baseline)

    rng = random.Random(7)
    pool: list[str] = []
    doc_id = 0
    for b in range(n_batches):
        docs = []
        boilerplate_storm = b >= n_batches - 2  # regime shift at the end
        for _ in range(15):
            segs = []
            for _ in range(rng.randrange(1, 4)):
                if pool and (boilerplate_storm or rng.random() < 0.3):
                    segs.append(rng.choice(pool))
                else:
                    seg = " ".join(f"w{rng.randrange(800)}" for _ in range(10))
                    pool.append(seg)
                    segs.append(seg)
            docs.append((doc_id, " ".join(segs)))
            doc_id += 1
        bdf = spark.createDataFrame(docs, "doc_id long, text string")
        dedup.write(bdf, b)

        out = dedup.deduped_docs(spark)
        removed = out.agg(
            F.sum(F.col("n_chunks") - F.col("n_kept")).alias("r")
        ).collect()[0].r
        # feed the CUMULATIVE removed count's per-batch delta to CUSUM
        prev = getattr(main, "_prev", 0)
        cusum.write(
            spark.createDataFrame([(0, (removed or 0) - prev)], "key long, value long"), b
        )
        main._prev = removed or 0

        seen = dedup.seen_chunks(spark)
        if seen is not None:
            cms.write(seen, b)

        st = {r.key: (r.s, r.s_max) for r in cusum.state(spark).collect()}
        print(
            f"batch {b}: total_removed={removed}  cusum={st[0][0]}"
            + ("  << ALARM" if st[0][0] > 25 else "")
        )

    out = dedup.deduped_docs(spark)
    kept = out.agg(F.sum("n_kept").alias("k"), F.sum("n_chunks").alias("n")).collect()[0]
    print(f"final: kept {kept.k}/{kept.n} chunks across {out.count()} docs")
    spark.stop()


if __name__ == "__main__":
    main()
