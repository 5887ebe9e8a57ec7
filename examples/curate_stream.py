"""End-to-end demo: ingest-time corpus curation, Spark-native.

A document stream is near-deduped AS IT ARRIVES against a persisted
LSH index (streaming/neardup.py), while two mergeable-summary sinks
maintain a uniform sample and the token heavy hitters of everything
ACCEPTED so far (streaming/reservoir.py, streaming/frequent.py). All
state is crash-consistent parquet — the same tables a nightly batch
backfill would read and extend.

Run: python examples/curate_stream.py [n_batches]
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from http_log_anonymizer_spark.session import get_spark
from http_log_anonymizer_spark.streaming.frequent import StreamingFrequentItemsSink
from http_log_anonymizer_spark.streaming.neardup import NearDupDedupSink
from http_log_anonymizer_spark.streaming.reservoir import StreamingReservoirSink

WORDS = [f"tok{i}" for i in range(300)] + ["common"] * 40  # skewed vocab


def make_batches(n_batches: int, rng: random.Random) -> list[list[dict]]:
    batches, next_id, texts = [], 0, []
    for _ in range(n_batches):
        batch = []
        for _ in range(20):
            text = " ".join(rng.choice(WORDS) for _ in range(40))
            batch.append({"doc_id": next_id, "text": text})
            texts.append(text)
            next_id += 1
        if texts and rng.random() < 0.8:  # plant a near/exact duplicate
            dup = rng.choice(texts).split()
            if rng.random() < 0.5:
                dup[3] = "mutated"
            batch.append({"doc_id": next_id, "text": " ".join(dup)})
            next_id += 1
        batches.append(batch)
    return batches


def main(n_batches: int = 8) -> None:
    spark = get_spark(app_name="curate-stream-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(42)
    root = Path(tempfile.mkdtemp(prefix="curate_demo_"))
    src, state, ckpt = root / "src", root / "state", root / "ck"
    src.mkdir()

    dedup = NearDupDedupSink(str(state / "neardup"), compact_every=4)
    sample = StreamingReservoirSink(str(state / "sample"), k=10, key_col="doc_id")
    hitters = StreamingFrequentItemsSink(str(state / "hitters"), m=15)

    def curate(batch_df, batch_id):
        dedup.write(batch_df, batch_id)
        accepted = batch_df.sparkSession.read.parquet(
            str(state / "neardup" / "docs")
        ).join(batch_df.select("doc_id"), "doc_id")
        sample.write(accepted, batch_id)
        hitters.write(
            accepted.select(F.explode(F.split("text", " ")).alias("item")), batch_id
        )

    total = 0
    for i, batch in enumerate(make_batches(n_batches, rng)):
        (src / f"b{i}.json").write_text("\n".join(json.dumps(d) for d in batch))
        total += len(batch)
        rows = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = (
            rows.writeStream.foreachBatch(curate)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    kept = spark.read.parquet(str(state / "neardup" / "docs")).count()
    print(f"\nstreamed {total} docs in {n_batches} batches -> accepted {kept}, "
          f"dropped {total - kept} near-dups at ingest")
    print("\nuniform 10-doc sample of everything accepted (restart-stable):")
    for r in sample.current(spark).orderBy("rnk").collect():
        print(f"  rnk={r.rnk:2d}  doc_id={r.doc_id}")
    print("\ntop tokens (Misra-Gries, err <= N/16):")
    for r in hitters.current(spark).orderBy(F.desc("cnt")).limit(5).collect():
        print(f"  {r.item:10s} cnt>={r.cnt}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
