"""End-to-end demo: the ANN index lifecycle, Spark-native.

The FAISS ``train() once, add() forever, search() anytime`` loop as
this engine runs it:

1. TRAIN a sqrt-scaled coarse quantizer on a bootstrap corpus
   (operators/kmeans.py:kmeans_quantized_table — the fold-order-exact
   distributed Lloyd the ann_ivf_sqrt_topk query uses);
2. ADD embeddings as they STREAM in: the StreamingIVFIndexSink
   assigns each micro-batch to cells with the trainer's exact
   comparator and appends to a crash-consistent persisted inverted
   file (streaming/ann_index.py);
3. SEARCH the live index with the batch tier's own kernels
   (operators/ivf.py) — stream-built and batch-built indexes are
   bit-identical, so batch jobs and the stream share one index.

Run: python examples/ann_index_lifecycle.py [n_batches]
"""

from __future__ import annotations

import json
import math
import random
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from http_log_anonymizer_spark.session import get_spark

DIM = 64


def _vec(rng: random.Random) -> list[float]:
    return [rng.gauss(0.0, 1.0) for _ in range(DIM)]


def main(n_batches: int = 4) -> None:
    spark = get_spark(app_name="ann-index-lifecycle", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(7)
    work = Path(tempfile.mkdtemp(prefix="ann_lifecycle_"))

    # 1) TRAIN on a bootstrap corpus: k = sqrt(n) cells
    from http_log_anonymizer_spark.operators.kmeans import kmeans_quantized_table

    boot = spark.createDataFrame(
        [(i, _vec(rng)) for i in range(400)], "vec_id long, embedding array<double>"
    )
    k = int(round(math.sqrt(400)))
    _, centroids = kmeans_quantized_table(boot, k=k, rounds=2)
    print(f"trained coarse quantizer: {k} cells over 400 bootstrap vectors")

    # 2) ADD: stream micro-batches into the persisted inverted file
    from http_log_anonymizer_spark.streaming.ann_index import StreamingIVFIndexSink

    src = work / "src"
    src.mkdir()
    per_batch = 100
    for b in range(n_batches):
        rows = [
            {"vec_id": b * per_batch + i, "embedding": _vec(rng)}
            for i in range(per_batch)
        ]
        (src / f"b{b}.json").write_text("\n".join(json.dumps(r) for r in rows))

    sink = StreamingIVFIndexSink(str(work / "state"), centroids, compact_every=3)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink.write)
        .option("checkpointLocation", str(work / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n_indexed = sink.index(spark).count()
    print(f"indexed {n_indexed} vectors across {n_batches} micro-batches")

    # 3) SEARCH the live index
    from http_log_anonymizer_spark.functions.vectors import norm_column, unit_from

    queries = spark.createDataFrame(
        [(9000 + i, _vec(rng)) for i in range(5)],
        "vec_id long, embedding array<double>",
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qemb"),
        unit_from("embedding", norm_column("embedding")).alias("qe"),
    )
    res = sink.probe(spark, queries, nprobe=8, k=3)
    print("top-3 neighbors per query from the stream-built index:")
    for r in res.collect():
        print(f"  q={r.query_id} -> {r.neighbor_id} (rank {r.rank}, cos {r.cos})")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
