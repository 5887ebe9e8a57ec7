"""Streaming spectrum monitor: fed the corpus in micro-batches, the
readout must EQUAL the batch embedding_spectrum_report row for row;
the moment fold must be replay-safe and batch-boundary invariant; a
planted spectrum shift must surface in prefix_energy()."""

from __future__ import annotations

from pyspark.sql import functions as F

from http_log_anonymizer_spark.plans import REGISTRY
from http_log_anonymizer_spark.sources.batch import load_table
from http_log_anonymizer_spark.streaming.spectrum import StreamingSpectrumMonitor

SF = "/root/testdata/sf0.001"


def test_stream_fold_equals_batch_report(spark, tmp_path):
    e = load_table(spark, SF, "embeddings").select("vec_id", "embedding").persist()
    mon = StreamingSpectrumMonitor(str(tmp_path / "state"))
    for b in range(4):
        mon.write(e.filter(F.col("vec_id") % 4 == b), b)
    e.unpersist()
    got = [tuple(r) for r in mon.spectrum(spark).collect()]
    want = [
        tuple(r)
        for r in REGISTRY["embedding_spectrum_report"].spark_fn(spark, SF).collect()
    ]
    assert got == want
    assert len(got) == 64


def test_replay_and_boundaries_do_not_change_moments(spark, tmp_path):
    e = load_table(spark, SF, "embeddings").select("vec_id", "embedding").persist()
    one = StreamingSpectrumMonitor(str(tmp_path / "one"))
    one.write(e, 0)
    many = StreamingSpectrumMonitor(str(tmp_path / "many"))
    for b in range(3):
        many.write(e.filter(F.col("vec_id") % 3 == b), b)
    many.write(e.filter(F.col("vec_id") % 3 == 2), 2)  # same-batch-id replay
    many.write(e.filter(F.lit(False)), 3)  # empty slice
    assert [tuple(r) for r in one.spectrum(spark).collect()] == [
        tuple(r) for r in many.spectrum(spark).collect()
    ]
    e.unpersist()


def test_spectrum_shift_surfaces_in_prefix_energy(spark, tmp_path):
    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    mon = StreamingSpectrumMonitor(str(tmp_path / "state"))
    assert mon.spectrum(spark) is None
    assert mon.prefix_energy(spark, 2) is None
    # decaying feed: dims 0..7 with sigma 2^-k — prefix-heavy
    dec = [
        (i, [float(((-1) ** i) * 2.0 ** (-k)) for k in range(8)]) for i in range(40)
    ]
    mon.write(vecs(dec), 0)
    assert mon.prefix_energy(spark, 2) > 0.9
    # the upstream encoder changes: a flat-spectrum feed arrives and
    # the prefix share collapses — the drift the monitor exists to see
    flat = [
        (100 + i, [float((-1) ** (i + k)) for k in range(8)]) for i in range(400)
    ]
    mon.write(vecs(flat), 1)
    assert mon.prefix_energy(spark, 2) < 0.5
