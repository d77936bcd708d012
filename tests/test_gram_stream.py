"""Streaming Gram sink (streaming/gram_sink.py) — exact batch parity,
replay idempotence, version ledger behavior."""

import os

import numpy as np
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions.similarity import embedding_gram
from mapbox_vector_tile_spark.streaming.gram_sink import (
    current_gram_dir,
    publish_gram_batch,
    read_current_gram,
    start_gram_maintenance_stream,
    version_log,
)


def _emb_df(spark, X, base=0):
    return spark.createDataFrame(
        [(base + i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def test_incremental_folds_equal_batch(spark, tmp_path):
    rng = np.random.default_rng(3)
    X = rng.normal(0, 0.3, (90, 6)).astype(np.float32)
    root = str(tmp_path / "gram")
    for b, lo in enumerate(range(0, 90, 30)):
        publish_gram_batch(spark, root, _emb_df(spark, X[lo:lo + 30], lo), b)
    got = sorted(map(tuple, read_current_gram(spark, root).collect()))
    want = sorted(map(tuple, embedding_gram(_emb_df(spark, X)).collect()))
    assert got == want
    assert len(version_log(root)) == 3


def test_replayed_batch_is_noop(spark, tmp_path):
    rng = np.random.default_rng(4)
    X = rng.normal(0, 0.3, (40, 4)).astype(np.float32)
    root = str(tmp_path / "gram")
    assert publish_gram_batch(spark, root, _emb_df(spark, X), 0) is not None
    before = current_gram_dir(root)
    # at-least-once replay of the same batch id publishes nothing
    assert publish_gram_batch(spark, root, _emb_df(spark, X), 0) is None
    assert current_gram_dir(root) == before
    got = read_current_gram(spark, root)
    assert got.filter(F.col("i") == 0).first()["n"] == 40


def test_stream_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(9)
    X = rng.normal(0, 0.4, (120, 5)).astype(np.float32)
    emb_pq = str(tmp_path / "emb")
    _emb_df(spark, X).repartition(5).write.parquet(emb_pq)
    static = spark.read.parquet(emb_pq)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(emb_pq)
    )
    root = str(tmp_path / "gram")
    sq = start_gram_maintenance_stream(stream, root, str(tmp_path / "ck"))
    sq.awaitTermination()
    got = sorted(map(tuple, read_current_gram(spark, root).collect()))
    want = sorted(map(tuple, embedding_gram(static).collect()))
    assert got == want
    # multiple micro-batches actually happened
    assert len(version_log(root)) >= 2
    assert os.path.exists(os.path.join(root, "_current"))
