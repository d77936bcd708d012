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


def test_crash_between_ledger_and_pointer_loses_nothing(
    spark, tmp_path, monkeypatch
):
    """The ledger append is the publish point: a crash AFTER the ledger
    line but BEFORE the _current swap must not lose the batch — readers
    and the next merge follow the ledger, not the stale pointer."""
    rng = np.random.default_rng(5)
    X = rng.normal(0, 0.3, (60, 4)).astype(np.float32)
    root = str(tmp_path / "gram")
    publish_gram_batch(spark, root, _emb_df(spark, X[:20]), 0)

    real_replace = os.replace

    def crashing_replace(src, dst):
        if dst.endswith("_current"):
            raise OSError("simulated crash before pointer swap")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crashing_replace)
    try:
        publish_gram_batch(spark, root, _emb_df(spark, X[20:40], 20), 1)
    except OSError:
        pass
    monkeypatch.setattr(os, "replace", real_replace)
    # batch 1 is in the ledger; its state must be visible despite the
    # stale pointer, and the replay must be a no-op
    assert len(version_log(root)) == 2
    assert current_gram_dir(root).endswith(version_log(root)[-1]["dir"])
    assert publish_gram_batch(spark, root, _emb_df(spark, X[20:40], 20), 1) is None
    publish_gram_batch(spark, root, _emb_df(spark, X[40:], 40), 2)
    got = sorted(map(tuple, read_current_gram(spark, root).collect()))
    want = sorted(map(tuple, embedding_gram(_emb_df(spark, X)).collect()))
    assert got == want
