"""Streaming snapshot-commit sink: one snapshot per micro-batch,
replay-idempotent, decode parity with the batch pipeline."""

import os

import pytest

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine import snapshots as S
from mapbox_vector_tile_spark.streaming.snapshot_sink import (
    committed_batch_ids,
    start_snapshot_commit_stream,
)

N_DOCS = 240


@pytest.fixture(scope="module")
def corpus_pq(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("snapsink") / "tokens")
    G.corpus_dataframe(spark, N_DOCS, num_partitions=6).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def table(spark, corpus_pq, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snapsink") / "tbl")
    os.makedirs(root)
    static = spark.read.parquet(corpus_pq)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(corpus_pq)
    )
    ck = str(tmp_path_factory.mktemp("snapsink") / "ck")
    sq = start_snapshot_commit_stream(stream, root, ck)
    sq.awaitTermination()
    return root


def _ids_and_tokens(df):
    return {r.doc_id: list(r.tokens) for r in df.collect()}


def test_one_snapshot_per_batch_and_parity(spark, corpus_pq, table):
    log = S.snapshot_log(table)
    assert len(log) >= 2  # maxFilesPerTrigger forced multiple commits
    assert all(s["operation"] == "append" for s in log)
    assert committed_batch_ids(table) == {s["batch_id"] for s in log}
    got = _ids_and_tokens(S.decode_at(spark, table))
    want = _ids_and_tokens(spark.read.parquet(corpus_pq).select(
        "doc_id", "tokens"
    ))
    assert got == want


def test_history_is_cumulative(spark, table):
    log = S.snapshot_log(table)
    sizes = [
        S.decode_at(spark, table, s["snapshot_id"]).count() for s in log
    ]
    assert sizes == sorted(sizes) and sizes[-1] == N_DOCS
    assert all(a < b for a, b in zip(sizes, sizes[1:]))


def test_replayed_batch_commits_nothing(spark, corpus_pq, table):
    # foreachBatch is at-least-once: re-deliver an already-committed id
    # through the sink's own per-batch path
    from mapbox_vector_tile_spark.streaming.snapshot_sink import (
        commit_micro_batch,
    )

    before = len(S.snapshot_log(table))
    replay_id = min(committed_batch_ids(table))
    batch = spark.read.parquet(corpus_pq).limit(5)
    assert commit_micro_batch(table, batch, replay_id) is None
    assert len(S.snapshot_log(table)) == before
    assert S.decode_at(spark, table).count() == N_DOCS
    # a genuinely new id commits exactly one snapshot with fresh doc ids
    new_id = max(committed_batch_ids(table)) + 1000
    fresh = spark.createDataFrame(
        [("doc-x1", [1, 2, 3], 3), ("doc-x2", [], 0)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    sid = commit_micro_batch(table, fresh, new_id)
    assert sid == len(S.snapshot_log(table))
    assert S.decode_at(spark, table).count() == N_DOCS + 2
