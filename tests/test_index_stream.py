"""Streaming index maintenance: per-batch versions, exactly-once, parity."""

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.index import (
    build_token_index,
    index_token_stats,
    lookup_token,
)
from mapbox_vector_tile_spark.streaming.index_sink import (
    publish_micro_batch,
    published_batch_ids,
    read_current_index,
    start_index_maintenance_stream,
    version_log,
)


def test_stream_matches_batch_build(spark, tmp_path):
    tokens_pq = str(tmp_path / "tokens")
    corpus = G.corpus_dataframe(spark, 240, num_partitions=6)
    corpus.write.parquet(tokens_pq)
    static = spark.read.parquet(tokens_pq)

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(tokens_pq)
    )
    root = str(tmp_path / "idx")
    sq = start_index_maintenance_stream(
        stream, root, str(tmp_path / "ck"), lo=0, hi=15
    )
    sq.awaitTermination()

    log = version_log(root)
    assert len(log) >= 2  # several micro-batches, one version each

    streamed = read_current_index(spark, root)
    scratch = build_token_index(static, lo=0, hi=15)
    got = {
        r.tok: (r.n_docs, r.n_hits)
        for r in index_token_stats(streamed).collect()
    }
    want = {
        r.tok: (r.n_docs, r.n_hits)
        for r in index_token_stats(scratch).collect()
    }
    assert got == want and len(got) > 0
    a = {r.doc_id: r.n_hits for r in lookup_token(streamed, 7).collect()}
    b = {r.doc_id: r.n_hits for r in lookup_token(scratch, 7).collect()}
    assert a == b and len(a) > 0


def test_replayed_batch_publishes_nothing(spark, tmp_path):
    root = str(tmp_path / "idx")
    docs = G.corpus_dataframe(spark, 40, num_partitions=1)
    v1 = publish_micro_batch(spark, root, docs, 0, lo=0, hi=15)
    assert v1 is not None and published_batch_ids(root) == {0}
    before = index_token_stats(read_current_index(spark, root)).collect()
    # at-least-once replay of the same batch id: ledger hit, no new version
    assert publish_micro_batch(spark, root, docs, 0, lo=0, hi=15) is None
    assert len(version_log(root)) == 1
    after = index_token_stats(read_current_index(spark, root)).collect()
    assert before == after
