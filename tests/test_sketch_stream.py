"""Streaming sketch maintenance: stream==batch parity for both sketch
families, exactly-once replay, version monotonicity."""

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.corpus import MOD
from mapbox_vector_tile_spark.functions.sketch import (
    cm_bucket_counts,
    hll_register_table,
    kmv_distinct_ngrams,
)
from mapbox_vector_tile_spark.streaming.sketch_sink import (
    publish_sketch_batch,
    published_batch_ids,
    read_current_cm,
    read_current_hll,
    read_current_kmv,
    start_sketch_maintenance_stream,
    version_log,
)

K = 512


def test_stream_matches_batch_state(spark, tmp_path):
    tokens_pq = str(tmp_path / "tokens")
    corpus = G.corpus_dataframe(spark, 240, num_partitions=6)
    corpus.write.parquet(tokens_pq)
    static = spark.read.parquet(tokens_pq)

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(tokens_pq)
    )
    root = str(tmp_path / "sk")
    sq = start_sketch_maintenance_stream(
        stream, root, str(tmp_path / "ck"), n=2, k=K
    )
    sq.awaitTermination()

    assert len(version_log(root)) >= 2  # genuinely incremental

    got_cm = {
        (r.r, r.bucket): r.cnt
        for r in read_current_cm(spark, root).collect()
    }
    want_cm = {
        (r.r, r.bucket): r.cnt
        for r in cm_bucket_counts(static, 2).collect()
    }
    assert got_cm == want_cm and len(got_cm) > 0

    got_kmv = sorted(
        r.h for r in read_current_kmv(spark, root).collect()
    )
    batch_row = kmv_distinct_ngrams(static, 2, K).first()
    assert len(got_kmv) == batch_row.n_seen
    assert got_kmv[-1] == batch_row.kth_h
    assert sum(got_kmv) % MOD == batch_row.bottomk_cks

    got_hll = {
        (r.source, r.bucket): r.rho_max
        for r in read_current_hll(spark, root).collect()
    }
    want_hll = {
        (r.source, r.bucket): r.rho_max
        for r in hll_register_table(static).collect()
    }
    assert got_hll == want_hll and len(got_hll) > 0


def test_replayed_batch_publishes_nothing(spark, tmp_path):
    root = str(tmp_path / "sk")
    docs = G.corpus_dataframe(spark, 40, num_partitions=1)
    v1 = publish_sketch_batch(spark, root, docs, 0, n=2, k=K)
    assert v1 is not None and published_batch_ids(root) == {0}
    before = {
        (r.r, r.bucket): r.cnt for r in read_current_cm(spark, root).collect()
    }
    assert publish_sketch_batch(spark, root, docs, 0, n=2, k=K) is None
    after = {
        (r.r, r.bucket): r.cnt for r in read_current_cm(spark, root).collect()
    }
    assert after == before
    # a NEW batch id with the same docs doubles every count (merge by add)
    v2 = publish_sketch_batch(spark, root, docs, 1, n=2, k=K)
    assert v2 is not None
    doubled = {
        (r.r, r.bucket): r.cnt for r in read_current_cm(spark, root).collect()
    }
    assert doubled == {kb: 2 * c for kb, c in before.items()}
    # ...while the KMV state (a SET) is unchanged by duplicate content
    kmv = sorted(r.h for r in read_current_kmv(spark, root).collect())
    docs_kmv = kmv_distinct_ngrams(docs, 2, K).first()
    assert len(kmv) == docs_kmv.n_seen and kmv[-1] == docs_kmv.kth_h
    # ...and so are the HLL registers (max-merge idempotent on duplicates)
    hll = {
        (r.source, r.bucket): r.rho_max
        for r in read_current_hll(spark, root).collect()
    }
    want = {
        (r.source, r.bucket): r.rho_max
        for r in hll_register_table(docs).collect()
    }
    assert hll == want


def test_qsample_stream_matches_batch(spark, tmp_path):
    """4th family: the order-sample quantile sketch maintained by the
    stream equals the batch bottom-k over all data; duplicate content is
    set-idempotent."""
    from mapbox_vector_tile_spark.functions.text import h48
    from mapbox_vector_tile_spark.streaming.sketch_sink import (
        publish_sketch_batch,
        read_current_qsample,
    )

    tokens_pq = str(tmp_path / "toks")
    corpus = G.corpus_dataframe(spark, 300, num_partitions=6)
    corpus.write.parquet(tokens_pq)
    static = spark.read.parquet(tokens_pq)

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(tokens_pq)
    )
    root = str(tmp_path / "sk_q")
    sq = start_sketch_maintenance_stream(
        stream, root, str(tmp_path / "ck_q"), n=2, k=K
    )
    sq.awaitTermination()

    got = sorted(
        (r.hk, r.v) for r in read_current_qsample(spark, root).collect()
    )
    want = sorted(
        (r.hk, r.v)
        for r in static.select(
            h48(F.col("doc_id").cast("string")).alias("hk"),
            F.col("n_tok").cast("long").alias("v"),
        ).orderBy("hk", "v").limit(K).collect()
    )
    assert got == want and len(got) == min(K, 300)

    # duplicate content: folding the SAME docs again leaves the set as-is
    publish_sketch_batch(spark, root, static, batch_id=10**6, n=2, k=K)
    again = sorted(
        (r.hk, r.v) for r in read_current_qsample(spark, root).collect()
    )
    assert again == got
