"""Streaming dedup with watermark: duplicates collapse across micro-batches
inside the horizon, output matches batch-distinct, state stays bounded."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dup_events_pq(spark, tmp_path_factory):
    """sf0.001 events with every 3rd event duplicated (new file, same
    event_id/ts) — the producer-replay shape."""
    base = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = str(tmp_path_factory.mktemp("dup") / "events")
    base.repartition(4).write.parquet(path)
    dups = base.filter(F.col("event_id") % 3 == 0)
    dups.repartition(2).write.mode("append").parquet(path)
    return path


def test_stream_dedup_matches_batch_distinct(spark, dup_events_pq, tmp_path):
    from mapbox_vector_tile_spark.streaming.dedup_stream import (
        start_dedup_stream,
    )

    static = spark.read.parquet(dup_events_pq)
    n_total = static.count()
    n_distinct = static.select("event_id").distinct().count()
    assert n_total > n_distinct  # duplicates genuinely present

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(dup_events_pq)
    )
    out = str(tmp_path / "deduped")
    sq = start_dedup_stream(
        stream, out, str(tmp_path / "ck"), horizon="365 days"
    )
    sq.awaitTermination()

    got = spark.read.parquet(out)
    # multiple micro-batches actually ran (state carried across them)
    assert got.select("batch_id").distinct().count() >= 2
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct
    # every surviving row is a real event (no mutation in transit)
    want = {
        (r.event_id, r.user_id, r.event_type)
        for r in static.select("event_id", "user_id", "event_type")
        .distinct()
        .collect()
    }
    have = {
        (r.event_id, r.user_id, r.event_type)
        for r in got.select("event_id", "user_id", "event_type").collect()
    }
    assert have == want
