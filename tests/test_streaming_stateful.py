"""Stateful streaming operator (applyInPandasWithState): per-user running
run-counts must carry state across micro-batches and end exactly equal to
the batch stat (functions.components.rle_run_count_events)."""

import time

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions.components import rle_run_count_events
from mapbox_vector_tile_spark.streaming.stateful import running_event_run_counts

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_running_counts_match_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # two time-ordered files -> two micro-batches; the run boundary state
    # (last_type per user) must survive the batch boundary for parity
    cut = events.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    src = str(tmp_path / "stream_src")
    early = events.filter(F.col("ts") <= cut)
    late = events.filter(F.col("ts") > cut)
    early.coalesce(1).write.parquet(f"{src}/f0")
    time.sleep(1.1)  # file source orders batches by modification time
    late.coalesce(1).write.parquet(f"{src}/f1")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        running_event_run_counts(stream)
        .writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # totals are monotonic, so the max per user is the final state
    got = {
        r.user_id: (r.n_events, r.n_runs)
        for r in spark.sql(
            "SELECT user_id, MAX(n_events) AS n_events, MAX(n_runs) AS n_runs "
            "FROM running_counts GROUP BY user_id"
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.n_runs)
        for r in rle_run_count_events(events).collect()
    }
    assert got == want
    # multiple updates per user proves state crossed a batch boundary
    n_updates = spark.sql("SELECT COUNT(*) FROM running_counts").first()[0]
    assert n_updates > len(want)
