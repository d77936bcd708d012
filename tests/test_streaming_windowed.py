"""Windowed event-time aggregation: stream (availableNow, with watermark)
must equal batch must equal the DuckDB oracle."""

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def test_batch_matches_duckdb(spark):
    from mapbox_vector_tile_spark.streaming.windowed import (
        WINDOWED_EVENT_COUNTS_SQL,
        windowed_event_counts,
    )
    from tests.test_functions_text import assert_parity

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    assert_parity(
        windowed_event_counts(events).orderBy("window_start", "event_type"),
        con,
        WINDOWED_EVENT_COUNTS_SQL,
    )


def test_stream_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from mapbox_vector_tile_spark.streaming.windowed import windowed_event_counts

    import shutil

    src_dir = tmp_path / "events_dir"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "part-0.parquet")
    static = spark.read.parquet(str(src_dir))
    stream = spark.readStream.schema(static.schema).parquet(str(src_dir))
    out = str(tmp_path / "windowed")
    q = (
        windowed_event_counts(stream, watermark="30 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_x100)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_x100)
        for r in windowed_event_counts(static).collect()
    }
    # append-mode emits only watermark-closed windows; every emitted window
    # must match batch exactly, and most windows must have closed
    assert got
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= len(want) - 5  # at most the tail windows still open


def test_session_windows_match_classic_sessionization(spark):
    from mapbox_vector_tile_spark.streaming.windowed import (
        session_event_stats,
        session_event_stats_sql,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = [tuple(r) for r in session_event_stats(ev).collect()]
    want = [tuple(r) for r in con.sql(session_event_stats_sql()).fetchall()]
    assert got == want
    # sanity: sessions actually split (more sessions than users)
    assert len(got) > ev.select("user_id").distinct().count()
