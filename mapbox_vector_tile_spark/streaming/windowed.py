"""Event-time windowed aggregation with watermark (Structured Streaming).

The reference has no streaming (SURVEY §2.7); a training-data pipeline does —
ingest metrics / lineage events arrive as a stream. Standard shape:
``readStream -> withWatermark -> groupBy(window(ts), key) -> agg`` with late
rows beyond the watermark dropped. The same plan runs in batch mode for the
oracle (and for the driver's correctness gate): event-time windows are pure
functions of the data, so batch output == streaming output once the stream
is drained (verified in tests with availableNow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Counts + value sums per (event-time window, event_type).

    Works on both batch and streaming DataFrames; pass ``watermark`` for
    streaming so state for closed windows is evicted.
    """
    # watermarks require TIMESTAMP (not NTZ); cast on both batch and stream
    # paths so results stay identical (session tz is UTC in this harness)
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # per-value fixed-point BEFORE summing: integer sums are
            # order-independent, so batch == stream == DuckDB exactly
            F.sum(F.floor(F.col("value").cast("double") * 100).cast("long"))
            .alias("sum_value_x100"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_x100",
        )
    )


WINDOWED_EVENT_COUNTS_SQL = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_x100
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""
