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


def session_event_stats(
    events: DataFrame, gap: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Per-user session windows (gap-based): Spark's native
    ``session_window`` — sessions merge while consecutive events arrive
    strictly within ``gap``; ``session_end = last_event + gap``.

    Works on batch and streaming frames (pass ``watermark`` for streaming
    state eviction). The oracle is classic lag/cumsum sessionization in
    SQL, proving the native operator's semantics against first principles.
    """
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.unix_timestamp(F.col("w.end")).alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


def session_event_stats_sql(gap_seconds: int = 3600) -> str:
    return f"""
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL {gap_seconds} SECOND
              THEN 1 ELSE 0 END AS new_s,
         event_id
  FROM events),
g AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM s)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
       CAST(FLOOR(epoch(MAX(ts))) + {gap_seconds} AS BIGINT) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


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
