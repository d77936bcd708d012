"""Multi-level OLAP aggregates: ROLLUP / CUBE grouping sets over events.

The hypertable-rollup shape: one pass produces every aggregation level
(per (type, hour), per type, grand total) instead of re-scanning per
level. Spark's ``rollup``/``cube`` compile to a single Expand + hash
aggregate — the map side emits one partial per grouping set, so the scan
cost is paid ONCE regardless of how many levels roll up, and every level
benefits from map-side combine. That is exactly the continuous-aggregate
maintenance shape a 100 TB metrics store wants (and what the reference's
per-tile → per-layer → per-feature stats accounting does at tile scale,
/root/reference/mapbox_vector_tile/optimise.py:20-57 aggregating usage
counts across nesting levels).

All measures are exact integers (counts + value cents); grouping levels
are disambiguated by ``grouping_id`` so the oracle's ``GROUPING()`` bits
can be compared hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _base(events: DataFrame) -> DataFrame:
    ts = F.col("ts").cast("timestamp")
    return events.select(
        "event_type",
        F.floor(F.unix_timestamp(ts) / 3600).cast("long").alias("hour_bucket"),
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )


def _agg(grouped) -> DataFrame:
    return grouped.agg(
        F.grouping_id().cast("long").alias("grouping_id"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value_c").alias("sum_value_c"),
        F.min("value_c").alias("min_value_c"),
        F.max("value_c").alias("max_value_c"),
    ).orderBy("grouping_id", "event_type", "hour_bucket")


def events_rollup(events: DataFrame) -> DataFrame:
    """ROLLUP (event_type, hour): leaf cells, per-type subtotals, grand
    total — one Expand+aggregate pass."""
    return _agg(_base(events).rollup("event_type", "hour_bucket"))


def events_cube(events: DataFrame) -> DataFrame:
    """CUBE (event_type, hour): all four grouping sets, including the
    per-hour-across-types slice a ROLLUP skips."""
    return _agg(_base(events).cube("event_type", "hour_bucket"))


_SQL_BODY = """
WITH base AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events)
SELECT event_type, hour_bucket,
       CAST(GROUPING(event_type) * 2 + GROUPING(hour_bucket) AS BIGINT)
         AS grouping_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
       MIN(value_c) AS min_value_c,
       MAX(value_c) AS max_value_c
FROM base
GROUP BY {sets} (event_type, hour_bucket)
ORDER BY grouping_id, event_type, hour_bucket
"""


def events_rollup_sql() -> str:
    """DuckDB oracle: GROUP BY ROLLUP with Spark's grouping_id bit order
    (first grouping column = most significant bit)."""
    return _SQL_BODY.format(sets="ROLLUP")


def events_cube_sql() -> str:
    return _SQL_BODY.format(sets="CUBE")
