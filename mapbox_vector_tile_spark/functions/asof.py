"""As-of join: attach the most recent reference row at-or-before each probe.

The classic time-series operator Spark's join catalog lacks (DuckDB and kdb
ship it natively; Flink calls it a temporal join). Semantics: for every
probe row ``(key, ts)``, find the reference row with the same ``key`` and
the largest ``ref_ts <= ts`` — "what was the last error this user saw when
they clicked?".

Scale shape — the naive encodings both die at 100 TB:

- a range join (``probe.ts >= ref.ts`` + per-probe max) explodes to
  O(probes x refs-per-key) intermediate rows before the max prunes them;
- a windowed subquery per probe re-scans the reference side.

The implementation here is the union-and-window form: tag reference rows
``side=0`` and probe rows ``side=1``, union them, and run ONE window
``last_value(ref cols, ignorenulls) OVER (PARTITION BY key ORDER BY ts,
side)`` — every probe picks up the nearest preceding reference row in a
single pass. Exactly one shuffle (hash by key), intermediate size =
|probes| + |refs|, never their product; sort is per-key within the
window's partition. This is the plan shape a 1000-executor cluster wants:
both inputs co-partition on the join key and the window is
whole-stage-codegen'd JVM code.

Ties: references are deduplicated to one row per (key, ts) keeping the max
event_id (so equal-timestamp refs are deterministic), and a probe whose ts
EQUALS a reference ts matches it (``side`` orders refs first) — the same
``>=`` convention DuckDB's ``ASOF JOIN`` uses, which is the oracle.

Analog surface: the reference resolves each feature against the most
recent applicable layer options when encoding
(/root/reference/mapbox_vector_tile/encoder.py:118-141 cascades
per-layer/per-call options); here the cascade is along event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: fixed probe/reference event types for the gated demo query
PROBE_TYPE = "click"
REF_TYPE = "error"


def asof_join_events(
    events: DataFrame,
    probe_type: str = PROBE_TYPE,
    ref_type: str = REF_TYPE,
) -> DataFrame:
    """For each ``probe_type`` event, the latest ``ref_type`` event of the
    same user at-or-before it: union-and-window as-of join.

    Returns one row per probe event::

        (event_id, user_id, ts_us, ref_event_id, ref_ts_us, ref_value_c,
         lag_us)

    ``ts_us`` is epoch microseconds (exact integer), ``ref_value_c`` the
    reference's value in exact cents, ``lag_us`` the probe-minus-reference
    time distance; all three are NULL-free only where a reference exists
    (left as-of join: unmatched probes keep NULL ref columns).
    """
    ts_us = F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    base = events.select(
        "event_id",
        "user_id",
        ts_us,
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    # one reference per (user_id, ts): keep max event_id so equal-ts refs
    # are deterministic in both engines
    refs = (
        base.filter(F.col("event_type") == ref_type)
        .groupBy("user_id", "ts_us")
        .agg(
            F.max("event_id").alias("r_event_id"),
            F.max_by("value_c", "event_id").alias("r_value_c"),
        )
        .select(
            "user_id",
            "ts_us",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            "r_event_id",
            F.col("ts_us").alias("r_ts_us"),
            "r_value_c",
        )
    )
    probes = base.filter(F.col("event_type") == probe_type).select(
        "user_id",
        "ts_us",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("r_event_id"),
        F.lit(None).cast("long").alias("r_ts_us"),
        F.lit(None).cast("long").alias("r_value_c"),
    )
    # refs sort before probes at equal ts (side 0 < 1) -> ts_ref <= ts_probe
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = refs.unionByName(probes).select(
        "side",
        "event_id",
        "user_id",
        "ts_us",
        F.last("r_event_id", ignorenulls=True).over(w).alias("ref_event_id"),
        F.last("r_ts_us", ignorenulls=True).over(w).alias("ref_ts_us"),
        F.last("r_value_c", ignorenulls=True).over(w).alias("ref_value_c"),
    )
    return (
        joined.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "ref_event_id",
            "ref_ts_us",
            "ref_value_c",
            (F.col("ts_us") - F.col("ref_ts_us")).alias("lag_us"),
        )
        .orderBy("event_id")
    )


def asof_join_events_sql(
    probe_type: str = PROBE_TYPE, ref_type: str = REF_TYPE
) -> str:
    """DuckDB oracle: the native ``ASOF LEFT JOIN`` over the same
    deduplicated reference side."""
    return f"""
WITH base AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events),
refs AS (
  SELECT user_id, ts_us,
         MAX(event_id) AS r_event_id,
         arg_max(value_c, event_id) AS r_value_c
  FROM base WHERE event_type = '{ref_type}'
  GROUP BY user_id, ts_us),
probes AS (SELECT * FROM base WHERE event_type = '{probe_type}')
SELECT p.event_id, p.user_id, p.ts_us,
       r.r_event_id AS ref_event_id,
       r.ts_us AS ref_ts_us,
       r.r_value_c AS ref_value_c,
       p.ts_us - r.ts_us AS lag_us
FROM probes p
ASOF LEFT JOIN refs r
  ON p.user_id = r.user_id AND p.ts_us >= r.ts_us
ORDER BY p.event_id
"""
