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

from pyspark.sql import DataFrame, Window, functions as F


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


# ---------------------------------------------------------------------------
# funnel analysis: ordered step progression per user
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def _ts_us():
    return F.unix_micros(F.col("ts").cast("timestamp"))


def funnel_progression(
    events: DataFrame, horizon_us: int | None = None
) -> DataFrame:
    """How far each user progresses through ``view -> click -> purchase``
    in strict time order: step k counts only events AFTER the user's
    step-(k-1) entry time (the standard ordered-funnel semantics).
    With ``horizon_us`` each step must also land WITHIN that many
    microseconds of the previous step's entry — the conversion-window
    form ("purchased within a day of clicking"); expired journeys stop
    counting, exactly like windowFunnel in production event stores.

    One shuffle total: every step is a conditional ``MIN(ts) OVER
    (PARTITION BY user_id)`` — the three window passes share one hash
    partitioning and sort, chained selects add no exchange (plan-asserted
    in tests). Per-user state is three timestamps, never an event list,
    so a 10^12-event funnel is the same plan with more partitions.

    Returns ``(step, step_name, n_users)`` with step 0 = all users seen;
    counts are cumulative (a purchase-step user is also in steps 1-2).
    """
    w = Window.partitionBy("user_id")
    ev = events.select("user_id", "event_type", _ts_us().alias("ts_us"))
    s1 = F.min(
        F.when(F.col("event_type") == FUNNEL_STEPS[0], F.col("ts_us"))
    ).over(w)
    ev = ev.withColumn("s1", s1)
    def _within(prev):
        cond = F.col("ts_us") > F.col(prev)
        if horizon_us is not None:
            cond = cond & (F.col("ts_us") <= F.col(prev) + int(horizon_us))
        return cond

    s2 = F.min(
        F.when(
            (F.col("event_type") == FUNNEL_STEPS[1]) & _within("s1"),
            F.col("ts_us"),
        )
    ).over(w)
    ev = ev.withColumn("s2", s2)
    s3 = F.min(
        F.when(
            (F.col("event_type") == FUNNEL_STEPS[2]) & _within("s2"),
            F.col("ts_us"),
        )
    ).over(w)
    per_user = (
        ev.withColumn("s3", s3)
        .groupBy("user_id")
        .agg(
            F.first("s1").alias("s1"),
            F.first("s2").alias("s2"),
            F.first("s3").alias("s3"),
        )
    )
    depth = (
        F.when(F.col("s3").isNotNull(), 3)
        .when(F.col("s2").isNotNull(), 2)
        .when(F.col("s1").isNotNull(), 1)
        .otherwise(0)
    )
    counts = per_user.select(depth.alias("depth")).groupBy("depth").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    steps = counts.sparkSession.createDataFrame(
        [(i, name) for i, name in enumerate(("any",) + FUNNEL_STEPS)],
        "step int, step_name string",
    )
    return (
        steps.join(counts, counts.depth >= steps.step, "left")
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_users"))
        .select(F.col("step").cast("long").alias("step"), "step_name", "n_users")
        .orderBy("step")
    )


def funnel_progression_sql(horizon_us: int | None = None) -> str:
    v, c, p = FUNNEL_STEPS
    b1 = f" AND ts_us <= s1 + {int(horizon_us)}" if horizon_us else ""
    b2 = f" AND ts_us <= s2 + {int(horizon_us)}" if horizon_us else ""
    return f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
w1 AS (
  SELECT *, MIN(CASE WHEN event_type = '{v}' THEN ts_us END)
              OVER (PARTITION BY user_id) AS s1 FROM ev),
w2 AS (
  SELECT *, MIN(CASE WHEN event_type = '{c}' AND ts_us > s1{b1}
              THEN ts_us END)
              OVER (PARTITION BY user_id) AS s2 FROM w1),
w3 AS (
  SELECT *, MIN(CASE WHEN event_type = '{p}' AND ts_us > s2{b2}
              THEN ts_us END)
              OVER (PARTITION BY user_id) AS s3 FROM w2),
per_user AS (
  SELECT user_id, MIN(s1) AS s1, MIN(s2) AS s2, MIN(s3) AS s3
  FROM w3 GROUP BY user_id),
depths AS (
  SELECT CASE WHEN s3 IS NOT NULL THEN 3 WHEN s2 IS NOT NULL THEN 2
              WHEN s1 IS NOT NULL THEN 1 ELSE 0 END AS depth
  FROM per_user),
steps AS (
  SELECT * FROM (VALUES (0, 'any'), (1, '{v}'), (2, '{c}'), (3, '{p}'))
    s(step, step_name))
SELECT CAST(s.step AS BIGINT) AS step, s.step_name,
       CAST(COUNT(d.depth) AS BIGINT) AS n_users
FROM steps s LEFT JOIN depths d ON d.depth >= s.step
GROUP BY s.step, s.step_name ORDER BY step
"""


# ---------------------------------------------------------------------------
# cohort retention: first-touch week x activity-week offsets
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly retention triangle: users grouped by first-event week
    (cohort), counted once per later active week offset::

        (cohort_week, week_offset, n_active, cohort_size)

    Per-user first-touch is a window MIN over the same user_id
    partitioning the activity distinct reuses; the final aggregate is a
    count-distinct bounded by (cohorts x offsets) cells. Integer weeks
    from epoch microseconds — no calendar/timezone dependence.
    """
    w = Window.partitionBy("user_id")
    # integer div, not float floor: the quotient's distance to an integer
    # boundary (1/WEEK_US ~ 1.6e-12) is within double rounding error here
    ts = _ts_us()
    week = ((ts - F.pmod(ts, F.lit(_WEEK_US))) / _WEEK_US).cast("long")
    ev = events.select("user_id", week.alias("week"))
    act = (
        ev.withColumn("cohort_week", F.min("week").over(w))
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    sizes = act.filter(F.col("week_offset") == 0).groupBy(
        "cohort_week"
    ).agg(F.count(F.lit(1)).cast("long").alias("cohort_size"))
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
        .join(sizes, "cohort_week")
        .select("cohort_week", "week_offset", "n_active", "cohort_size")
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id,
         CAST(epoch_us(ts) // {_WEEK_US} AS BIGINT) AS week
  FROM events),
act AS (
  SELECT DISTINCT user_id,
         MIN(week) OVER (PARTITION BY user_id) AS cohort_week,
         week - MIN(week) OVER (PARTITION BY user_id) AS week_offset
  FROM ev),
sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM act WHERE week_offset = 0 GROUP BY cohort_week)
SELECT a.cohort_week, a.week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active,
       s.cohort_size
FROM act a JOIN sizes s USING (cohort_week)
GROUP BY a.cohort_week, a.week_offset, s.cohort_size
ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# exact grouped quantiles: per-type value percentiles via tiny histograms
# ---------------------------------------------------------------------------


def event_value_quantiles(
    events: DataFrame, pcts: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """Exact discrete percentiles of event value (cents) per event type::

        (event_type, pct, value_c)

    Spark's ``percentile_approx`` is approximate and engine-specific; the
    exact-and-portable form is the histogram-cumulative rule
    `doc_length_quantiles` already uses, grouped: one (type, value)
    histogram (bounded by DISTINCT values per type, not events — map-side
    combinable), a cumulative window per type over that tiny table, and
    the integer compare ``100*cum >= total*pct``. Never a global sort of
    the raw events.
    """
    for p in pcts:
        if not 1 <= int(p) <= 100:
            raise ValueError(f"pct out of [1, 100]: {p}")
    hist = (
        events.select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("value_c"),
        )
        .groupBy("event_type", "value_c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "event_type", "value_c", F.sum("n").over(w).alias("cum")
    )
    totals = hist.groupBy("event_type").agg(F.sum("n").alias("total"))
    pct_col = F.explode(
        F.array(*[F.lit(int(p)) for p in pcts])
    ).alias("pct")
    return (
        cum.join(totals, "event_type")
        .select("event_type", "value_c", "cum", "total", pct_col)
        .where(F.col("cum") * 100 >= F.col("total") * F.col("pct"))
        .groupBy("event_type", "pct")
        .agg(F.min("value_c").alias("value_c"))
        .select(
            "event_type",
            F.col("pct").cast("long").alias("pct"),
            "value_c",
        )
        .orderBy("event_type", "pct")
    )


def event_value_quantiles_sql(pcts: tuple[int, ...] = (50, 90, 99)) -> str:
    pct_values = ", ".join(f"({int(p)})" for p in pcts)
    return f"""
WITH hist AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, value_c),
cum AS (
  SELECT event_type, value_c,
         SUM(n) OVER (PARTITION BY event_type ORDER BY value_c
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist),
totals AS (
  SELECT event_type, SUM(n) AS total FROM hist GROUP BY event_type),
pcts(pct) AS (VALUES {pct_values})
SELECT c.event_type, CAST(p.pct AS BIGINT) AS pct,
       CAST(MIN(c.value_c) AS BIGINT) AS value_c
FROM cum c JOIN totals t USING (event_type) CROSS JOIN pcts p
WHERE c.cum * 100 >= t.total * p.pct
GROUP BY c.event_type, p.pct
ORDER BY event_type, pct
"""


# ---------------------------------------------------------------------------
# grouped top-k: highest-value events per user without a global sort
# ---------------------------------------------------------------------------


def top_events_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Top ``k`` events by value per user (ties to the smaller event_id):
    the rank-then-filter form Catalyst compiles to ``WindowGroupLimit`` —
    each partition keeps a k-row heap per group DURING the shuffle read,
    so no group is ever fully sorted or materialized (plan-asserted).

    Returns ``(user_id, rnk, event_id, value_c)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("value_c").desc(), F.col("event_id").asc()
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("value_c"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("user_id", "rnk", "event_id", "value_c")
        .orderBy("user_id", "rnk")
    )


def top_events_per_user_sql(k: int = 3) -> str:
    return f"""
WITH ranked AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS value_c,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY CAST(round(value * 100) AS BIGINT) DESC,
                       event_id ASC) AS BIGINT) AS rnk
  FROM events)
SELECT user_id, rnk, event_id, value_c
FROM ranked WHERE rnk <= {k}
ORDER BY user_id, rnk
"""


# ---------------------------------------------------------------------------
# pivot: long -> wide reshaping with an explicit column universe
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_hourly(events: DataFrame) -> DataFrame:
    """Hour x event-type matrix: one row per hour, one count column per
    type — the long-to-wide reshape dashboards read directly.

    The value universe is EXPLICIT (``pivot(col, values)``): Spark then
    compiles the pivot to one pass of conditional aggregates with
    map-side combine and NO distinct-values pre-scan — the form that
    survives 100 TB. An open-universe ``pivot(col)`` would first run a
    distinct job and embed whatever it found in the schema: that is a
    correctness hazard across snapshots (schema depends on data), not
    just a perf one, so this engine always pins the universe.
    """
    ts = F.col("ts").cast("timestamp")
    base = events.select(
        F.floor(F.unix_timestamp(ts) / 3600)
        .cast("long")
        .alias("hour_bucket"),
        "event_type",
    )
    out = (
        base.groupBy("hour_bucket")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("hour_bucket")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return out.select(*cols).orderBy("hour_bucket")


def events_pivot_hourly_sql() -> str:
    conds = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
        f" AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
       {conds}
FROM events GROUP BY 1 ORDER BY hour_bucket
"""
