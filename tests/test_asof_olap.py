"""As-of join (union-and-window) and ROLLUP/CUBE grouping sets:
brute-force parity, tie semantics, plan shape."""

import datetime

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions.asof import asof_join_events
from mapbox_vector_tile_spark.functions.olap import events_cube, events_rollup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df.cache().count()
    return df


def test_asof_bruteforce_parity(events):
    rows = events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    ).collect()
    refs = {}
    for r in rows:
        if r.event_type == "error":
            refs.setdefault(r.user_id, []).append(r)
    got = {r.event_id: r for r in asof_join_events(events).collect()}
    probes = [r for r in rows if r.event_type == "click"]
    assert len(got) == len(probes) > 0
    for p in probes:
        cands = [r for r in refs.get(p.user_id, []) if r.ts_us <= p.ts_us]
        g = got[p.event_id]
        if not cands:
            assert g.ref_event_id is None and g.lag_us is None
            continue
        best_ts = max(r.ts_us for r in cands)
        best = max(
            (r for r in cands if r.ts_us == best_ts), key=lambda r: r.event_id
        )
        assert g.ref_event_id == best.event_id
        assert g.ref_ts_us == best.ts_us
        assert g.ref_value_c == best.value_c
        assert g.lag_us == p.ts_us - best.ts_us >= 0


def test_asof_tie_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # two refs at the SAME (user, ts): max event_id must win
        (1, t0, 7, "error", 1.00, ""),
        (2, t0, 7, "error", 2.00, ""),
        # probe exactly AT the ref ts: matches (>= convention)
        (3, t0, 7, "click", 0.0, ""),
        # probe before any ref: NULL
        (4, t0 - datetime.timedelta(seconds=1), 7, "click", 0.0, ""),
        # later ref supersedes for a later probe
        (5, t0 + datetime.timedelta(seconds=5), 7, "error", 3.00, ""),
        (6, t0 + datetime.timedelta(seconds=9), 7, "click", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    out = {r.event_id: r for r in asof_join_events(ev).collect()}
    assert out[3].ref_event_id == 2 and out[3].ref_value_c == 200
    assert out[3].lag_us == 0
    assert out[4].ref_event_id is None
    assert out[6].ref_event_id == 5 and out[6].lag_us == 4_000_000


def test_asof_plan_no_pair_explosion(events):
    plan = asof_join_events(events)._jdf.queryExecution().executedPlan().toString()
    # the whole point of the union-and-window form: never a range join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Window" in plan


def test_rollup_level_consistency(events):
    rows = events_rollup(events).collect()
    leaves = [r for r in rows if r.grouping_id == 0]
    subtotals = {r.event_type: r for r in rows if r.grouping_id == 1}
    totals = [r for r in rows if r.grouping_id == 3]
    assert len(totals) == 1
    total = totals[0]
    assert total.event_type is None and total.hour_bucket is None
    assert total.n_events == sum(r.n_events for r in leaves) == events.count()
    assert total.sum_value_c == sum(r.sum_value_c for r in leaves)
    for et, s in subtotals.items():
        mine = [r for r in leaves if r.event_type == et]
        assert s.n_events == sum(r.n_events for r in mine)
        assert s.sum_value_c == sum(r.sum_value_c for r in mine)
        assert s.min_value_c == min(r.min_value_c for r in mine)
        assert s.max_value_c == max(r.max_value_c for r in mine)


def test_cube_adds_hour_slice(events):
    cube = events_cube(events).collect()
    rollup_ids = {r.grouping_id for r in events_rollup(events).collect()}
    cube_ids = {r.grouping_id for r in cube}
    # grouping_id 2 = (hour kept, type rolled up): cube-only slice
    assert cube_ids - rollup_ids == {2}
    hour_slice = [r for r in cube if r.grouping_id == 2]
    leaves = [r for r in cube if r.grouping_id == 0]
    for h in hour_slice:
        mine = [r for r in leaves if r.hour_bucket == h.hour_bucket]
        assert h.n_events == sum(r.n_events for r in mine)


def test_cube_single_expand_pass(events):
    plan = events_cube(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    # one scan feeds every grouping level: the source appears once
    assert plan.count("parquet") <= plan.count("Expand") + 2


def test_funnel_bruteforce(events):
    from mapbox_vector_tile_spark.functions.olap import funnel_progression

    rows = events.select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_type))
    depths = {0: 0, 1: 0, 2: 0, 3: 0}
    for evs in by_user.values():
        s1 = min((t for t, e in evs if e == "view"), default=None)
        s2 = (
            min((t for t, e in evs if e == "click" and t > s1), default=None)
            if s1 is not None else None
        )
        s3 = (
            min(
                (t for t, e in evs if e == "purchase" and t > s2),
                default=None,
            )
            if s2 is not None else None
        )
        depths[3 if s3 else 2 if s2 else 1 if s1 else 0] += 1
    got = {r.step: r.n_users for r in funnel_progression(events).collect()}
    for step in range(4):
        want = sum(n for d, n in depths.items() if d >= step)
        assert got[step] == want, (step, got, depths)
    assert got[0] >= got[1] >= got[2] >= got[3]


def test_funnel_single_user_shuffle(events):
    from mapbox_vector_tile_spark.functions.olap import funnel_progression

    plan = (
        funnel_progression(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the three step windows + the per-user aggregate share ONE hash
    # partitioning on user_id
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_cohort_retention_bruteforce(events):
    from mapbox_vector_tile_spark.functions.olap import (
        _WEEK_US,
        cohort_retention,
    )

    rows = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).collect()
    weeks = {}
    for r in rows:
        weeks.setdefault(r.user_id, set()).add(r.ts_us // _WEEK_US)
    cells = {}
    cohorts = {}
    for u, ws in weeks.items():
        c = min(ws)
        cohorts.setdefault(c, set()).add(u)
        for w in ws:
            cells.setdefault((c, w - c), set()).add(u)
    got = cohort_retention(events).collect()
    assert len(got) == len(cells)
    for r in got:
        assert r.n_active == len(cells[(r.cohort_week, r.week_offset)])
        assert r.cohort_size == len(cohorts[r.cohort_week])


def test_bounded_funnel_never_exceeds_unbounded(events):
    from mapbox_vector_tile_spark.functions.olap import funnel_progression

    free = {r.step: r.n_users for r in funnel_progression(events).collect()}
    hour = {
        r.step: r.n_users
        for r in funnel_progression(events, horizon_us=3_600_000_000).collect()
    }
    for step in range(4):
        assert hour[step] <= free[step]
    assert hour[0] == free[0]  # step 0 (all users) is horizon-independent


def test_bounded_funnel_bruteforce(events):
    from mapbox_vector_tile_spark.functions.olap import funnel_progression

    H = 3_600_000_000
    rows = events.select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_type))
    depths = {0: 0, 1: 0, 2: 0, 3: 0}
    for evs in by_user.values():
        s1 = min((t for t, e in evs if e == "view"), default=None)
        s2 = (
            min(
                (t for t, e in evs
                 if e == "click" and s1 < t <= s1 + H),
                default=None,
            )
            if s1 is not None else None
        )
        s3 = (
            min(
                (t for t, e in evs
                 if e == "purchase" and s2 < t <= s2 + H),
                default=None,
            )
            if s2 is not None else None
        )
        depths[3 if s3 else 2 if s2 else 1 if s1 else 0] += 1
    got = {
        r.step: r.n_users
        for r in funnel_progression(events, horizon_us=H).collect()
    }
    for step in range(4):
        assert got[step] == sum(n for d, n in depths.items() if d >= step)


def test_pivot_hourly_no_distinct_prescan(events):
    from mapbox_vector_tile_spark.functions.olap import (
        EVENT_TYPES,
        events_pivot_hourly,
    )

    df = events_pivot_hourly(events)
    rows = df.collect()
    # row sums reconcile with the raw table (zero-filled cells included)
    total = sum(
        sum(getattr(r, f"n_{t}") for t in EVENT_TYPES) for r in rows
    )
    assert total == events.count()
    # explicit value universe -> a single aggregate job, no distinct
    # pre-scan: the physical plan scans the source exactly once
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes both
    assert final.count("FileScan parquet") == 1, final
