"""Token-budget mixture planner: brute-force parity, saturation/cut/zero
rate regimes, apply-matches-plan, DuckDB mirror, plan shape."""

from collections import defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.mixture import (
    _MIX_MULT,
    _SPACE,
    mixture_plan,
    mixture_plan_sql,
    mixture_sample,
)

N_DOCS = 400
WEIGHTS = {"web": 500, "books": 250, "code": 150, "wiki": 100}
BUDGET = 120_000  # web's 50% share (60k) exceeds its ~51k supply -> saturates


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _brute(rows):
    avail = defaultdict(lambda: [0, 0])  # source -> [docs, toks]
    by_bucket = defaultdict(lambda: [0, 0])  # (source, bk) -> [docs, toks]
    for r in rows:
        num = int(r.doc_id[4:])
        bk = (num * _MIX_MULT) % _SPACE
        avail[r.source][0] += 1
        avail[r.source][1] += r.n_tok
        by_bucket[(r.source, bk)][0] += 1
        by_bucket[(r.source, bk)][1] += r.n_tok
    out = {}
    for s, (ad, at) in avail.items():
        w = WEIGHTS.get(s, 0)
        target = (BUDGET * w) // _SPACE
        rate = 0 if at <= 0 else min(_SPACE, (_SPACE * target) // at)
        kd = sum(v[0] for (src, bk), v in by_bucket.items() if src == s and bk < rate)
        kt = sum(v[1] for (src, bk), v in by_bucket.items() if src == s and bk < rate)
        out[s] = (w, ad, at, target, rate, kd, kt)
    return out


def test_matches_brute_force(tokens):
    want = _brute(tokens.select("doc_id", "source", "n_tok").collect())
    got = {
        r.source: (
            r.weight_permille,
            r.avail_docs,
            r.avail_tokens,
            r.target_tokens,
            r.rate_permille,
            r.kept_docs,
            r.kept_tokens,
        )
        for r in mixture_plan(tokens, WEIGHTS, BUDGET).collect()
    }
    assert got == want


def test_rate_regimes(tokens):
    rows = {r.source: r for r in mixture_plan(tokens, WEIGHTS, BUDGET).collect()}
    # web's 50% share of the budget exceeds its supply -> saturates
    assert rows["web"].rate_permille == _SPACE
    assert rows["web"].kept_docs == rows["web"].avail_docs
    # fractional sources are genuinely cut
    for s in ("books", "code", "wiki"):
        assert 0 < rows[s].rate_permille < _SPACE, s
        assert rows[s].kept_docs < rows[s].avail_docs, s
        # floor-rate invariant: the rate never promises more than target
        assert (
            rows[s].rate_permille * rows[s].avail_tokens
            <= _SPACE * rows[s].target_tokens
        ), s
    # unweighted source -> rate 0, nothing kept, still reported
    assert rows["forum"].rate_permille == 0
    assert rows["forum"].kept_docs == 0
    assert rows["forum"].avail_docs > 0


def test_sample_matches_plan(tokens):
    plan = {
        r.source: (r.kept_docs, r.kept_tokens)
        for r in mixture_plan(tokens, WEIGHTS, BUDGET).collect()
    }
    got = {
        r.source: (r.d, r.t)
        for r in mixture_sample(tokens, WEIGHTS, BUDGET)
        .groupBy("source")
        .agg(F.count("*").alias("d"), F.sum("n_tok").alias("t"))
        .collect()
    }
    want = {s: v for s, v in plan.items() if v[0] > 0}
    assert got == want


def test_matches_duckdb(tokens):
    got = [tuple(r) for r in mixture_plan(tokens, WEIGHTS, BUDGET).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    want = con.execute(mixture_plan_sql(WEIGHTS, BUDGET)).fetchall()
    assert got == want


def test_plan_shape(tokens):
    plan = (
        mixture_plan(tokens, WEIGHTS, BUDGET)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    sampled = mixture_sample(tokens, WEIGHTS, BUDGET)
    splan = sampled._jdf.queryExecution().executedPlan().toString()
    # the corpus side never shuffles to apply the plan: rates broadcast
    assert "BroadcastHashJoin" in splan
    assert "EvalPython" not in splan
