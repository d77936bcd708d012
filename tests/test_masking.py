"""Deterministic span-corruption masks: brute-force parity, DuckDB
mirror, rate behavior, plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.masking import (
    _DOC_MIX,
    _DOC_SPACE,
    _MASK_MULT,
    _MIX_SPACE,
    _SPACE,
    span_corruption_sql,
    span_corruption_summary,
)
from mapbox_vector_tile_spark.corpus import MOD

N_DOCS = 300
SPAN, RATE = 3, 150


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _masked(dn: int, j: int) -> bool:
    mix = ((dn % _DOC_SPACE) * _DOC_MIX + j // SPAN) % _MIX_SPACE
    return (mix * _MASK_MULT) % _SPACE < RATE


def test_matches_brute_force(tokens):
    got = {
        r.doc_id: (r.n_masked, r.masked_cks)
        for r in span_corruption_summary(tokens, SPAN, RATE).collect()
    }
    any_masked = 0
    for r in tokens.collect():
        dn = int(r.doc_id.split("-")[1])
        m = [(j, t) for j, t in enumerate(r.tokens) if _masked(dn, j)]
        cks = sum((j + 1) * t for j, t in m) % MOD
        assert got[r.doc_id] == (len(m), cks), r.doc_id
        any_masked += bool(m)
    assert any_masked > 100  # the mask really fires across the corpus


def test_matches_duckdb(tokens):
    got = [
        (r.doc_id, r.n_tok, r.n_masked, r.masked_cks)
        for r in span_corruption_summary(tokens, SPAN, RATE).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    assert got == con.execute(span_corruption_sql(SPAN, RATE)).fetchall()


def test_rate_monotone_and_spans_contiguous(tokens):
    row = tokens.filter(F.col("n_tok") > 500).first()
    dn = int(row.doc_id.split("-")[1])
    flags = [_masked(dn, j) for j in range(row.n_tok)]
    # span-granular: all positions within one span agree
    for s in range(0, len(flags) - SPAN, SPAN):
        assert len(set(flags[s : s + SPAN])) == 1
    # rate 0 masks nothing, rate 1000 masks everything
    z = span_corruption_summary(tokens, SPAN, 0).agg(
        F.sum("n_masked")
    ).first()[0]
    assert z == 0
    full = span_corruption_summary(tokens, SPAN, _SPACE)
    r = full.agg(F.sum("n_masked"), F.sum("n_tok")).first()
    assert r[0] == r[1]


def test_plan_is_pure_catalyst(tokens):
    plan = (
        span_corruption_summary(tokens, SPAN, RATE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "hashpartitioning" not in plan


def test_rejects_bad_params(tokens):
    with pytest.raises(ValueError):
        span_corruption_summary(tokens, 0, RATE)
    with pytest.raises(ValueError):
        span_corruption_summary(tokens, SPAN, 1001)
