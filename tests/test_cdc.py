"""Content-defined chunking: brute-force parity, shift robustness,
DuckDB mirror, plan shape."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark import corpus as C
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.cdc import B, D, MOD, W, cdc_boundaries, cdc_boundaries_sql

N_DOCS = 300


@pytest.fixture(scope="module")
def tokens(spark):
    df = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    df.cache().count()
    return df


def _cuts(seq):
    out = []
    for j in range(W - 1, len(seq)):
        h = 0
        for d in range(W - 1, -1, -1):
            h = h * B + int(seq[j - d]) + 1
        if h % D == 0:
            out.append(j)
    return out


def _summary(seq):
    n = len(seq)
    if n == 0:
        return (0, 0, 0)
    cuts = _cuts(seq)
    lens = np.diff([-1] + cuts + [n - 1]).tolist()
    return (len(cuts) + 1, sum(j + 1 for j in cuts) % MOD, max(lens))


def test_matches_brute_force(tokens):
    got = {
        r.doc_id: (r.n_chunks, r.cut_cks, r.max_chunk)
        for r in cdc_boundaries(tokens).collect()
    }
    full = {r.doc_id: r.tokens for r in tokens.collect()}
    assert len(got) == N_DOCS
    n_with_cuts = 0
    for d, seq in full.items():
        assert got[d] == _summary(seq), d
        if got[d][0] > 1:
            n_with_cuts += 1
    assert n_with_cuts > 10  # boundaries actually occur in the corpus


def test_matches_duckdb(tokens):
    got = [
        (r.doc_id, r.n_tok, r.n_chunks, r.cut_cks, r.max_chunk)
        for r in cdc_boundaries(tokens).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    assert got == con.execute(cdc_boundaries_sql()).fetchall()


def test_boundaries_realign_after_prefix_insert(spark, tokens):
    # THE CDC property: prepending tokens only perturbs boundaries near
    # the edit; far boundaries realign at the same content positions
    row = (
        tokens.filter(F.col("n_tok") > 600).select("tokens").first()
    )
    seq = row.tokens
    shifted = [9991, 9992, 9993] + seq
    c1 = set(_cuts(seq))
    c2 = set(_cuts(shifted))
    realigned = {j - 3 for j in c2 if j >= W - 1 + 3}
    # every original boundary past the window is found again
    assert c1 - {j for j in c1 if j < W + 2} <= realigned


def test_plan_is_pure_catalyst(tokens):
    plan = (
        cdc_boundaries(tokens)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # no Python eval nodes anywhere
    # the only Exchange is the final presentation orderBy (range
    # partitioning for Sort) — never a hash/aggregate shuffle
    assert "hashpartitioning" not in plan
