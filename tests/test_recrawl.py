"""Recrawl delta screen: brute-force parity, DuckDB mirror, the CDC
realignment payoff (reuse survives a prefix edit), plan shape."""

from collections import Counter

import duckdb
import pytest

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.functions.cdc import (
    B,
    D,
    MOD,
    W,
    recrawl_delta_sql,
    recrawl_delta_stats,
)

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


def _chunks(seq):
    n = len(seq)
    if n == 0:
        return []
    out, a = [], -1
    for b in _cuts(seq) + [n - 1]:
        if b == a:  # last position is a cut: empty tail is not a chunk
            continue
        cks = (
            sum((int(seq[j]) + 1) * (j - a) for j in range(a + 1, b + 1))
            % MOD
        )
        out.append((b - a, cks))
        a = b
    return out


def _reuse(co, cn):
    o, n = Counter(co), Counter(cn)
    ch = sum(min(o[k], c) for k, c in n.items())
    tk = sum(k[0] * min(o[k], c) for k, c in n.items())
    return ch, tk


def test_matches_brute_force(tokens):
    got = {
        r.doc_id: (
            r.n_tok_old,
            r.n_tok_new,
            r.n_chunks_old,
            r.n_chunks_new,
            r.chunks_reused,
            r.tokens_reused,
        )
        for r in recrawl_delta_stats(tokens).collect()
    }
    full = {r.doc_id: r.tokens for r in tokens.collect()}
    assert len(got) == N_DOCS
    any_reused = 0
    for d, seq in full.items():
        co, cn = _chunks(seq), _chunks(seq[1:])
        ch, tk = _reuse(co, cn)
        want = (len(seq), max(len(seq) - 1, 0), len(co), len(cn), ch, tk)
        assert got[d] == want, d
        any_reused += ch
    assert any_reused > 0


def test_long_docs_realign(tokens):
    # THE point of content-defined chunks: after the prefix edit shifts
    # every position, the 8192-token outliers still reuse most of their
    # chunks (fixed-stride chunking would reuse none).
    rows = recrawl_delta_stats(tokens).collect()
    # regimes with near-constant windows may never hit the cut residue
    # (one chunk per doc -> the prefix edit rewrites it); the property is
    # about docs that DO chunk
    long_rows = [
        r for r in rows if r.n_tok_old == 8192 and r.n_chunks_new > 4
    ]
    assert long_rows
    for r in long_rows:
        assert r.tokens_reused * 2 > r.n_tok_new, r  # > half reused


def test_matches_duckdb(tokens):
    got = [
        (
            r.doc_id,
            r.n_tok_old,
            r.n_tok_new,
            r.n_chunks_old,
            r.n_chunks_new,
            r.chunks_reused,
            r.tokens_reused,
        )
        for r in recrawl_delta_stats(tokens).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    assert got == con.execute(recrawl_delta_sql()).fetchall()


def test_plan_is_pure_catalyst(tokens):
    plan = (
        recrawl_delta_stats(tokens)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    # row-local multiset intersection: no aggregate/join shuffle — the
    # only Exchange is the presentation orderBy's range partitioning
    assert "hashpartitioning" not in plan
