"""Unigram-frequency quality screen: codec-pushdown counts + zero-shuffle
per-doc scoring, brute-force parity, exact-integer semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark import corpus as C
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.encode import encode_dataframe
from mapbox_vector_tile_spark.engine.stats import unigram_commonness

N_DOCS = 300
K = 32


@pytest.fixture(scope="module")
def scored(spark):
    tokens = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    blocks = encode_dataframe(tokens)
    return unigram_commonness(blocks, tokens, k=K)


def _brute_force():
    ids = np.arange(N_DOCS, dtype=np.int64)
    lengths, values = C.tokens_flat(ids)
    toks, counts = np.unique(values, return_counts=True)
    order = np.lexsort((toks, -counts))[:K]
    hot = dict(zip(toks[order].tolist(), counts[order].tolist()))
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    rows = {}
    for d, (s, ln) in zip(ids, zip(starts, lengths)):
        seg = values[s : s + ln]
        n_hot = sum(1 for t in seg.tolist() if t in hot)
        cnt = sum(hot.get(t, 0) for t in seg.tolist())
        pm = (1000 * n_hot) // int(ln) if ln > 0 else None
        rows[f"doc-{d:08d}"] = (n_hot, cnt, pm)
    return rows


def test_commonness_brute_force_parity(scored):
    expect = _brute_force()
    got = {
        r.doc_id: (r.n_hot, r.hot_cnt_sum, r.hot_permille)
        for r in scored.collect()
    }
    assert len(got) == N_DOCS
    assert got == expect


def test_commonness_empty_doc_is_null(scored):
    row = scored.filter(F.col("doc_id") == "doc-00000000").first()
    assert row.n_tok == 0
    assert row.n_hot == 0 and row.hot_cnt_sum == 0
    assert row.hot_permille is None


def test_commonness_scoring_pass_has_no_shuffle(scored):
    # the k-row counts are baked into a literal map at call time, so the
    # returned plan is corpus scan + one projection: no Exchange, no Python
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
