"""Bucketed (SMB) tables: the co-located join must run with ZERO exchange,
and silently-degrading misconfigurations must be visible in the plan."""

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.bucketed import (
    bucketed_join,
    write_doc_join_pair,
)

N_DOCS = 400


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    tokens = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    docs = spark.createDataFrame(
        [(i, 10 * i + 3, "en" if i % 3 else "de") for i in range(N_DOCS)],
        "doc_id long, n_chars long, lang string",
    )
    base = str(tmp_path_factory.mktemp("bkt"))
    names = write_doc_join_pair(spark, tokens, docs, base)
    return names, tokens, docs


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_zero_exchange(spark, pair):
    (t_stats, t_meta), _, _ = pair
    j = bucketed_join(spark, t_stats, t_meta)
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    # the whole point: bucket layout is trusted, nothing shuffles
    assert "Exchange" not in plan, plan


def test_bucketed_join_correct(spark, pair):
    (t_stats, t_meta), tokens, docs = pair
    got = {
        r.doc_num: (r.n_tok, r.n_chars)
        for r in bucketed_join(spark, t_stats, t_meta).collect()
    }
    want_tok = {
        int(r.doc_id[4:]): r.n_tok
        for r in tokens.select("doc_id", "n_tok").collect()
    }
    want_chars = {r.doc_id: r.n_chars for r in docs.collect()}
    assert len(got) == N_DOCS
    for d, (nt, nc) in got.items():
        assert nt == want_tok[d] and nc == want_chars[d]


def test_mismatched_bucket_count_falls_back_to_shuffle(spark, pair, tmp_path):
    """Contract check: a table bucketed with a DIFFERENT count cannot join
    shuffle-free — Spark must (and does) re-shuffle one side rather than
    produce wrong results."""
    (t_stats, _), _, docs = pair
    from mapbox_vector_tile_spark.engine.bucketed import write_bucketed

    other = docs.select(
        F.col("doc_id").alias("doc_num"), "n_chars", "lang"
    )
    write_bucketed(
        other, "mvt_meta_odd_b", str(tmp_path / "odd"), "doc_num", 5
    )
    j = spark.table(t_stats).hint("merge").join(
        spark.table("mvt_meta_odd_b"), "doc_num"
    )
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" in plan  # the fallback is visible, not silent
    assert j.count() == N_DOCS
