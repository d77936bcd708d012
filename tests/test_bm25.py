"""Integer-exact BM25-family ranked retrieval served from the inverted
index: DuckDB parity, scoring semantics, plan shape, lengths-only scan."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark import corpus as C
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.encode import EncodeOptions, encode_dataframe
from mapbox_vector_tile_spark.engine.index import bm25_search, build_token_index
from mapbox_vector_tile_spark.engine.stats import doc_lengths

N_DOCS = 400
TERMS = [3, 42, 57]


@pytest.fixture(scope="module")
def corpus(spark):
    tokens = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    blocks = encode_dataframe(tokens, EncodeOptions())
    blocks.cache().count()
    index = build_token_index(tokens, lo=0, hi=63)
    index.cache().count()
    yield tokens, blocks, index
    blocks.unpersist()
    index.unpersist()


def _oracle(terms, k):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    return con.execute(C.bm25_search_sql(terms, k)).fetchall()


def test_doc_lengths_matches_tokens(corpus):
    tokens, blocks, _ = corpus
    got = {r.doc: r.n_tok for r in doc_lengths(blocks).collect()}
    want = {
        int(r.doc_id.split("-")[1]): r.n_tok
        for r in tokens.select("doc_id", "n_tok").collect()
    }
    assert got == want


def test_doc_lengths_never_reads_payload(corpus, tmp_path):
    # pruning is visible at a real scan: write blocks, read them back
    _, blocks, _ = corpus
    path = str(tmp_path / "blocks")
    blocks.write.parquet(path)
    stored = blocks.sparkSession.read.parquet(path)
    plan = (
        doc_lengths(stored)._jdf.queryExecution().executedPlan().toString()
    )
    assert "lengths_blob" in plan and "payload" not in plan


def test_bm25_matches_duckdb(corpus):
    _, blocks, index = corpus
    got = [
        (r.doc_id, r.score)
        for r in bm25_search(index, doc_lengths(blocks), TERMS, k=25).collect()
    ]
    assert got == _oracle(TERMS, 25)
    assert len(got) == 25
    # descending, total order
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)


def test_bm25_single_term_ranks_by_tf_within_equal_dl(corpus):
    _, blocks, index = corpus
    got = bm25_search(index, doc_lengths(blocks), [42], k=10).collect()
    assert got == sorted(
        got, key=lambda r: (-r.score, r.doc_id)
    )
    assert all(r.score > 0 for r in got)


def test_bm25_uses_top_k_finisher(corpus):
    _, blocks, index = corpus
    plan = (
        bm25_search(index, doc_lengths(blocks), TERMS, k=25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_bm25_rejects_bad_args(corpus):
    _, blocks, index = corpus
    with pytest.raises(ValueError):
        bm25_search(index, doc_lengths(blocks), [], k=5)
    with pytest.raises(ValueError):
        bm25_search(index, doc_lengths(blocks), [42], k=0)


def test_wand_equals_exhaustive_and_prunes(corpus, spark):
    """Block-max WAND returns the EXACT exhaustive BM25 top-k (pruning is
    lossless), and on a multi-segment index the segment upper bounds
    genuinely disqualify segments (the pruning opportunity is real)."""
    from mapbox_vector_tile_spark.engine.index import (
        bm25_wand_topk,
        build_block_max,
    )

    tokens, blocks, _ = corpus
    # small segments -> many per-term blocks -> bounds can discriminate
    idx = build_token_index(tokens, lo=0, hi=63, segment_docs=32)
    idx.cache().count()
    bm = build_block_max(idx)
    lengths = doc_lengths(blocks)
    try:
        for terms, k in (([5, 17, 33], 15), ([3, 42, 57], 25), ([7], 10)):
            want = [
                (r.doc_id, r.score)
                for r in bm25_search(idx, lengths, terms, k=k).collect()
            ]
            got = [
                (r.doc_id, r.score)
                for r in bm25_wand_topk(
                    idx, bm, lengths, terms, k=k
                ).collect()
            ]
            assert got == want, terms

        # the bounds discriminate: per-segment UBs for [5, 17, 33] spread
        # (not all equal), so a theta above the min UB drops segments
        ubs = [
            r.mx
            for r in bm.filter(F.col("tok").isin([5, 17, 33]))
            .groupBy("segment")
            .agg(F.sum("max_cnt").alias("mx"))
            .collect()
        ]
        assert len(ubs) > 3 and min(ubs) < max(ubs)
    finally:
        idx.unpersist()


def test_wand_k_larger_than_candidates(corpus):
    """k exceeding the candidate count disables pruning (no theta) and
    still returns every candidate, exhaustive-ranked."""
    from mapbox_vector_tile_spark.engine.index import (
        bm25_wand_topk,
        build_block_max,
    )

    tokens, blocks, idx = corpus
    lengths = doc_lengths(blocks)
    bm = build_block_max(idx)
    want = bm25_search(idx, lengths, [3], k=10_000).collect()
    got = bm25_wand_topk(idx, bm, lengths, [3], k=10_000).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]
