"""Suffix (last-k) truncation decode and adjacent-pair phrase search."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark import corpus as C
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.decode import (
    decode_dataframe,
    decode_suffix_dataframe,
)
from mapbox_vector_tile_spark.engine.encode import EncodeOptions, encode_dataframe
from mapbox_vector_tile_spark.engine.search import search_phrase

N_DOCS = 400
K = 64


@pytest.fixture(scope="module")
def blocks(spark):
    tokens = G.corpus_dataframe(spark, N_DOCS, num_partitions=4)
    b = encode_dataframe(tokens, EncodeOptions())
    b.cache().count()
    yield b
    b.unpersist()


@pytest.fixture(scope="module")
def full(blocks):
    return {r.doc_id: r for r in decode_dataframe(blocks).collect()}


def test_suffix_is_exact_tail(blocks, full):
    got = {r.doc_id: r for r in decode_suffix_dataframe(blocks, K).collect()}
    assert set(got) == set(full)
    for d, r in got.items():
        want = full[d].tokens[-K:] if full[d].n_tok else []
        assert r.tokens == want, d
        assert r.n_tok == full[d].n_tok  # original length preserved


def test_suffix_zero_k(blocks, full):
    got = decode_suffix_dataframe(blocks, 0).collect()
    assert all(r.tokens == [] for r in got)
    assert {r.doc_id: r.n_tok for r in got} == {
        d: r.n_tok for d, r in full.items()
    }


def test_suffix_oracle_sql_round(blocks, spark):
    # engine per-doc checksums vs the suffix-limited formula oracle
    from mapbox_vector_tile_spark.engine.verify import with_doc_checksums

    out = with_doc_checksums(decode_suffix_dataframe(blocks, K))
    got = {
        r.doc_id: (r.n_tok, r.tok_cks, r.tok_wcks)
        for r in out.collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT UNNEST(range({N_DOCS})) AS doc_id"
    )
    sql = C.per_doc_checksum_sql(
        "documents", string_doc_id=True, suffix_len=K
    )
    want = {
        r[0]: (r[2], r[3], r[4]) for r in con.execute(sql).fetchall()
    }
    assert got == want


def test_phrase_matches_brute_force(blocks, full):
    for x, y in [(10, 1), (92, 92), (9, 0)]:
        got = {
            r.doc_id: r.n_pairs for r in search_phrase(blocks, x, y).collect()
        }
        want = {}
        for d, r in full.items():
            t = r.tokens
            n = sum(
                1 for i in range(len(t) - 1) if t[i] == x and t[i + 1] == y
            )
            if n:
                want[d] = n
        assert got == want, (x, y)


def test_phrase_never_crosses_doc_boundary(spark):
    # doc A ends with 7, doc B starts with 8: pair (7, 8) must NOT match
    rows = [
        ("doc-00000000", [1, 2, 7], 3, "web"),
        ("doc-00000001", [8, 9], 2, "web"),
        ("doc-00000002", [5, 7, 8, 7, 8], 5, "web"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    b = encode_dataframe(df, EncodeOptions())
    got = {r.doc_id: r.n_pairs for r in search_phrase(b, 7, 8).collect()}
    assert got == {"doc-00000002": 2}


def test_phrase_same_token_runs(spark):
    # run of five 4s -> four overlapping (4, 4) pairs
    rows = [("doc-00000000", [4, 4, 4, 4, 4], 5, "web")]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    b = encode_dataframe(df, EncodeOptions())
    got = search_phrase(b, 4, 4).collect()
    assert len(got) == 1 and got[0].n_pairs == 4


def test_padded_rectangle(blocks, full):
    from mapbox_vector_tile_spark.engine.decode import decode_padded_dataframe

    K, PAD = 32, 7
    got = {r.doc_id: r for r in decode_padded_dataframe(blocks, K, PAD).collect()}
    assert set(got) == set(full)
    for d, r in got.items():
        src = full[d].tokens
        want = src[:K] + [PAD] * max(0, K - len(src))
        assert len(r.tokens) == K and r.tokens == want, d
        assert r.n_fill == min(len(src), K)
        assert r.n_tok == full[d].n_tok


def test_padded_rectangle_k_zero(blocks):
    from mapbox_vector_tile_spark.engine.decode import decode_padded_dataframe

    got = decode_padded_dataframe(blocks, 0, 7).collect()
    assert all(r.tokens == [] and r.n_fill == 0 for r in got)


def test_indexed_phrase_matches_blocks_scan(spark, blocks):
    from mapbox_vector_tile_spark.engine.decode import decode_dataframe
    from mapbox_vector_tile_spark.engine.index import (
        build_positional_index,
        phrase_search_indexed,
    )

    pindex = build_positional_index(decode_dataframe(blocks), lo=0, hi=99)
    pindex.cache().count()
    try:
        for x, y in [(10, 1), (92, 92), (9, 0), (2, 9)]:
            scan = {
                r.doc_id: r.n_pairs
                for r in search_phrase(blocks, x, y).collect()
            }
            idx = {
                r.doc_id: r.n_pairs
                for r in phrase_search_indexed(pindex, x, y).collect()
            }
            assert idx == scan, (x, y)
    finally:
        pindex.unpersist()


def test_positional_index_blob_roundtrip(spark, blocks, full):
    from mapbox_vector_tile_spark.engine.decode import decode_dataframe
    from mapbox_vector_tile_spark.engine.index import (
        _decode_positions,
        build_positional_index,
    )

    pindex = build_positional_index(decode_dataframe(blocks), lo=42, hi=42)
    got = {
        r.doc: r.ps for r in _decode_positions(pindex).collect()
    }
    want = {}
    for d, r in full.items():
        ps = [j for j, t in enumerate(r.tokens) if t == 42]
        if ps:
            want[int(d.split("-")[1])] = ps
    assert got == want
