"""Global shared dictionary: rank determinism, cross-chunk code equality,
roundtrip exactness, unknown-token fail-fast."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.codec import blocks as B
from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.encode import EncodeOptions, encode_dataframe
from mapbox_vector_tile_spark.engine.global_dict import (
    build_global_dict,
    decode_global_dict,
    encode_with_global_dict,
)


@pytest.fixture(scope="module")
def corpus_blocks(spark):
    tokens = G.corpus_dataframe(spark, 300, num_partitions=4)
    blocks = encode_dataframe(tokens, EncodeOptions())
    blocks.cache().count()
    tokens.cache().count()
    return tokens, blocks


def test_dict_is_frequency_ranked(spark, corpus_blocks):
    tokens, blocks = corpus_blocks
    gdict = build_global_dict(blocks).collect()
    want = (
        tokens.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .count()
        .orderBy(F.desc("count"), F.asc("tok"))
        .collect()
    )
    assert [(r.tok, r.n) for r in gdict] == [
        (r.tok, r["count"]) for r in want
    ]
    # dense rank space
    assert [r.code for r in gdict] == list(range(len(gdict)))


def test_cross_chunk_code_equality(spark, corpus_blocks):
    """The same token decodes to the same code in EVERY chunk."""
    _, blocks = corpus_blocks
    gdict = build_global_dict(blocks)
    coded = encode_with_global_dict(blocks, gdict)
    code_of = {r.tok: r.code for r in gdict.collect()}
    rows = coded.select("payload").collect()
    assert len(rows) > 1  # multiple chunks or the test is vacuous
    seen_codes = set()
    for r in rows:
        seen_codes.update(np.unique(B.decode_block(r.payload)).tolist())
    assert seen_codes <= set(code_of.values())


def test_roundtrip_exact(spark, corpus_blocks):
    tokens, blocks = corpus_blocks
    gdict = build_global_dict(blocks)
    coded = encode_with_global_dict(blocks, gdict)
    dec = decode_global_dict(coded, gdict)
    got = {r.doc_id: r.tokens for r in dec.collect()}
    want = {r.doc_id: r.tokens for r in tokens.collect()}
    assert got == want


def test_unknown_token_fails_fast(spark, corpus_blocks):
    _, blocks = corpus_blocks
    tiny = build_global_dict(blocks).filter(F.col("code") < 3)
    with pytest.raises(Exception, match="absent from global dictionary"):
        encode_with_global_dict(blocks, tiny).select("bytes_enc").collect()
