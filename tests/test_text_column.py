"""Text-column encode: roundtrip exactness + order, FSST/dict compression
wins on corpus text, duplicate-text dedup through the dictionary,
parallelism invariance of the deterministic chunk layout."""

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine.text_column import (
    decode_text_column,
    encode_text_column,
    text_roundtrip_rollup,
)


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    df.cache().count()
    return df


def test_roundtrip_text_and_order(spark, docs):
    blocks = encode_text_column(docs, "text", "doc_id", 64)
    dec = decode_text_column(blocks)
    got = {(r.chunk, r.pos): r.text for r in dec.collect()}
    want_rows = sorted((r.doc_id, r.text) for r in docs.collect())
    by_chunk = {}
    for did, t in want_rows:
        by_chunk.setdefault(did // 64, []).append(t)
    want = {
        (c, i): t for c, vals in by_chunk.items() for i, v in enumerate(vals)
        for t in [v]
    }
    assert got == want


def test_compression_beats_raw_on_corpus_text(spark, docs):
    """Word-soup corpus text must compress: the per-chunk dictionary plus
    the FSST symbol table have to beat raw utf-8 bytes by a real margin."""
    rows = encode_text_column(docs, "text", "doc_id", 256).collect()
    enc = sum(r.bytes_enc for r in rows)
    raw = sum(r.bytes_raw for r in rows)
    assert enc < raw * 0.8, (enc, raw)


def test_duplicate_texts_dedupe_through_dictionary(spark):
    """1024 rows of 4 distinct strings: the dictionary stores each string
    once, so encoded bytes are dominated by the bit-packed index stream."""
    df = spark.range(1024).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox payload "), (F.col("id") % 4)
        ).alias("text"),
    )
    rows = encode_text_column(df, "text", "doc_id", 1024).collect()
    assert len(rows) == 1
    r = rows[0]
    # raw ~ 29KB; dict holds 4 strings + 2-bit indices for 1024 rows (~256B)
    assert r.bytes_enc < r.bytes_raw // 10, (r.bytes_enc, r.bytes_raw)


def test_parallelism_invariance(spark, docs):
    a = text_roundtrip_rollup(docs.repartition(1), chunk_rows=128).collect()
    b = text_roundtrip_rollup(docs.repartition(7), chunk_rows=128).collect()
    assert a == b
