"""Scalar-column encode: roundtrip exactness, codec diversity, compression
wins on codec-friendly columns, parallelism invariance."""

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine.columnar import (
    decode_scalar_column,
    encode_scalar_column,
    scalar_roundtrip_rollup,
)


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", F.round(F.col("value") * 100).alias("value_c")
    )
    df.cache().count()
    return df


def test_roundtrip_values_and_order(spark, events):
    blocks = encode_scalar_column(events, "value_c", "event_id", 256)
    dec = decode_scalar_column(blocks)
    got = {
        (r.chunk, r.pos): r.value for r in dec.collect()
    }
    want_rows = sorted(
        (r.event_id, r.value_c) for r in events.collect()
    )
    by_chunk = {}
    for eid, v in want_rows:
        by_chunk.setdefault(eid // 256, []).append(v)
    want = {
        (c, i): v
        for c, vals in by_chunk.items()
        for i, v in enumerate(vals)
    }
    assert got == want


def test_codec_ladder_engages(spark):
    """Codec-friendly columns must not fall through to RAW: a constant
    column, a sorted column and a tiny-domain column each pick their
    specialist codec and beat raw bytes."""
    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.lit(7).alias("const_v"),
        F.col("id").alias("sorted_v"),
        (F.col("id") % 3).alias("dict_v"),
    )
    for col, want_better in (
        ("const_v", 50.0),
        ("sorted_v", 4.0),
        ("dict_v", 4.0),
    ):
        blocks = encode_scalar_column(df, col, "k", 1024).collect()
        codecs = {b.codec for b in blocks}
        assert codecs != {"RAW"}, (col, codecs)
        ratio = sum(b.bytes_raw for b in blocks) / sum(
            b.bytes_enc for b in blocks
        )
        assert ratio > want_better, (col, ratio, codecs)


def test_parallelism_invariance(spark, events):
    a = scalar_roundtrip_rollup(
        events.repartition(1), "value_c", "event_id", 256
    ).collect()
    b = scalar_roundtrip_rollup(
        events.repartition(7), "value_c", "event_id", 256
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_nullable_roundtrip_positions_and_values(spark):
    from mapbox_vector_tile_spark.engine.columnar import (
        decode_scalar_column_nullable,
        encode_scalar_column_nullable,
    )

    n = 3000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.pmod(F.col("id"), 7) == 0, F.lit(None))
        .otherwise(F.col("id") * 3)
        .cast("long")
        .alias("v"),
    )
    blocks = encode_scalar_column_nullable(df, "v", "k", 1024)
    dec = decode_scalar_column_nullable(blocks)
    got = {(r.chunk, r.pos): r.value for r in dec.collect()}
    want = {
        (i // 1024, i % 1024): (None if i % 7 == 0 else i * 3)
        for i in range(n)
    }
    assert got == want


def test_nullable_all_null_and_no_null_chunks(spark):
    from mapbox_vector_tile_spark.engine.columnar import (
        decode_scalar_column_nullable,
        encode_scalar_column_nullable,
    )

    # chunk 0 all null, chunk 1 no nulls
    df = spark.range(2048).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 1024, F.lit(None))
        .otherwise(F.lit(42))
        .cast("long")
        .alias("v"),
    )
    rows = encode_scalar_column_nullable(df, "v", "k", 1024).collect()
    by_chunk = {r.chunk: r for r in rows}
    assert by_chunk[0].n_values == 1024 and by_chunk[1].n_values == 1024
    # constant-when-present picks CONSTANT for the non-null chunk
    assert by_chunk[1].codec == "constant"
    dec = decode_scalar_column_nullable(
        encode_scalar_column_nullable(df, "v", "k", 1024)
    ).collect()
    nulls = sum(1 for r in dec if r.value is None)
    assert nulls == 1024
    assert all(r.value == 42 for r in dec if r.value is not None)
