"""Whole-table columnar encode: float64 BSS kernel exactness, wide
roundtrip bit-identity, per-column codec engagement, null fail-fast."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.codec.float64 import (
    F64_BSS,
    decode_float64,
    encode_float64_auto,
)
from mapbox_vector_tile_spark.engine.table_encode import (
    decode_table,
    encode_table,
)


def _f64_rt(a):
    a = np.asarray(a, np.float64)
    payload, mode = encode_float64_auto(a)
    out = decode_float64(payload)
    assert np.array_equal(a.view(np.uint64), out.view(np.uint64))
    return mode, len(payload)


def test_float64_kernel_edges():
    for a in (
        [],
        [np.nan],
        [np.inf, -np.inf, -0.0, 0.0, np.nan, 1e-308, 1.7e308, 5e-324],
    ):
        _f64_rt(a)


def test_float64_mode_selection():
    from mapbox_vector_tile_spark.codec.float64 import F64_ALP

    rng = np.random.default_rng(5)
    # cents-exact measures: the decimal path crushes byte-split
    mode, size = _f64_rt(rng.integers(0, 100_000, 8192) / 100.0)
    assert mode == F64_ALP and size < 8 * 8192 * 0.35
    # full-mantissa uniforms: no shared decimal exponent, BSS still wins
    mode, size = _f64_rt(rng.random(8192))
    assert mode == F64_BSS and size < 8 * 8192


@settings(max_examples=150, deadline=None)
@given(st.lists(st.floats(allow_nan=True, width=64), max_size=200))
def test_float64_kernel_hypothesis(xs):
    _f64_rt(xs)


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.cache().count()
    return df


def test_table_roundtrip_bit_exact(spark, events):
    blocks = encode_table(events, "event_id", 256)
    dec = decode_table(blocks, events.schema)
    got = {
        r.event_id: (r.ts_us, r.user_id, r.event_type, r.value, r.props)
        for r in dec.collect()
    }
    want = {
        r.event_id: (r.ts_us, r.user_id, r.event_type, r.value, r.props)
        for r in events.collect()
    }
    assert got == want
    # in-chunk pos follows the order key
    first = dec.filter("chunk = 0").orderBy("pos").select("event_id").collect()
    assert [r.event_id for r in first] == sorted(r.event_id for r in first)


def test_per_column_codecs_engage(spark, events):
    row = encode_table(events, "event_id", 512).first()
    by_col = dict(zip(row.cols, row.codecs))
    # the order key is dense ints -> a delta-family int64 mode
    assert by_col["event_id"].startswith("i64_delta")
    assert by_col["ts_us"].startswith("i64_")
    assert by_col["event_type"] == "dict_fsst"
    assert by_col["value"].startswith("f64_")
    # compressed overall: categorical + timestamp columns must win
    enc = dict(zip(row.cols, row.bytes_enc))
    raw = dict(zip(row.cols, row.bytes_raw))
    assert enc["event_id"] < raw["event_id"] / 10
    assert enc["event_type"] < raw["event_type"] / 2


def test_null_fails_fast(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "k bigint, s string"
    )
    with pytest.raises(Exception, match="null-free"):
        encode_table(df, "k").collect()


def test_zone_map_range_scan_prunes_and_matches(spark, events):
    from mapbox_vector_tile_spark.engine.table_encode import scan_table_range

    blocks = encode_table(events, "event_id", 128)
    blocks.cache().count()
    lo = events.agg(F.min("ts_us")).first()[0]
    hi = lo + (events.agg(F.max("ts_us")).first()[0] - lo) // 10
    got = scan_table_range(blocks, events.schema, "ts_us", lo, hi)
    want = events.filter((F.col("ts_us") >= lo) & (F.col("ts_us") <= hi))
    assert {r.event_id for r in got.collect()} == {
        r.event_id for r in want.collect()
    }
    # pruning is real: ts is monotone in event_id, so a 10% window must
    # keep far fewer chunks than the table has
    idx = F.array_position(F.col("cols"), F.lit("ts_us")).cast("int")
    kept = blocks.filter(
        (F.element_at("mins", idx) <= hi) & (F.element_at("maxs", idx) >= lo)
    ).count()
    assert kept < blocks.count() / 3


def test_streaming_table_ingest_multibatch(spark, events, tmp_path):
    from mapbox_vector_tile_spark.engine.table_encode import decode_table
    from mapbox_vector_tile_spark.streaming.table_sink import (
        start_table_encode_stream,
    )

    src = str(tmp_path / "src")
    events.repartition(6).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    sq = start_table_encode_stream(
        stream, "event_id", str(tmp_path / "blocks"), str(tmp_path / "ckpt"), 128
    )
    sq.awaitTermination()
    blocks = spark.read.parquet(str(tmp_path / "blocks"))
    assert blocks.select("batch_id").distinct().count() > 1  # real multi-batch
    dec = decode_table(blocks.drop("batch_id"), events.schema)
    got = {r.event_id: (r.ts_us, r.user_id, r.event_type, r.value, r.props)
           for r in dec.collect()}
    want = {r.event_id: (r.ts_us, r.user_id, r.event_type, r.value, r.props)
            for r in events.collect()}
    assert got == want


def test_merge_bit_identical_to_full_reencode(spark, events):
    from mapbox_vector_tile_spark.engine.table_encode import merge_table

    blocks = encode_table(events, "event_id", 128)
    blocks.cache().count()
    # updates touch a narrow key band + insert brand-new keys past the end
    upd_existing = events.filter(
        (F.col("event_id") >= 100) & (F.col("event_id") < 140)
    ).withColumn("event_type", F.lit("patched"))
    top = events.agg(F.max("event_id")).first()[0]
    inserts = events.limit(5).select(
        (F.col("event_id") + top + 1).alias("event_id"),
        "ts_us", "user_id", F.lit("inserted").alias("event_type"),
        "value", "props",
    )
    updates = upd_existing.unionByName(inserts)
    merged = merge_table(blocks, updates, "event_id", events.schema, 128)

    # ground truth: apply the merge relationally, re-encode from scratch
    keys = [r.event_id for r in updates.select("event_id").collect()]
    full = events.filter(~F.col("event_id").isin(keys)).unionByName(updates)
    want = {
        r.chunk: (r.n_rows, r.codecs, [bytes(x) for x in r.payloads])
        for r in encode_table(full, "event_id", 128).collect()
    }
    got = {
        r.chunk: (r.n_rows, r.codecs, [bytes(x) for x in r.payloads])
        for r in merged.collect()
    }
    assert got == want
    # copy-on-write is bounded: untouched chunks pass through byte-equal
    touched = {k // 128 for k in keys}
    n_blocks = blocks.count()
    assert merged.count() == len(
        set(got)
    ) and n_blocks - len(touched & {r.chunk for r in blocks.collect()}) == len(
        [c for c in got if c not in touched]
    )
