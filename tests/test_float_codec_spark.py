"""End-to-end Spark tests for the float32 embedding codec
(functions/float_codec.py): bit-identity through encode -> blocks ->
decode, manifest accounting, and corruption fail-fast."""

import numpy as np
import pytest

from mapbox_vector_tile_spark.functions import float_codec as FCD


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(300):
        d = int(rng.integers(3, 24))
        if i % 3 == 0:
            # decimal-quantized vectors: the ALP path
            v = (rng.integers(-3000, 3000, d) / 100.0).astype(np.float32)
        else:
            v = rng.standard_normal(d).astype(np.float32)
        rows.append((i, [float(x) for x in v]))
    rows.append((300, []))  # empty vector must survive
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(3)


def test_roundtrip_bit_identity(spark, emb_df):
    blocks = FCD.encode_embeddings_dataframe(emb_df)
    decoded = FCD.decode_embeddings_dataframe(blocks)
    src = {r.vec_id: r.embedding for r in emb_df.collect()}
    out = {r.vec_id: r.embedding for r in decoded.collect()}
    assert set(src) == set(out)
    for k in src:
        a = np.array(src[k], dtype=np.float32)
        b = np.array(out[k], dtype=np.float32)
        assert np.array_equal(a.view(np.uint32), b.view(np.uint32)), k


def test_blocks_manifest_accounting(spark, emb_df):
    rows = FCD.encode_embeddings_dataframe(emb_df).collect()
    assert rows
    n_rows = sum(r.n_rows for r in rows)
    assert n_rows == emb_df.count()
    for r in rows:
        assert r.float_codec in ("f_raw", "f_bss", "f_alp")
        assert r.bytes_enc == len(r.payload)
        assert len(r.vec_ids) == r.n_rows
        # compressible synthetic data: encoded must not exceed raw + header
        assert r.bytes_enc <= r.bytes_raw + 16


def test_corruption_fails_fast(spark, emb_df):
    import zlib

    from pyspark.sql import functions as F

    blocks = FCD.encode_embeddings_dataframe(emb_df)
    bad = blocks.withColumn(
        "payload",
        F.expr("concat(slice_binary, payload)").cast("binary")
        if False
        else F.concat(F.lit(b"\x00"), F.col("payload")),
    )
    with pytest.raises(Exception):
        FCD.decode_embeddings_dataframe(bad).collect()
    # sanity: unmodified blocks decode fine after the failed attempt
    assert FCD.decode_embeddings_dataframe(blocks).count() == emb_df.count()
    del zlib


def test_sf_table_roundtrip_counts(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    stats = FCD.embedding_codec_roundtrip(emb)
    got = stats.collect()
    assert len(got) == emb.count()
    assert all(r.n_dims > 0 for r in got)
