"""Plumbing tests: multimodal feature extraction + streaming encode parity."""

import numpy as np
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.engine import generator as G
from mapbox_vector_tile_spark.engine.decode import decode_dataframe
from mapbox_vector_tile_spark.engine.verify import verify_roundtrip
from mapbox_vector_tile_spark.functions import multimodal as MM


def test_extract_features_schema_and_determinism(spark):
    assets = MM.synthetic_assets(spark, 60)
    feats = MM.extract_features(assets)
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == 60
    r = rows["asset-000003"]
    assert r.kind == "image" and len(r.feat) == MM.FEAT_DIM
    assert 1 <= r.width <= 64 and 1 <= r.height <= 64
    # deterministic across runs
    rows2 = {r.asset_id: r for r in MM.extract_features(assets).collect()}
    assert rows2["asset-000003"].crc32 == r.crc32
    assert rows2["asset-000003"].feat == r.feat
    # audio/video rows carry no spatial dims
    audio = rows["asset-000001"]
    assert audio.kind == "audio" and audio.width == -1


def test_frame_sample_plan(spark):
    assets = MM.synthetic_assets(spark, 30)
    plan = MM.frame_sample_plan(assets, every_n=2)
    rows = plan.collect()
    assert rows
    for r in rows:
        # n_frames is the REAL avih dwTotalFrames of the closed-form corpus
        i = int(r.asset_id.split("-")[1])
        assert r.n_frames == 2 + (i * 11) % 5
        idx = r.frame_indices
        assert idx[0] == 0
        assert all(b - a == 2 for a, b in zip(idx, idx[1:]))
        assert idx[-1] < r.n_frames


def test_avi_roundtrip_and_index_seek():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (5, 13, 9, 3), dtype=np.uint8)
    payload = MM.encode_avi(frames, fps=24)
    dec, fps = MM.decode_avi(payload)
    assert fps == 24 and np.array_equal(dec, frames)
    # idx1 index-seek partial decode == the corresponding full-decode frames
    part = MM.decode_avi_frames(payload, np.array([0, 2, 4]))
    assert np.array_equal(part, frames[[0, 2, 4]])
    # closed-form container size (the oracle relies on it)
    stride = 9 * 3 + ((-9 * 3) % 4)
    assert len(payload) == 232 + 5 * (24 + stride * 13)


def test_avi_malformed_quarantine(spark):
    import pandas as pd

    good = MM.synthetic_video_bytes(2)
    bad = good[:100]  # truncated mid-header
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": ["ok", "trunc"],
                "kind": ["video", "video"],
                "payload": [good, bad],
                "meta": [{}, {}],
            }
        ),
        schema=MM.ASSETS_SCHEMA,
    )
    rows = {r.asset_id: r for r in MM.extract_features(assets).collect()}
    assert rows["ok"].status == "ok" and rows["ok"].width > 0
    assert rows["trunc"].status.startswith("error:")
    assert rows["trunc"].feat is None


def test_streaming_encode_matches_batch(spark, tmp_path):
    from mapbox_vector_tile_spark.streaming.encode_stream import start_encode_stream

    n = 200
    tokens_pq = str(tmp_path / "tokens")
    G.corpus_dataframe(spark, n, num_partitions=2).write.parquet(tokens_pq)
    static = spark.read.parquet(tokens_pq)

    stream = spark.readStream.schema(static.schema).parquet(tokens_pq)
    out_dir = str(tmp_path / "blocks_stream")
    q = start_encode_stream(
        stream, out_dir, str(tmp_path / "stream_ckpt"), trigger_once=True
    )
    q.awaitTermination(120)

    blocks = spark.read.parquet(out_dir)
    res = verify_roundtrip(static, decode_dataframe(blocks)).first()
    assert (res.n_docs, res.n_match, res.n_mismatch) == (n, n, 0)
    # stream output compresses identically to batch (same chunks modulo batching)
    assert blocks.agg(F.sum("n_values")).first()[0] == static.agg(
        F.sum("n_tok")
    ).first()[0]


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: simulate a replay (lost stream
    checkpoint, intact output) and assert the batch overwrites its own
    batch_id partition instead of appending duplicates."""
    import shutil

    from mapbox_vector_tile_spark.streaming.encode_stream import start_encode_stream

    n = 100
    tokens_pq = str(tmp_path / "tokens")
    G.corpus_dataframe(spark, n, num_partitions=2).write.parquet(tokens_pq)
    static = spark.read.parquet(tokens_pq)
    out_dir = str(tmp_path / "blocks_stream")
    ckpt = str(tmp_path / "stream_ckpt")

    for _ in range(2):  # second run replays batch 0 into the same out_dir
        stream = spark.readStream.schema(static.schema).parquet(tokens_pq)
        q = start_encode_stream(stream, out_dir, ckpt, trigger_once=True)
        q.awaitTermination(120)
        shutil.rmtree(ckpt)  # lose the stream checkpoint -> forced replay

    blocks = spark.read.parquet(out_dir)
    assert blocks.select("batch_id").distinct().count() == 1
    res = verify_roundtrip(static, decode_dataframe(blocks)).first()
    assert (res.n_docs, res.n_match, res.n_mismatch) == (n, n, 0)


def test_bmp_codec_roundtrip():
    rng = np.random.default_rng(5)
    for h, w in [(1, 1), (3, 5), (64, 63), (17, 2)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(MM.decode_bmp(MM.encode_bmp(px)), px)


def test_wav_codec_roundtrip():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32767, 1234, dtype=np.int16)
    got, rate = MM.decode_wav(MM.encode_wav(s, rate=22050))
    assert rate == 22050 and np.array_equal(got, s)


def test_extract_features_quarantines_malformed_assets(spark):
    """One corrupt payload must not fail the stage: it gets a status row
    with null features; healthy assets in the same batch still decode."""
    good = MM.encode_bmp(np.full((2, 2, 3), 9, dtype=np.uint8))
    truncated = good[:30]  # valid magic, truncated body
    not_bmp = b"JUNKJUNKJUNK" * 10
    bad_wav = b"RIFFxxxxWAVE" + b"\x00" * 20
    assets = spark.createDataFrame(
        [
            ("ok", "image", bytearray(good), {}),
            ("trunc", "image", bytearray(truncated), {}),
            ("junk", "image", bytearray(not_bmp), {}),
            ("badwav", "audio", bytearray(bad_wav), {}),
        ],
        MM.ASSETS_SCHEMA,
    )
    rows = {r.asset_id: r for r in MM.extract_features(assets).collect()}
    assert rows["ok"].status == "ok" and rows["ok"].feat is not None
    for bad in ("trunc", "junk", "badwav"):
        assert rows[bad].status.startswith("error:"), rows[bad].status
        assert rows[bad].feat is None


def test_decode_bmp_validates_header_bounds():
    import pytest

    px = np.full((4, 4, 3), 7, dtype=np.uint8)
    payload = bytearray(MM.encode_bmp(px))
    # inflate claimed width beyond the actual body
    import struct

    struct.pack_into("<i", payload, 18, 1 << 16)
    with pytest.raises(ValueError, match="truncated BMP|invalid BMP"):
        MM.decode_bmp(bytes(payload))


def test_content_stats_matches_duckdb_oracle(spark):
    """End-to-end: Spark decode-side stats == closed-form SQL oracle."""
    import duckdb

    got = [
        tuple(r)
        for r in MM.content_stats(MM.synthetic_assets(spark, 45))
        .orderBy("asset_id")
        .collect()
    ]
    con = duckdb.connect()
    want = con.execute(MM.content_stats_sql(45)).fetchall()
    assert got == want


def test_real_image_features_reflect_content(spark):
    # constant-color image: per-channel std must be 0, mean the exact color
    px = np.full((8, 4, 3), 200, dtype=np.uint8)
    assets = spark.createDataFrame(
        [("a0", "image", bytearray(MM.encode_bmp(px)), {})], MM.ASSETS_SCHEMA
    )
    r = MM.extract_features(assets).collect()[0]
    assert (r.width, r.height) == (4, 8)
    assert abs(r.feat[2] - 200 / 255) < 1e-6  # mean R
    assert abs(r.feat[5]) < 1e-6  # std R == 0


def test_real_audio_features_reflect_content(spark):
    # constant zero signal: RMS 0; full-scale square wave: RMS ~1
    silent = MM.encode_wav(np.zeros(500, dtype=np.int16))
    square = MM.encode_wav(
        (np.tile([32767, -32767], 250)).astype(np.int16)
    )
    assets = spark.createDataFrame(
        [("s", "audio", bytearray(silent), {}),
         ("q", "audio", bytearray(square), {})],
        MM.ASSETS_SCHEMA,
    )
    rows = {r.asset_id: r for r in MM.extract_features(assets).collect()}
    assert abs(rows["s"].feat[3]) < 1e-6
    assert abs(rows["q"].feat[3] - 1.0) < 1e-3
    assert rows["q"].feat[6] > 0.9  # zero-crossing rate of the square wave


def test_streaming_decode_matches_batch(spark, tmp_path):
    """Stream-decode of a blocks table must reproduce the source tokens
    bit-exactly (same contract as the batch decoder)."""
    from mapbox_vector_tile_spark.engine.encode import encode_dataframe
    from mapbox_vector_tile_spark.streaming.decode_stream import (
        start_decode_stream,
    )

    n = 150
    tokens_pq = str(tmp_path / "tokens")
    blocks_pq = str(tmp_path / "blocks")
    out_dir = str(tmp_path / "decoded_stream")
    G.corpus_dataframe(spark, n, num_partitions=2).write.parquet(tokens_pq)
    static = spark.read.parquet(tokens_pq)
    encode_dataframe(static).write.parquet(blocks_pq)

    blocks_schema = spark.read.parquet(blocks_pq).schema
    stream = spark.readStream.schema(blocks_schema).parquet(blocks_pq)
    q = start_decode_stream(
        stream, out_dir, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)

    decoded = spark.read.parquet(out_dir).drop("batch_id")
    res = verify_roundtrip(static, decoded).first()
    assert (res.n_docs, res.n_match, res.n_mismatch) == (n, n, 0)
