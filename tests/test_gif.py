"""GIF89a / LZW codec (functions/gif.py) — variable-width LZW across
boundary conditions, container roundtrips, sampled decode, refusals."""

import struct

import numpy as np
import pytest

from mapbox_vector_tile_spark.functions import multimodal as MM
from mapbox_vector_tile_spark.functions.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    gif_headers,
    lzw_decode,
    lzw_encode,
)


@pytest.mark.parametrize("mcs", [2, 3, 5, 8])
def test_lzw_roundtrip_random_and_sizes(mcs):
    rng = np.random.default_rng(mcs)
    for size in (0, 1, 2, 255, 256, 4095, 20000, 120000):
        data = rng.integers(0, 1 << mcs, size, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data, mcs), mcs) == data


@pytest.mark.parametrize("mcs", [2, 8])
def test_lzw_roundtrip_table_ceiling_reset(mcs):
    # repetitive data grows the dictionary to 4096 -> encoder CLEARs
    rep = bytes(range(1 << mcs)) * (300000 // (1 << mcs))
    assert lzw_decode(lzw_encode(rep, mcs), mcs) == rep
    const = bytes(200000)
    assert lzw_decode(lzw_encode(const, mcs), mcs) == const


def test_lzw_compresses_repetitive():
    rep = b"\x00\x01\x02\x03" * 10000
    assert len(lzw_encode(rep, 2)) < len(rep) // 10


def test_lzw_hand_anchor():
    """Spec-structure anchor: stream for [0] with mcs=2 is exactly
    CLEAR(4), 0, END(5) at width 3, LSB-first -> 0b101_000_100 packed."""
    enc = lzw_encode(b"\x00", 2)
    # bits: 100 (clear) | 000 (code 0) | 101 (end) -> byte0=0b01000100? LSB:
    # acc = 4 | 0<<3 | 5<<6 = 4 + 320 = 324 = 0b101000100 -> bytes 0x44, 0x01
    assert enc == bytes([0x44, 0x01])
    assert lzw_decode(enc, 2) == b"\x00"


def test_lzw_rejections():
    with pytest.raises(ValueError, match="min code size"):
        lzw_decode(b"\x00", 1)
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(b"", 2)
    with pytest.raises(ValueError, match="out of range"):
        # width-3 stream: CLEAR then code 7 (beyond table)
        lzw_decode(bytes([4 | (7 << 3)]), 2)


def test_container_roundtrip_multiframe():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (37, 3), dtype=np.uint8)
    fr = rng.integers(0, 37, (5, 19, 23), dtype=np.uint8)
    blob = encode_gif(fr, pal, delay_cs=7)
    assert blob[:6] == b"GIF89a" and blob[-1] == 0x3B
    assert gif_headers(blob) == (5, 23, 19)
    dec, delay = decode_gif(blob)
    assert delay == 7
    assert np.array_equal(dec, pal[fr])


def test_single_frame_and_2d_input():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    fr = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    dec, _ = decode_gif(encode_gif(fr, pal))
    assert dec.shape == (1, 2, 2, 3)
    assert np.array_equal(dec[0], pal[fr])


def test_sampled_decode_matches_full():
    fr, pal = MM.synthetic_gif_frames(17)
    blob = encode_gif(fr, pal)
    full, _ = decode_gif(blob)
    idx = np.arange(0, len(fr), 2)
    assert np.array_equal(decode_gif_frames(blob, idx), full[idx])


def test_container_rejections():
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"RIFFxxxxAVI ")
    with pytest.raises(ValueError, match="uint8"):
        encode_gif(np.zeros((2, 2), np.int32), pal)
    with pytest.raises(ValueError, match="palette"):
        encode_gif(np.zeros((2, 2), np.uint8), np.zeros((1, 3), np.uint8))
    with pytest.raises(ValueError, match="exceeds palette"):
        encode_gif(np.full((2, 2), 5, np.uint8), pal)
    # interlace flag refused
    blob = bytearray(encode_gif(np.zeros((2, 2), np.uint8), pal))
    at = blob.find(b"\x2c")
    blob[at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(blob))
    with pytest.raises(ValueError, match="out of range"):
        decode_gif_frames(encode_gif(np.zeros((2, 2), np.uint8), pal),
                          np.array([3]))


def test_video_sniffing_dispatch():
    fr, pal = MM.synthetic_gif_frames(4)
    gif_blob = encode_gif(fr, pal)
    assert MM.video_headers(gif_blob) == (len(fr), fr.shape[2], fr.shape[1])
    frames, _ = MM.decode_video(gif_blob)
    assert np.array_equal(frames, pal[fr])
    avi_blob = MM.synthetic_video_bytes(2)
    n, w, h = MM.video_headers(avi_blob)
    assert np.array_equal(
        MM.decode_video_frames(avi_blob, np.array([0])),
        MM.decode_video(avi_blob)[0][:1],
    )
    with pytest.raises(ValueError, match="unknown video"):
        MM.decode_video(b"\x00\x01")


def test_gif_assets_frame_stats(spark):
    """End-to-end through the sniffing sample_frame_stats path."""
    n = 12
    df = MM.sample_frame_stats(MM.synthetic_gif_assets(spark, n), every_n=2)
    rows = {(r["asset_id"], r["t"]): r for r in df.collect()}
    seen = 0
    for i in range(n):
        fr, pal = MM.synthetic_gif_frames(i)
        rgb = pal[fr].astype(np.int64)
        for t in range(0, len(fr), 2):
            r = rows[(f"asset-{i:06d}", t)]
            v = rgb[t]
            assert r["sum1"] == int(v.sum())
            assert r["sum2"] == int((v * v).sum())
            assert r["vmin"] == int(v.min()) and r["vmax"] == int(v.max())
            assert r["zcross"] == int((v[:, :, 0] > v[:, :, 1]).sum())
            seen += 1
    assert seen == len(rows)
