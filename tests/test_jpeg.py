"""Baseline JPEG codec (functions/jpeg.py) + motion-JPEG AVI tests."""

import numpy as np
import pytest

from mapbox_vector_tile_spark.functions import multimodal as MM
from mapbox_vector_tile_spark.functions.jpeg import (
    Q_LUM,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    psnr,
    quality_scale,
)


def _pattern_rgb(h: int, w: int, seed: int = 0) -> np.ndarray:
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[..., 0] = (3 * x + y + seed) % 256
    px[..., 1] = (x * x // 7 + 2 * y) % 256
    px[..., 2] = (x + 5 * y + 2 * seed) % 256
    return px


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks: the first diagonal walk
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
    assert ZIGZAG[-1] == 63


def test_quality_scale_endpoints():
    assert np.array_equal(quality_scale(Q_LUM, 50), Q_LUM)
    assert np.all(quality_scale(Q_LUM, 100) == 1)
    assert np.all(quality_scale(Q_LUM, 1) >= Q_LUM.min())
    lo, hi = quality_scale(Q_LUM, 10), quality_scale(Q_LUM, 90)
    assert np.all(lo >= hi)
    with pytest.raises(ValueError):
        quality_scale(Q_LUM, 0)


def test_block_constant_grayscale_roundtrips_exactly():
    """The oracle-gate property: at q=100, block-constant grayscale RGB
    survives DCT+quantize+huffman+YCbCr BIT-EXACTLY (every value 0..255
    appears across the sweep)."""
    rng = np.random.default_rng(11)
    for _ in range(4):
        bv = rng.integers(0, 256, (3, 4), dtype=np.uint8)
        px = np.repeat(np.repeat(bv, 8, 0), 8, 1)
        rgb = np.stack([px, px, px], -1)
        out = decode_jpeg(encode_jpeg(rgb, quality=100))
        assert np.array_equal(out, rgb)
    # exhaustive per-value check via one 16x128 strip of all 256 values
    bv = np.arange(256, dtype=np.uint8).reshape(16, 16)
    px = np.repeat(np.repeat(bv, 8, 0), 8, 1)
    rgb = np.stack([px, px, px], -1)
    assert np.array_equal(decode_jpeg(encode_jpeg(rgb, quality=100)), rgb)


def test_block_constant_single_component_exact():
    bv = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    gray = np.repeat(np.repeat(bv, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(gray, quality=100))
    assert out.ndim == 2 and np.array_equal(out, gray)


def test_lossy_quality_ladder_and_odd_dims():
    """General content: PSNR rises with quality; non-multiple-of-8 dims
    crop back exactly to the input shape."""
    px = _pattern_rgb(37, 45, seed=3)
    last = 0.0
    for q in (25, 50, 75, 92):
        data = encode_jpeg(px, quality=q)
        out = decode_jpeg(data)
        assert out.shape == px.shape
        p = psnr(out, px)
        assert p > last, (q, p, last)
        last = p
    assert last > 35.0  # q=92 should be visually clean


def test_smooth_content_high_fidelity():
    y = np.clip(
        128 + 60 * np.sin(np.arange(64) / 9.0), 0, 255
    ).astype(np.uint8)
    px = np.repeat(y[None, :], 48, axis=0)
    rgb = np.stack([px, px, px], -1)
    assert psnr(decode_jpeg(encode_jpeg(rgb, quality=90)), rgb) > 40.0


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    good = encode_jpeg(_pattern_rgb(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated mid-headers
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    bad = bytearray(good)
    i = bad.find(b"\xFF\xC0")
    bad[i + 1] = 0xC2
    with pytest.raises(ValueError, match="coding process"):
        decode_jpeg(bytes(bad))


def test_entropy_byte_stuffing_roundtrip():
    """Content tuned to emit 0xFF bytes in the entropy stream exercises
    the stuff/destuff path; roundtrip must still be exact (constant
    blocks) across many values."""
    bv = (np.arange(6 * 32, dtype=np.int64) * 37 % 256).astype(
        np.uint8
    ).reshape(6, 32)
    px = np.repeat(np.repeat(bv, 8, 0), 8, 1)
    rgb = np.stack([px, px, px], -1)
    data = encode_jpeg(rgb, quality=100)
    assert b"\xFF\x00" in data  # stuffing actually occurred
    assert np.array_equal(decode_jpeg(data), rgb)


# ---------------------------------------------------------------------------
# motion-JPEG AVI container
# ---------------------------------------------------------------------------

def test_mjpeg_avi_roundtrip_exact():
    frames = MM.synthetic_mjpeg_frames(7)
    payload = MM.encode_avi_mjpeg(frames, fps=10, quality=100)
    dec, fps = MM.decode_avi(payload)
    assert fps == 10
    assert np.array_equal(dec, frames)


def test_mjpeg_index_seek_matches_full_decode():
    frames = MM.synthetic_mjpeg_frames(5)
    payload = MM.encode_avi_mjpeg(frames, quality=100)
    idx = np.array([0, frames.shape[0] - 1])
    part = MM.decode_avi_frames(payload, idx)
    assert np.array_equal(part, frames[idx])
    with pytest.raises(ValueError):
        MM.decode_avi_frames(payload, np.array([frames.shape[0]]))


def test_mjpeg_no_index_sequential_fallback():
    """Strip idx1: the variable-size chunk walk (headers only) must find
    the same frames."""
    frames = MM.synthetic_mjpeg_frames(9)
    payload = bytearray(MM.encode_avi_mjpeg(frames, quality=100))
    i = payload.rfind(b"idx1")
    import struct as S

    (isz,) = S.unpack_from("<I", payload, i + 4)
    del payload[i:i + 8 + isz]
    S.pack_into("<I", payload, 4, len(payload) - 8)  # fix RIFF size
    part = MM.decode_avi_frames(bytes(payload), np.array([1, 2]))
    assert np.array_equal(part, frames[1:3])


def test_mjpeg_lossy_frames_stay_close():
    """Non-block-constant frames through MJPEG at q=85: container and
    codec agree on dims, content within lossy tolerance."""
    t, h, w = 3, 24, 40
    frames = np.stack([_pattern_rgb(h, w, seed=k) for k in range(t)])
    payload = MM.encode_avi_mjpeg(frames, quality=85)
    dec, _ = MM.decode_avi(payload)
    assert dec.shape == frames.shape
    assert psnr(dec, frames) > 28.0


def test_synthetic_mjpeg_assets_shape(spark):
    df = MM.synthetic_mjpeg_assets(spark, 12)
    rows = df.collect()
    assert len(rows) == 12
    assert all(r.kind == "video" for r in rows)
    assert all(bytes(r.payload)[:4] == b"RIFF" for r in rows)
