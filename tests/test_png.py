"""PNG codec (functions/png.py) — pure zlib+numpy, lossless roundtrips.

Reference parity note: the reference engine treats attached media as
opaque payload columns (SURVEY.md multimodal addendum); the codec here is
an original implementation of the PUBLIC W3C PNG spec (RFC 2083).
"""

import struct
import zlib

import numpy as np
import pytest

from mapbox_vector_tile_spark.functions import multimodal as MM
from mapbox_vector_tile_spark.functions.png import decode_png, encode_png


def _pattern(h, w, ch, seed=0):
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    px = np.empty((h, w, ch), dtype=np.uint8)
    for c in range(ch):
        px[..., c] = ((3 + 2 * c) * x + (5 + c) * y + seed + c * 17) % 256
    return px


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (1, 64), (64, 1), (17, 23), (64, 64)])
def test_roundtrip_all_color_types_adaptive(ch, shape):
    h, w = shape
    px = _pattern(h, w, ch, seed=h * 7 + w)
    out = decode_png(encode_png(px))
    if ch == 1:
        assert out.shape == (h, w)
        assert np.array_equal(out, px[:, :, 0])
    else:
        assert np.array_equal(out, px)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_each_forced_filter(ftype):
    px = _pattern(21, 33, 3, seed=ftype)
    assert np.array_equal(decode_png(encode_png(px, filter_type=ftype)), px)


def test_roundtrip_random_noise_and_constant():
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(noise)), noise)
    const = np.full((16, 16, 4), 200, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(const)), const)


def test_adaptive_filtering_compresses_gradients():
    """The point of filters: a smooth gradient deflates far better
    filtered than with filter 0 forced."""
    x = np.arange(256, dtype=np.uint8)
    px = np.broadcast_to(x[None, :, None], (256, 256, 3)).copy()
    adaptive = encode_png(px)
    unfiltered = encode_png(px, filter_type=0)
    assert len(adaptive) < len(unfiltered) // 2


def test_crc_corruption_detected():
    blob = bytearray(encode_png(_pattern(8, 8, 3)))
    # flip one byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = blob.find(b"IDAT")
    blob[idat_at + 10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_multiple_idat_chunks_concatenate():
    px = _pattern(12, 12, 3)
    blob = encode_png(px)
    # re-frame: split the single IDAT into two chunks per spec
    sig, rest = blob[:8], blob[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (clen,) = struct.unpack_from(">I", rest, pos)
        chunks.append((rest[pos + 4:pos + 8], rest[pos + 8:pos + 8 + clen]))
        pos += 12 + clen
    out = sig
    for ctype, data in chunks:
        if ctype == b"IDAT" and len(data) > 4:
            halves = [data[: len(data) // 2], data[len(data) // 2:]]
        else:
            halves = [data]
        for d in halves:
            out += (struct.pack(">I", len(d)) + ctype + d
                    + struct.pack(">I", zlib.crc32(ctype + d)))
    assert np.array_equal(decode_png(out), px)


def test_palette_png_decodes_to_rgb():
    """Hand-build a color-type-3 PNG and check PLTE expansion."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]],
                   dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))

    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(blob), pal[idx])


def test_rejections():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BMnot-a-png")
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((4, 4), dtype=np.int32))
    with pytest.raises(ValueError, match="unsupported shape"):
        encode_png(np.zeros((4, 4, 5), dtype=np.uint8))
    # 16-bit depth rejected: patch IHDR depth byte and re-CRC
    blob = bytearray(encode_png(_pattern(4, 4, 3)))
    blob[8 + 8 + 8] = 16  # sig + len/type + w/h -> depth byte
    ihdr = bytes(blob[8 + 4: 8 + 8 + 13])
    struct.pack_into(">I", blob, 8 + 8 + 13, zlib.crc32(ihdr))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(blob))


def test_decode_image_sniffs_bmp_and_png():
    px = MM.synthetic_pixels(7)
    assert np.array_equal(MM.decode_image(MM.encode_bmp(px)), px)
    assert np.array_equal(MM.decode_image(encode_png(px)), px)
    gray = _pattern(6, 6, 1)
    assert np.array_equal(
        MM.decode_image(encode_png(gray)),
        np.repeat(gray, 3, axis=2),
    )
    with pytest.raises(ValueError, match="unknown image"):
        MM.decode_image(b"\x00\x01\x02")


def test_synthetic_png_assets_content_stats(spark):
    """End-to-end: PNG-compressed assets through the kind-agnostic
    content_stats path equal the BMP-stored pixels' stats exactly
    (PNG is lossless)."""
    n = 24
    png_df = MM.content_stats(MM.synthetic_png_assets(spark, n))
    rows = {r["asset_id"]: r for r in png_df.collect()}
    assert len(rows) == n
    for i in range(n):
        px = MM.synthetic_pixels(i)
        v = px.astype(np.int64)
        r = rows[f"asset-{i:06d}"]
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["sum1"] == int(v.sum())
        assert r["sum2"] == int((v * v).sum())
        assert r["vmin"] == int(v.min()) and r["vmax"] == int(v.max())
        assert r["zcross"] == int((v[:, :, 0] > v[:, :, 1]).sum())
        # the payload really is deflated: smaller than raw BMP rows
        assert r["n_bytes"] > 0
