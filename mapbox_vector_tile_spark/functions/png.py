"""PNG codec — pure stdlib ``zlib`` + numpy, no image libraries.

Implements the PUBLIC PNG specification (RFC 2083 / W3C PNG): chunk
framing with CRC-32 validation, IHDR/PLTE/IDAT/IEND, all five scanline
filters (None/Sub/Up/Average/Paeth), zlib-deflated image data. Depth 8;
color types: 0 (grayscale), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA). Adam7 interlace and 16-bit depth raise (documented subset).

PNG is LOSSLESS, so unlike the MJPEG path (:mod:`.jpeg`) no content
trick is needed for the oracle gate: any closed-form pixels round-trip
exactly, and the compressed-image decode is hash-gateable end to end.

Scale notes: the filter search at encode and Sub/Average/Paeth
unfiltering at decode are row-sequential by specification (each row
references the reconstruction of the previous one) — the loops here are
per-row numpy over whole scanlines, not per-pixel Python except the
inherently serial left-neighbor dependency of Average/Paeth, and all of
it runs inside executor-side Arrow batches.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray):
    """Vectorized Paeth predictor over int16/int32 arrays."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _filter_row(raw: np.ndarray, prev: np.ndarray, bpp: int,
                ftype: int) -> np.ndarray:
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    if ftype == 0:
        return raw
    if ftype == 1:
        return raw - left
    if ftype == 2:
        return raw - prev
    if ftype == 3:
        return raw - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
    if ftype == 4:
        upleft = np.zeros_like(prev)
        upleft[bpp:] = prev[:-bpp]
        return raw - _paeth_predict(left, prev, upleft)
    raise ValueError(f"bad filter {ftype}")


def encode_png(px: np.ndarray, filter_type: int | None = None) -> bytes:
    """uint8 array -> PNG bytes. Shapes: (H, W) grayscale, (H, W, 2)
    gray+alpha, (H, W, 3) RGB, (H, W, 4) RGBA. ``filter_type`` forces one
    scanline filter (0..4) for every row; ``None`` picks per row by the
    spec's minimum-sum-of-absolute-differences heuristic (real adaptive
    filtering, which is what makes PNG compress)."""
    px = np.asarray(px)
    if px.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None or h < 1 or w < 1:
        raise ValueError(f"unsupported shape {px.shape}")
    bpp = ch
    rows = np.ascontiguousarray(px).reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    parts = []
    for y in range(h):
        raw = rows[y]
        if filter_type is None:
            best, best_cost = None, None
            for ft in range(5):
                cand = _filter_row(raw, prev, bpp, ft)
                # minimum sum of absolute (signed) differences heuristic
                cost = int(np.abs(cand.astype(np.int8).astype(
                    np.int32)).sum())
                if best_cost is None or cost < best_cost:
                    best, best_cost, bft = cand, cost, ft
        else:
            bft = int(filter_type)
            best = _filter_row(raw, prev, bpp, bft)
        parts.append(bytes([bft]) + best.tobytes())
        prev = raw
    idat = zlib.compress(b"".join(parts), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array ((H, W) for grayscale, (H, W, C) else;
    palette images return their expanded (H, W, 3) RGB). Validates chunk
    CRCs; concatenates multiple IDAT chunks per spec."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG not supported")
    ch = _CHANNELS.get(ctype_n)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {ctype_n}")
    if w < 1 or h < 1 or w > 1 << 20 or h > 1 << 20:
        raise ValueError(f"invalid PNG dimensions ({w}x{h})")

    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data size mismatch")
    data = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    ftypes, rows = data[:, 0], data[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = ch
    for y in range(h):
        ft = int(ftypes[y])
        row = rows[y]
        if ft == 0:
            rec = row.copy()
        elif ft == 2:
            rec = row + prev
        elif ft == 1:
            # Sub: per-channel prefix sum (mod 256) along the row
            rec = np.cumsum(
                row.reshape(w, bpp), axis=0, dtype=np.uint64
            ).astype(np.uint8).reshape(stride)
        else:
            # Average/Paeth reference the RECONSTRUCTED left neighbor:
            # serial along x, vectorized across the pixel's channels
            rec = np.empty(stride, dtype=np.uint8)
            if ft == 3:
                for x in range(0, stride, bpp):
                    left = rec[x - bpp:x] if x else np.zeros(bpp, np.uint8)
                    rec[x:x + bpp] = row[x:x + bpp] + (
                        (left.astype(np.uint16) + prev[x:x + bpp]) // 2
                    ).astype(np.uint8)
            elif ft == 4:
                zero = np.zeros(bpp, np.uint8)
                for x in range(0, stride, bpp):
                    left = rec[x - bpp:x] if x else zero
                    upleft = prev[x - bpp:x] if x else zero
                    rec[x:x + bpp] = row[x:x + bpp] + _paeth_predict(
                        left, prev[x:x + bpp], upleft
                    )
            else:
                raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prev = rec

    img = out.reshape(h, w, ch)
    if ctype_n == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[img[:, :, 0]]
    if ch == 1:
        return img[:, :, 0]
    return img
