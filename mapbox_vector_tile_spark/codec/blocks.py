"""Self-describing encoded blocks: frame format + codec registry.

A *block* is the unit the Spark jobs store in a ``binary`` column:
``magic | version | codec_id | n_values | codec params | payload``.
A chunk may be a composed pipeline (e.g. DELTA -> ZIGZAG -> BITPACK),
mirroring how the reference composes delta∘zigzag∘runlength∘varint in one
command stream (/root/reference/mapbox_vector_tile/geom_encoder.py:47-76).

The decoder is driven entirely by the codec id in the block header — never by
assumptions about what the encoder "would have" picked — the engine contract
analog of the reference decoder tolerating foreign encoders
(/root/reference/mapbox_vector_tile/decoder.py:68-80, SURVEY.md §2.8).

Codec ids are stable on-disk identifiers; never renumber.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from . import kernels as K

MAGIC = b"SGB1"
VERSION = 1
_HDR = struct.Struct("<4sBBq")  # magic, version, codec_id, n_values

RAW = 0
CONSTANT = 1
BITPACK_ZZ = 2
FOR_BITPACK = 3
DELTA_ZZ_BITPACK = 4
DELTA_ZZ_VARINT = 5  # the reference MVT scheme (compression baseline)
RLE = 6
DICT_BITPACK = 7

CODEC_NAMES = {
    RAW: "raw",
    CONSTANT: "constant",
    BITPACK_ZZ: "bitpack_zz",
    FOR_BITPACK: "for_bitpack",
    DELTA_ZZ_BITPACK: "delta_zz_bitpack",
    DELTA_ZZ_VARINT: "delta_zz_varint",
    RLE: "rle",
    DICT_BITPACK: "dict_bitpack",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}


def _nbytes(n: int, width: int) -> int:
    return (n * width + 7) // 8


def _mvt_stream(a: np.ndarray) -> np.ndarray:
    """zigzag(delta-from-0) — first value is itself a delta from the implicit
    (0,0) cursor, exactly like the MVT MoveTo (geom_encoder.py:40-44)."""
    u = a.view(np.uint32) if a.dtype == np.int32 else a.astype(np.int32).view(np.uint32)
    d = np.empty_like(u)
    d[0:1] = u[0:1]
    np.subtract(u[1:], u[:-1], out=d[1:])
    return K.zigzag_encode(d.view(np.int32))


# ---------------------------------------------------------------------------
# per-codec encode/decode of the params+payload section
# ---------------------------------------------------------------------------

def _enc_raw(a: np.ndarray) -> bytes:
    return a.astype("<i4", copy=False).tobytes()


def _dec_raw(buf: memoryview, n: int) -> np.ndarray:
    return np.frombuffer(buf, dtype="<i4", count=n).astype(np.int32, copy=False)


_CONST = struct.Struct("<i")


def _enc_constant(a: np.ndarray) -> bytes:
    return _CONST.pack(int(a[0]))


def _dec_constant(buf: memoryview, n: int) -> np.ndarray:
    (v,) = _CONST.unpack_from(buf)
    return np.full(n, v, dtype=np.int32)


_BPZZ = struct.Struct("<B")


def _enc_bitpack_zz(a: np.ndarray) -> bytes:
    zz = K.zigzag_encode(a)
    w = K.bit_width(zz)
    return _BPZZ.pack(w) + K.bitpack(zz, w)


def _dec_bitpack_zz(buf: memoryview, n: int) -> np.ndarray:
    (w,) = _BPZZ.unpack_from(buf)
    return K.zigzag_decode(K.bitunpack(buf[_BPZZ.size :], w, n))


_FOR = struct.Struct("<qB")


def _enc_for_bitpack(a: np.ndarray) -> bytes:
    lo = int(a.min())
    rel = (a.astype(np.int64) - lo).astype(np.uint32)
    w = K.bit_width(rel)
    return _FOR.pack(lo, w) + K.bitpack(rel, w)


def _dec_for_bitpack(buf: memoryview, n: int) -> np.ndarray:
    lo, w = _FOR.unpack_from(buf)
    rel = K.bitunpack(buf[_FOR.size :], w, n)
    return (rel.astype(np.int64) + lo).astype(np.int32)


_DZB = struct.Struct("<iB")


def _enc_delta_zz_bitpack(a: np.ndarray) -> bytes:
    first, d = K.delta_encode(a)
    zz = K.zigzag_encode(d)
    w = K.bit_width(zz)
    return _DZB.pack(first, w) + K.bitpack(zz, w)


def _dec_delta_zz_bitpack(buf: memoryview, n: int) -> np.ndarray:
    first, w = _DZB.unpack_from(buf)
    zz = K.bitunpack(buf[_DZB.size :], w, n - 1)
    return K.delta_decode(first, K.zigzag_decode(zz))


def _enc_delta_zz_varint(a: np.ndarray) -> bytes:
    return K.varint_encode(_mvt_stream(a).astype(np.uint64))


def _dec_delta_zz_varint(buf: memoryview, n: int) -> np.ndarray:
    zz = K.varint_decode(buf, n).astype(np.uint32)
    d = K.zigzag_decode(zz)
    return np.cumsum(d.view(np.uint32), dtype=np.uint32).view(np.int32)


_RLE = struct.Struct("<qBqB")  # n_runs, len_width, val_min, val_width


def _enc_rle(a: np.ndarray) -> bytes:
    vals, lens = K.rle_runs(a)
    r = vals.size
    lens_rel = (lens - 1).astype(np.uint32)  # run length >= 1
    lw = K.bit_width(lens_rel)
    vmin = int(vals.min())
    vrel = (vals.astype(np.int64) - vmin).astype(np.uint32)
    vw = K.bit_width(vrel)
    return _RLE.pack(r, lw, vmin, vw) + K.bitpack(lens_rel, lw) + K.bitpack(vrel, vw)


def _dec_rle(buf: memoryview, n: int) -> np.ndarray:
    r, lw, vmin, vw = _RLE.unpack_from(buf)
    off = _RLE.size
    lens = K.bitunpack(buf[off : off + _nbytes(r, lw)], lw, r).astype(np.int64) + 1
    off += _nbytes(r, lw)
    vals = (K.bitunpack(buf[off:], vw, r).astype(np.int64) + vmin).astype(np.int32)
    return K.rle_inflate(vals, lens)


_DICT = struct.Struct("<qqBB")  # cardinality, table_min, table_width, idx_width


def _enc_dict_bitpack(a: np.ndarray) -> bytes:
    table, idx = K.dict_encode(a)
    c = table.size
    tmin = int(table.min())
    trel = (table.astype(np.int64) - tmin).astype(np.uint32)
    tw = K.bit_width(trel)
    iw = K.bit_width(max(c - 1, 0))
    return (
        _DICT.pack(c, tmin, tw, iw)
        + K.bitpack(trel, tw)
        + K.bitpack(idx.astype(np.uint32), iw)
    )


def _dec_dict_bitpack(buf: memoryview, n: int) -> np.ndarray:
    c, tmin, tw, iw = _DICT.unpack_from(buf)
    off = _DICT.size
    table = (K.bitunpack(buf[off : off + _nbytes(c, tw)], tw, c).astype(np.int64) + tmin).astype(np.int32)
    idx = K.bitunpack(buf[off + _nbytes(c, tw) :], iw, n)
    return K.dict_decode(table, idx)


_ENCODERS = {
    RAW: _enc_raw,
    CONSTANT: _enc_constant,
    BITPACK_ZZ: _enc_bitpack_zz,
    FOR_BITPACK: _enc_for_bitpack,
    DELTA_ZZ_BITPACK: _enc_delta_zz_bitpack,
    DELTA_ZZ_VARINT: _enc_delta_zz_varint,
    RLE: _enc_rle,
    DICT_BITPACK: _enc_dict_bitpack,
}
_DECODERS = {
    RAW: _dec_raw,
    CONSTANT: _dec_constant,
    BITPACK_ZZ: _dec_bitpack_zz,
    FOR_BITPACK: _dec_for_bitpack,
    DELTA_ZZ_BITPACK: _dec_delta_zz_bitpack,
    DELTA_ZZ_VARINT: _dec_delta_zz_varint,
    RLE: _dec_rle,
    DICT_BITPACK: _dec_dict_bitpack,
}


@dataclass(frozen=True)
class BlockInfo:
    codec_id: int
    codec: str
    n_values: int
    n_bytes: int


def encode_block(a: np.ndarray, codec_id: int) -> bytes:
    """Frame ``a`` (int32 array) as a self-describing block."""
    a = np.ascontiguousarray(a, dtype=np.int32)
    if a.size == 0:
        return _HDR.pack(MAGIC, VERSION, RAW, 0)
    if codec_id == CONSTANT and (a.size == 0 or a[0] != a[-1] or not (a == a[0]).all()):
        raise ValueError("CONSTANT codec requires a constant array")
    body = _ENCODERS[codec_id](a)
    return _HDR.pack(MAGIC, VERSION, codec_id, a.size) + body


def decode_block(buf: bytes | memoryview) -> np.ndarray:
    """Inverse of :func:`encode_block`; dispatches on the stored codec id."""
    mv = memoryview(buf)
    magic, version, codec_id, n = _HDR.unpack_from(mv)
    if magic != MAGIC:
        raise ValueError(f"bad block magic {magic!r}")
    if version != VERSION:
        raise ValueError(f"unsupported block version {version}")
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    return _DECODERS[codec_id](mv[_HDR.size :], n)


def block_info(buf: bytes | memoryview) -> BlockInfo:
    mv = memoryview(buf)
    _, _, codec_id, n = _HDR.unpack_from(mv)
    return BlockInfo(codec_id, CODEC_NAMES[codec_id], n, len(mv))


def header_size() -> int:
    return _HDR.size
