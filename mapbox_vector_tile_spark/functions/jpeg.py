"""Baseline JPEG (ITU-T T.81) codec — pure numpy, no image libraries.

Why this exists: a 100 TB multimodal training corpus is mostly
*compressed* media, and this sandbox ships no PyAV/ffmpeg/PIL — so the
MJPEG video path (``multimodal.encode_avi_mjpeg`` / the MJPG branch of
``multimodal.decode_avi_frames``) implements the PUBLIC JPEG spec
directly: baseline sequential DCT, huffman entropy coding, the standard
Annex K quantization/huffman tables, JFIF APP0, optional restart
markers on decode. The reference treats media as opaque payloads
(reference: mapbox_vector_tile/encoder.py attribute handling); here the
decode is real.

Scale notes:
- encode is numpy-vectorized end to end except the per-coefficient
  huffman emission; decode's entropy loop is per-symbol Python (the
  format is sequentially entropy-coded — every decoder pays this in
  some language). Both are per-asset bounded and run inside Arrow
  batches on executors; at production scale this slot is where a
  hardware/ffmpeg decoder plugs in, with identical Spark plumbing.
- the *exactness* trick the oracle gate uses: at ``quality=100`` every
  quantizer entry is 1, so a block-constant frame has one exactly-
  representable DC coefficient and all-zero ACs — baseline JPEG
  round-trips it bit-exactly (grayscale content also survives the
  YCbCr cycle exactly: Cb = Cr = 128). The SQL oracle regenerates the
  decoded pixels in closed form, making a *lossy* codec hash-gateable.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# public spec constants (ITU-T T.81 Annex K / JFIF)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# (BITS[1..16], HUFFVAL) for the four standard tables
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)
    D = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    D[0] /= np.sqrt(2.0)
    return D


_D = _dct_matrix()


def quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """The libjpeg-compatible quality scaling (public IJG formula):
    q=50 keeps the Annex K tables, q=100 forces every entry to 1
    (the lossless-for-constant-blocks setting the oracle gate uses)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# huffman (canonical code construction — T.81 C.1/C.2)
# ---------------------------------------------------------------------------

def _build_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    code = 0
    out: dict[int, tuple[int, int]] = {}
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict[tuple, list] = {}


_LUT_CACHE_MAX = 64  # distinct huffman tables kept (Annex K streams use 4)


class _DecodeTable:
    """Single-step 16-bit huffman LOOKUP table (replaces the T.81
    F.2.2.3 per-length DECODE walk): JPEG codes are at most 16 bits, so
    a 65536-entry table indexed by the next 16 bits of the stream yields
    ``(symbol << 5) | code_length`` in ONE lookup — the classic
    table-driven decode that replaces the per-bit tree walk (the entropy
    loop was the documented per-symbol wall). Entry 0 marks an invalid
    prefix. Tables are cached by ``(bits, vals)`` content: MJPEG streams
    repeat the same Annex K tables every frame, so the 65536-entry build
    is paid once per process, not once per frame; the cache is bounded
    (FIFO evict at ``_LUT_CACHE_MAX``) so a corpus of per-image
    optimized tables cannot grow worker RSS without bound."""

    __slots__ = ("vals", "lut")

    def __init__(self, bits, vals):
        self.vals = list(vals)
        key = (tuple(bits), tuple(vals))
        lut = _LUT_CACHE.get(key)
        if lut is None:
            arr = np.zeros(1 << 16, dtype=np.uint32)
            code = 0
            k = 0
            for length in range(1, 17):
                for _ in range(bits[length - 1]):
                    lo = code << (16 - length)
                    arr[lo:lo + (1 << (16 - length))] = (
                        (self.vals[k] << 5) | length
                    )
                    code += 1
                    k += 1
                code <<= 1
            lut = arr.tolist()
            while len(_LUT_CACHE) >= _LUT_CACHE_MAX:
                _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
            _LUT_CACHE[key] = lut
        self.lut = lut


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Reads MSB-first bits from already-destuffed entropy bytes.

    Keeps a small integer accumulator topped up to >=16 bits so huffman
    symbols resolve with ONE 16-bit peek into the decode table's LUT and
    magnitude bits extract with one shift — no per-bit loop. Peeks past
    the end of the data see zero padding; CONSUMING into the padding (the
    truncated-stream case) still raises, preserving the strict-error
    contract of the per-bit reader."""

    __slots__ = ("data", "pos", "acc", "nbits", "total", "consumed")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.total = 8 * len(data)
        self.consumed = 0

    def _fill(self, need: int) -> None:
        # top up well past `need` in one from_bytes so the refill runs
        # once per few symbols, not once per symbol
        pos = self.pos
        take = min(6, len(self.data) - pos)
        if take > 0:
            self.acc = (self.acc << (8 * take)) | int.from_bytes(
                self.data[pos:pos + take], "big"
            )
            self.nbits += 8 * take
            self.pos = pos + take
        while self.nbits < need:
            self.acc <<= 8  # zero padding; consumption checks catch overrun
            self.nbits += 8

    def bit(self) -> int:
        return self.bits(1)

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        self.consumed += n
        if self.consumed > self.total:
            raise ValueError("JPEG entropy data exhausted")
        nbits = self.nbits - n
        v = (self.acc >> nbits) & ((1 << n) - 1)
        self.nbits = nbits
        self.acc &= (1 << nbits) - 1
        return v

    def huff_extend(self, tab: _DecodeTable) -> tuple[int, int]:
        """One fused step of the entropy loop: huffman symbol ``rs`` plus
        its EXTENDed magnitude value (low-nibble ``s`` bits, F.2.2.1) in a
        single fill/peek — the coefficient loop makes one call per
        coefficient instead of three (decode, bits, extend)."""
        if self.nbits < 27:  # 16-bit code + up to 11 magnitude bits
            self._fill(27)
        nbits = self.nbits
        acc = self.acc
        e = tab.lut[(acc >> (nbits - 16)) & 0xFFFF]
        length = e & 31
        if length == 0:
            raise ValueError("invalid huffman code")
        rs = e >> 5
        s = rs & 15
        self.consumed += length + s
        if self.consumed > self.total:
            raise ValueError("JPEG entropy data exhausted")
        nbits -= length
        if s:
            nbits -= s
            v = (acc >> nbits) & ((1 << s) - 1)
            value = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        else:
            value = 0
        self.nbits = nbits
        self.acc = acc & ((1 << nbits) - 1)
        return rs, value


def _magnitude(v: int) -> tuple[int, int]:
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (bh*bw, 8, 8) with edge-replication padding, blocks in
    raster order (row-major over the block grid)."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    if (bh * 8, bw * 8) != (h, w):
        plane = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)),
                       mode="edge")
    return (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(bh * bw, 8, 8))


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def encode_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 -> baseline JFIF bytes.

    4:4:4 (no chroma subsampling), standard Annex K tables scaled by
    ``quality`` via the public IJG formula, standard huffman tables.
    DCT/quantize/zigzag are vectorized across all blocks; only the
    entropy emission walks coefficients in Python.
    """
    px = np.asarray(px)
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 input")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (H, W) or (H, W, 3)")
    h, w = px.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError("JPEG dimensions out of range")

    qlum = quality_scale(Q_LUM, quality)
    qchrom = quality_scale(Q_CHROM, quality)
    if gray:
        planes = [px.astype(np.float64)]
        qtabs = [qlum]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtabs = [qlum, qchrom, qchrom]

    # per-component quantized zigzag coefficients, blocks in raster order
    comp_coefs = []
    for plane, qt in zip(planes, qtabs):
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        q = np.round(coef / qt.astype(np.float64)).astype(np.int64)
        comp_coefs.append(q.reshape(-1, 64)[:, ZIGZAG])

    enc_dc = [_build_encode_table(*_DC_LUM), _build_encode_table(*_DC_CHROM)]
    enc_ac = [_build_encode_table(*_AC_LUM), _build_encode_table(*_AC_CHROM)]

    bw_ = _BitWriter()
    preds = [0] * len(planes)
    n_blocks = comp_coefs[0].shape[0]
    for bi in range(n_blocks):  # 4:4:4 MCU == one block per component
        for ci, zz in enumerate(comp_coefs):
            tsel = 0 if ci == 0 else 1
            dc_tab, ac_tab = enc_dc[tsel], enc_ac[tsel]
            blk = zz[bi]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            size, bits = _magnitude(diff)
            code, length = dc_tab[size]
            bw_.put(code, length)
            if size:
                bw_.put(bits, size)
            run = 0
            last_nz = int(np.max(np.nonzero(blk[1:])[0]) + 1) \
                if np.any(blk[1:]) else 0
            for k in range(1, last_nz + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL
                    bw_.put(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_tab[(run << 4) | size]
                bw_.put(code, length)
                bw_.put(bits, size)
                run = 0
            if last_nz < 63:
                code, length = ac_tab[0x00]  # EOB
                bw_.put(code, length)
    bw_.flush()

    # --- headers ---
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    def _dqt(tid: int, qt: np.ndarray) -> bytes:
        return (b"\xFF\xDB" + struct.pack(">HB", 67, tid)
                + bytes(int(x) for x in qt.reshape(64)[ZIGZAG]))
    out += _dqt(0, qlum)
    if not gray:
        out += _dqt(1, qchrom)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    def _dht(cls: int, tid: int, bits, vals) -> bytes:
        body = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    out += _dht(0, 0, *_DC_LUM) + _dht(1, 0, *_AC_LUM)
    if not gray:
        out += _dht(0, 1, *_DC_CHROM) + _dht(1, 1, *_AC_CHROM)
    sos = struct.pack("B", ncomp)
    for ci in range(ncomp):
        sos += struct.pack("BB", ci + 1, 0 if ci == 0 else 0x11)
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw_.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) RGB (or (H, W) for 1-component)
    uint8. Supports: baseline sequential DCT (SOF0), 8-bit precision,
    1 or 3 components, any h/v sampling factors in 1..2 (4:4:4, 4:2:2,
    4:2:0 — chroma upsampled by replication), restart markers (DRI).
    Raises on progressive (SOF2) / arithmetic / 12-bit streams."""
    if len(payload) < 4 or payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _DecodeTable] = {}
    frame = None  # (h, w, [(cid, hf, vf, tq)])
    restart_interval = 0
    scan = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, p).astype(
                        np.int64)
                    p += 64
                else:
                    vals = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals  # stored in zigzag order
                qtabs[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                htabs[(cls, tid)] = _DecodeTable(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both huffman seq.)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * ci)
                hf, vf = hv >> 4, hv & 0xF
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise ValueError(f"unsupported sampling {hf}x{vf}")
                comps.append((cid, hf, vf, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker & 0xF})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for ci in range(ns):
                cs, td_ta = seg[1 + 2 * ci], seg[2 + 2 * ci]
                sel.append((cs, td_ta >> 4, td_ta & 0xF))
            scan = sel
            pos += seglen
            break
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame

    # destuff entropy data; split on restart markers. Vectorized: find
    # every 0xFF with numpy, walk only the (rare) marker positions in
    # Python, and build segments from plain byte slices — the per-byte
    # copy loop was measurable against the fast entropy loop.
    segments: list[bytes] = []
    n_pay = len(payload)
    arr = np.frombuffer(payload, np.uint8)
    ffs = np.flatnonzero(arr[pos:] == 0xFF) + pos
    cur = bytearray()
    p = pos
    end = n_pay
    for fpos in ffs:
        fpos = int(fpos)
        if fpos < p:
            continue  # consumed as part of a previous 2-byte marker
        nxt = payload[fpos + 1] if fpos + 1 < n_pay else 0xD9
        if nxt == 0x00:
            cur += payload[p:fpos + 1]  # keep the 0xFF, drop the stuffing
            p = fpos + 2
        elif 0xD0 <= nxt <= 0xD7:
            cur += payload[p:fpos]
            segments.append(bytes(cur))
            cur = bytearray()
            p = fpos + 2
        else:
            end = fpos
            break  # next real marker (EOI or otherwise) ends the scan
    cur += payload[p:end]
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scan]
    dc_sel = {cs: td for cs, td, _ in scan}
    ac_sel = {cs: ta for cs, _, ta in scan}

    # coefficient planes per component, MCU-padded block grids
    grids = {}
    for cid, hf, vf, _tq in order:
        grids[cid] = np.zeros((mcus_y * vf, mcus_x * hf, 64), dtype=np.int64)

    seg_i = 0
    reader = _BitReader(segments[0])
    preds = {c[0]: 0 for c in comps}
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing restart segment")
            reader = _BitReader(segments[seg_i])
            preds = {c[0]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        huff_extend = reader.huff_extend
        for cid, hf, vf, _tq in order:
            dct = htabs.get((0, dc_sel[cid]))
            act = htabs.get((1, ac_sel[cid]))
            if dct is None or act is None:
                raise ValueError("missing huffman table")
            g = grids[cid]
            for v in range(vf):
                for hh in range(hf):
                    blk = [0] * 64
                    _, diff = huff_extend(dct)
                    preds[cid] += diff
                    blk[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs, value = huff_extend(act)
                        s = rs & 0xF
                        if s == 0:
                            if rs == 0xF0:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = value
                        k += 1
                    g[my * vf + v, mx * hf + hh] = blk

    # dequantize + IDCT per component (vectorized over all blocks)
    planes = {}
    for cid, hf, vf, tq in order:
        g = grids[cid]
        gh, gw = g.shape[:2]
        qt = qtabs[tq].reshape(64)[ZIGZAG]  # natural->zigzag order values
        coefs = (g * qt).astype(np.float64)[:, :, _UNZIGZAG].reshape(
            gh, gw, 8, 8
        )
        spatial = np.einsum("ji,nmjk,kl->nmil", _D, coefs, _D) + 128.0
        plane = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        plane = plane.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        # replicate-upsample to full resolution, crop to frame dims
        if hf != hmax:
            plane = np.repeat(plane, hmax // hf, axis=1)
        if vf != vmax:
            plane = np.repeat(plane, vmax // vf, axis=0)
        planes[cid] = plane[:fh, :fw]

    if len(order) == 1:
        return planes[order[0][0]]
    y, cb, cr = (planes[c[0]] for c in comps)
    return _ycbcr_to_rgb(y, cb, cr)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 arrays (dB)."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(d * d))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
