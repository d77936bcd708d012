"""GIF89a codec — pure stdlib/numpy implementation of the PUBLIC GIF
specification (CompuServe GIF89a, the W3C-archived spec), including a
from-scratch variable-width LZW coder.

Why this codec in an encode engine: LZW is the DICTIONARY-GROWTH family
of compression (vs PNG's LZ77/deflate and the block codecs' static
dictionaries) — with it, the multimodal layer covers one codec from each
major lossless family. Animated GIF also serves as a second compressed
VIDEO container next to motion-JPEG AVI.

Subset (documented, refusal-checked): global color table only, no
interlace, no transparency compositing, full-frame image descriptors
(disposal semantics then reduce to frame replacement — the layout this
module's encoder always writes).

Scale note (frame sampling): GIF has no frame index, but unsampled
frames still cost only a sub-block LENGTH WALK (`_walk_frames` reads one
length byte per <=255-byte block and never runs LZW) — decode work is
O(sampled frames) + O(container bytes) skip cost, the honest bound for
an index-less container.

Reference parity: the reference stores attached media as opaque payload
columns (SURVEY.md multimodal addendum); original implementation from
the public spec.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096  # 12-bit LZW ceiling per spec


# ---------------------------------------------------------------------------
# LZW (GIF variant): LSB-first bit packing, variable width, clear/end codes
# ---------------------------------------------------------------------------

def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Palette-index bytes -> GIF LZW stream (without sub-block framing).

    Emits an initial CLEAR per spec, resets the table when it reaches the
    12-bit ceiling, widens the code size exactly when the decoder will
    (``next_code == (1 << width) + 1``)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset (decoder mirrors on CLEAR)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
        # The decoder appends a table entry for this final data code (the
        # encoder assigns none).  When that append lands exactly on the
        # width capacity (len(table) == 1 << width) the decoder widens
        # before reading END — mirror it so END is written at the width
        # the decoder will read it at.
        if next_code == (1 << width) and width < 12 and next_code < _MAX_CODE:
            width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF LZW stream -> palette-index bytes (classic table-lag decoder:
    append ``prev + entry[0]`` before resolving the current code, widen
    when the table reaches the width capacity).

    Codes are extracted in VECTORIZED SPANS: between width changes every
    code has the same fixed width, and the widen point is predictable
    (``(1 << width) - len(table)`` appends away), so whole spans unpack
    via numpy bit matrices instead of a per-bit shift loop — only the
    table-building walk stays per-code Python. A CLEAR (which resets the
    width unpredictably) or a widen simply ends the span early; unconsumed
    span bits are re-extracted at the new width."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    total = int(bits.size)
    pos = 0
    weights = (1 << np.arange(12, dtype=np.int32))
    while True:
        # codes guaranteed to share this width: the decoder widens only
        # after (1 << width) - len(table) appends, and appends happen at
        # most once per code — a span of that many codes cannot straddle
        # a widen (a CLEAR/widen still ends the span early, checked per
        # code below)
        n_safe = ((1 << width) - len(table)) if width < 12 else (1 << 30)
        n = min(max(n_safe, 1), (total - pos) // width)
        if n <= 0:
            raise ValueError("LZW stream truncated (no END code)")
        codes = (
            bits[pos:pos + n * width].reshape(n, width) @ weights[:width]
        ).tolist()
        w0 = width
        used = 0
        for code in codes:
            used += 1
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                break
            if code == end:
                return bytes(out)
            if prev is not None:
                ln = len(table)
                if code < ln:
                    table.append(prev + table[code][:1])
                elif code == ln:
                    table.append(prev + prev[:1])
                else:
                    raise ValueError(f"LZW code {code} out of range")
                if ln + 1 == (1 << width) and width < 12:
                    width += 1
            elif code >= len(table):
                raise ValueError(f"LZW first code {code} out of range")
            entry = table[code]
            out += entry
            prev = entry
            if width != w0:
                break  # widened: re-extract the rest at the new width
        pos += used * w0


def _sub_blocks(data: bytes) -> bytes:
    """Frame a byte stream into GIF <=255-byte length-prefixed sub-blocks
    plus the 0 terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += payload[pos:pos + n]
        pos += n


def _skip_sub_blocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

def encode_gif(frames: np.ndarray, palette: np.ndarray,
               delay_cs: int = 10) -> bytes:
    """(T, H, W) uint8 palette indices + (P, 3) uint8 palette -> animated
    GIF89a bytes (global color table, full-frame images, disposal 1 =
    leave in place, no transparency — so compositing is exact frame
    replacement)."""
    frames = np.asarray(frames)
    palette = np.asarray(palette)
    if frames.ndim == 2:
        frames = frames[None, :, :]
    if frames.dtype != np.uint8 or palette.dtype != np.uint8:
        raise ValueError("encode_gif expects uint8 frames and palette")
    t, h, w = frames.shape
    p = len(palette)
    if p < 2 or p > 256 or palette.shape[1] != 3:
        raise ValueError(f"palette must be (2..256, 3), got {palette.shape}")
    if int(frames.max()) >= p:
        raise ValueError("frame index exceeds palette size")
    gct_bits = max(1, int(p - 1).bit_length())  # 2^gct_bits entries
    gct = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    gct[:p] = palette
    min_code = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 7), 0, 0)
    out += gct.tobytes()
    # Netscape loop extension (loop forever) — standard for animation
    if t > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for i in range(t):
        out += b"\x21\xf9\x04"  # GCE: disposal=1 (leave), no transparency
        out += struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        out += _sub_blocks(lzw_encode(frames[i].tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)


def _parse_header(payload: bytes):
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    return w, h, gct, pos


def _walk_frames(payload: bytes):
    """Yield ``(frame_index, descriptor, data_pos)`` for every image in
    the stream WITHOUT running LZW — extensions and unsampled frames cost
    one length byte per sub-block."""
    w, h, gct, pos = _parse_header(payload)
    idx = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension: label + sub-blocks
            pos = _skip_sub_blocks(payload, pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, flags = struct.unpack_from("<HHHHB", payload,
                                                      pos + 1)
        if flags & 0x40:
            raise ValueError("interlaced GIF not supported")
        lct = None
        p2 = pos + 10
        if flags & 0x80:
            n = 2 << (flags & 7)
            lct = np.frombuffer(payload, np.uint8, n * 3, p2).reshape(n, 3)
            p2 += n * 3
        yield idx, (left, top, fw, fh, lct, w, h, gct), p2
        idx += 1
        pos = _skip_sub_blocks(payload, p2 + 1)


def gif_headers(payload: bytes) -> tuple[int, int, int]:
    """(n_frames, width, height) from one index-free walk (no LZW)."""
    w, h, _, _ = _parse_header(payload)
    n = sum(1 for _ in _walk_frames(payload))
    return n, w, h


def decode_gif_frames(payload: bytes, indices: np.ndarray) -> np.ndarray:
    """Decode ONLY the requested frame indices -> (len(indices), H, W, 3)
    uint8 RGB. Full-frame images required (this module's encoder always
    writes them); unsampled frames are skipped at sub-block-walk cost."""
    want = {int(i) for i in np.asarray(indices, dtype=np.int64)}
    got: dict[int, np.ndarray] = {}
    shape = None
    for idx, (left, top, fw, fh, lct, w, h, gct), p2 in _walk_frames(payload):
        shape = (h, w)
        if idx not in want:
            continue
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError("partial-frame GIF not supported")
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = payload[p2]
        data, _ = _read_sub_blocks(payload, p2 + 1)
        ind = np.frombuffer(lzw_decode(data, min_code), np.uint8)
        if ind.size != w * h:
            raise ValueError(
                f"GIF frame size mismatch: {ind.size} != {w * h}"
            )
        got[idx] = pal[ind.reshape(h, w)]
    missing = want - set(got)
    if missing:
        raise ValueError(f"GIF frames {sorted(missing)} out of range")
    hh, ww = shape if shape else (0, 0)
    out = np.zeros((len(want), hh, ww, 3), dtype=np.uint8)
    for j, idx in enumerate(sorted(want)):
        out[j] = got[idx]
    return out


def decode_gif(payload: bytes) -> tuple[np.ndarray, int]:
    """All frames -> ((T, H, W, 3) uint8 RGB, frame_delay_cs of the
    first frame's GCE, 10 when absent)."""
    n, w, h = gif_headers(payload)
    frames = decode_gif_frames(payload, np.arange(n))
    # pull the first GCE delay (byte-walk; default 10 cs)
    delay = 10
    pos = _parse_header(payload)[3]
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21 and payload[pos + 1] == 0xF9:
            delay = struct.unpack_from("<H", payload, pos + 4)[0]
            break
        if b == 0x21:
            pos = _skip_sub_blocks(payload, pos + 2)
            continue
        break
    return frames, delay
