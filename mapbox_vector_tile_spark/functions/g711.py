"""G.711 mu-law audio codec — pure numpy, vectorized, no audio libraries.

Implements the PUBLIC ITU-T G.711 mu-law companding spec (the classic
8-bit telephony codec): 2:1 compressed audio with logarithmic
quantization. Unlike PNG/JPEG this is a LOSSY codec with a *closed-form
per-sample* transfer function — decode(encode(s)) is a pure integer
formula of s — so a SQL oracle can recompute every decoded sample from
the original signal and the content-stats gate stays hash-exact even
though the codec is lossy (same discipline as the block-constant MJPEG
gate, but with zero content restrictions).

Container: RIFF/WAVE with ``WAVE_FORMAT_MULAW`` (format tag 7, 8 bits
per sample) plus the ``fact`` chunk the WAV spec requires for non-PCM
formats. The stdlib ``wave`` module refuses non-PCM, so
:func:`decode_wav_mulaw` walks the RIFF chunks directly.

Reference parity: the reference engine stores attached media as opaque
payloads (SURVEY.md multimodal addendum); this codec is an original
implementation from the public spec.

Scale notes: encode/decode are branch-free numpy over whole sample
arrays (a 256-entry LUT on decode); they run inside executor-side Arrow
batches via ``content_stats`` / ``extract_features`` — no per-row
Python, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np

_BIAS = 0x84  # 132
_CLIP = 32635

# exp = index of the G.711 segment: mag in [2^(7+e), 2^(8+e)) for e>=1,
# [BIAS, 256) for e=0 (mag is biased, so always >= 132)
_SEG_BOUNDS = np.array([256, 512, 1024, 2048, 4096, 8192, 16384],
                       dtype=np.int32)


def encode_mulaw(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> uint8 mu-law codes (vectorized, branch-free)."""
    s = np.asarray(samples, dtype=np.int16).astype(np.int32)
    sign = np.where(s < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(s), _CLIP) + _BIAS
    exp = np.searchsorted(_SEG_BOUNDS, mag, side="right").astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _decode_lut() -> np.ndarray:
    c = np.arange(256, dtype=np.int32)
    ci = ~c & 0xFF
    sign = ci & 0x80
    exp = (ci >> 4) & 0x07
    mant = ci & 0x0F
    t = (((mant << 3) + _BIAS) << exp) - _BIAS
    return np.where(sign != 0, -t, t).astype(np.int16)


_LUT = _decode_lut()


def decode_mulaw(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 PCM (256-entry LUT gather)."""
    return _LUT[np.asarray(codes, dtype=np.uint8)]


def quantize_mulaw(samples: np.ndarray) -> np.ndarray:
    """The codec's closed-form transfer function:
    ``decode(encode(s))`` as one vectorized formula — what the SQL
    oracle mirrors."""
    return decode_mulaw(encode_mulaw(samples))


# ---------------------------------------------------------------------------
# WAV container, format tag 7 (WAVE_FORMAT_MULAW)
# ---------------------------------------------------------------------------

def encode_wav_mulaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 samples -> mu-law WAV bytes. Container size is closed-form:
    ``58 + n + (n % 2)`` (12 RIFF + 26 fmt(18) + 12 fact + 8 data header
    + n codes + RIFF even-padding)."""
    codes = encode_mulaw(samples).tobytes()
    n = len(codes)
    pad = b"\x00" if n % 2 else b""
    fmt = struct.pack("<HHIIHHH", 7, 1, rate, rate, 1, 8, 0)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n)
            + b"data" + struct.pack("<I", n) + codes + pad)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_mulaw(payload: bytes) -> tuple[np.ndarray, int]:
    """mu-law WAV bytes -> (int16 samples, sample_rate). Walks RIFF
    chunks directly (stdlib ``wave`` rejects non-PCM)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8:pos + 8 + clen]
        if ctype == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif ctype == b"data":
            data = chunk
        pos += 8 + clen + (clen % 2)  # RIFF chunks are even-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byterate, _align, bits = fmt
    if tag != 7 or bits != 8:
        raise ValueError(f"not a mu-law WAV (tag={tag}, bits={bits})")
    samples = decode_mulaw(np.frombuffer(data, dtype=np.uint8))
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return samples, rate


def wav_format_tag(payload: bytes) -> int:
    """Sniff the WAV format tag (1 = PCM, 7 = mu-law) without decoding."""
    pos = 12
    while pos + 8 <= len(payload):
        ctype = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if ctype == b"fmt ":
            return struct.unpack_from("<H", payload, pos + 8)[0]
        pos += 8 + clen + (clen % 2)
    raise ValueError("WAV missing fmt chunk")


# The SQL mirror of quantize_mulaw, parameterized on the input sample
# expression. exp = #(segment bounds <= mag) matches searchsorted
# side='right'; all arithmetic is integer-exact.
def mulaw_quantize_sql(sample_expr: str) -> str:
    """DuckDB SQL expression computing ``quantize_mulaw({sample_expr})``."""
    s = sample_expr
    mag = f"(LEAST(ABS({s}), 32635) + 132)"
    exp = (f"(CASE WHEN {mag} >= 16384 THEN 7 WHEN {mag} >= 8192 THEN 6 "
           f"WHEN {mag} >= 4096 THEN 5 WHEN {mag} >= 2048 THEN 4 "
           f"WHEN {mag} >= 1024 THEN 3 WHEN {mag} >= 512 THEN 2 "
           f"WHEN {mag} >= 256 THEN 1 ELSE 0 END)")
    mant = f"(({mag} // (1 << ({exp} + 3))) % 16)"
    t = f"((({mant} * 8 + 132) * (1 << {exp})) - 132)"
    return f"(CASE WHEN {s} < 0 THEN -{t} ELSE {t} END)"
