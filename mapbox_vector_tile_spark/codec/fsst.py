"""FSST-style symbol-table byte compression (for string chunks).

Implements the core of "FSST: Fast Random Access String Compression"
(Boncz, Neumann, Leis — VLDB 2020, public paper): a table of up to 255
multi-byte symbols replaces frequent substrings with 1-byte codes; byte 255
escapes a literal. Training is the paper's iterative "count pairs, keep the
most valuable" bottom-up construction, simplified to a fixed number of
rounds. This engine scopes FSST to per-chunk *string dictionary blobs* (the
`source` column and string dictionaries), which are small — the hot token
path stays in the numeric kernels.

No reference-code lineage: mapbox-vector-tile has no string compressor; its
per-layer key/value dictionary (encoder.py:241-266) is the structural slot
FSST plugs into (dictionary blob gets byte-compressed).
"""

from __future__ import annotations

import struct

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
_ROUNDS = 4
# Training is sample-based (as in the paper): cost is bounded regardless of
# input size. Encode is vectorized (match table below), so only the jump
# scan is a Python loop — one iteration per emitted token, not per byte.
TRAIN_SAMPLE_CAP = 1 << 16


def _match_table(
    data: np.ndarray, symbols: list[bytes]
) -> tuple[np.ndarray, np.ndarray]:
    """Per-position longest symbol match, vectorized per symbol.

    Returns ``(best_len, best_code)`` arrays over positions; ``best_len==0``
    where no symbol matches. Iterates symbols by ascending length so longer
    matches overwrite shorter ones (two distinct symbols of equal length
    cannot match the same position)."""
    n = data.size
    best_len = np.zeros(n, dtype=np.int8)
    best_code = np.zeros(n, dtype=np.uint8)
    for code, s in sorted(enumerate(symbols), key=lambda t: len(t[1])):
        ln = len(s)
        if ln > n:
            continue
        m = data[: n - ln + 1] == s[0]
        for j in range(1, ln):
            m &= data[j : n - ln + 1 + j] == s[j]
        sel = np.flatnonzero(m)
        best_len[sel] = ln
        best_code[sel] = code
    return best_len, best_code


def _greedy_parse(
    data: np.ndarray, symbols: list[bytes]
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy longest-match tokenization: ``(codes, lengths)`` where code
    255 means an escaped literal byte of length 1."""
    n = data.size
    best_len, best_code = _match_table(data, symbols)
    codes = np.empty(n, dtype=np.uint8)
    lens = np.empty(n, dtype=np.int64)
    i = t = 0
    while i < n:
        ln = int(best_len[i])
        if ln:
            codes[t] = best_code[i]
            lens[t] = ln
            i += ln
        else:
            codes[t] = ESCAPE
            lens[t] = 1
            i += 1
        t += 1
    return codes[:t], lens[:t]


def train(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Build a symbol table from a (capped) sample: start from frequent
    single bytes, then repeatedly extend symbols by merging adjacent
    matches (the paper's bottom-up construction, fixed rounds)."""
    sample = sample[:TRAIN_SAMPLE_CAP]
    if not sample:
        return []
    arr = np.frombuffer(sample, dtype=np.uint8)
    byte_counts = np.bincount(arr, minlength=256)
    counts = {
        bytes([b]): int(c) for b, c in enumerate(byte_counts) if c >= 2
    }
    symbols = set(counts)
    for _ in range(_ROUNDS):
        # greedily parse the sample with current symbols, counting
        # (symbol, next-symbol) concatenations
        table = sorted(symbols, key=lambda s: (-len(s), s))
        codes, lens = _greedy_parse(arr, table)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ext_counts: dict[bytes, int] = {}
        for k in range(len(lens) - 1):
            cat_len = int(lens[k] + lens[k + 1])
            if cat_len <= MAX_SYMBOL_LEN:
                cat = sample[starts[k] : starts[k] + cat_len]
                ext_counts[cat] = ext_counts.get(cat, 0) + 1
        # keep the most valuable symbols: gain = (len-1) * count
        candidates = {**{s: counts.get(s, 1) for s in symbols}, **ext_counts}
        ranked = sorted(
            candidates.items(),
            key=lambda kv: ((len(kv[0]) - 1) * kv[1], kv[0]),
            reverse=True,
        )
        symbols = {s for s, _ in ranked[:max_symbols] if len(s) <= MAX_SYMBOL_LEN}
    # deterministic order: longest first, then lexicographic
    return sorted(symbols, key=lambda s: (-len(s), s))[:max_symbols]


def encode(data: bytes, symbols: list[bytes]) -> bytes:
    """Greedy longest-match substitution; unmatched bytes are escaped.
    Match candidates come from the vectorized per-position table; the
    remaining loop is one iteration per emitted token."""
    if not data:
        return b""
    arr = np.frombuffer(data, dtype=np.uint8)
    codes, lens = _greedy_parse(arr, symbols)
    escapes = codes == ESCAPE
    out = np.empty(codes.size + int(np.count_nonzero(escapes)), dtype=np.uint8)
    # lay out [code] for matches and [ESCAPE, literal] for escapes in one
    # vectorized scatter: output offset = index + (# escapes before it)
    off = np.arange(codes.size) + np.concatenate(
        ([0], np.cumsum(escapes.astype(np.int64))[:-1])
    )
    out[off] = codes
    if escapes.any():
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        out[off[escapes] + 1] = arr[starts[escapes]]
    return out.tobytes()


def decode(buf: bytes, symbols: list[bytes]) -> bytes:
    out = bytearray()
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if c == ESCAPE:
            out.append(buf[i + 1])
            i += 2
        else:
            out += symbols[c]
            i += 1
    return bytes(out)


def pack_table(symbols: list[bytes]) -> bytes:
    head = struct.pack("<B", len(symbols))
    return head + b"".join(struct.pack("<B", len(s)) + s for s in symbols)


def unpack_table(buf: bytes | memoryview) -> tuple[list[bytes], int]:
    mv = memoryview(buf)
    (k,) = struct.unpack_from("<B", mv)
    off = 1
    symbols = []
    for _ in range(k):
        (ln,) = struct.unpack_from("<B", mv, off)
        off += 1
        symbols.append(bytes(mv[off : off + ln]))
        off += ln
    return symbols, off


_STORED = 0
_FSST = 1


def compress(data: bytes, sample: bytes | None = None) -> bytes:
    """Self-contained blob: mode byte + [packed table + payload | raw data].
    Stored mode when compression doesn't pay (fallback-ladder contract)."""
    symbols = train(sample if sample is not None else data)
    body = encode(data, symbols)
    blob = pack_table(symbols) + body
    if len(blob) >= len(data):
        return bytes([_STORED]) + data
    return bytes([_FSST]) + blob


def decompress(blob: bytes | memoryview) -> bytes:
    mv = memoryview(blob)
    if mv[0] == _STORED:
        return bytes(mv[1:])
    symbols, off = unpack_table(mv[1:])
    return decode(bytes(mv[1 + off :]), symbols)
