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

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
_ROUNDS = 4


def train(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Build a symbol table from a sample: start from frequent single bytes,
    then repeatedly extend symbols by merging adjacent matches."""
    if not sample:
        return []
    # round 0: frequent single bytes
    counts: dict[bytes, int] = {}
    for b in sample:
        s = bytes([b])
        counts[s] = counts.get(s, 0) + 1
    symbols = {s for s, c in counts.items() if c >= 2}
    for _ in range(_ROUNDS):
        # greedily parse the sample with current symbols, counting
        # (symbol, next-symbol) concatenations
        table = sorted(symbols, key=len, reverse=True)
        ext_counts: dict[bytes, int] = {}
        i = 0
        prev: bytes | None = None
        while i < len(sample):
            match = None
            for s in table:
                if sample[i : i + len(s)] == s:
                    match = s
                    break
            if match is None:
                match = sample[i : i + 1]
            if prev is not None and len(prev) + len(match) <= MAX_SYMBOL_LEN:
                cat = prev + match
                ext_counts[cat] = ext_counts.get(cat, 0) + 1
            prev = match
            i += len(match)
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
    """Greedy longest-match substitution; unmatched bytes are escaped."""
    # index symbols by first byte for fast candidate lookup
    by_first: dict[int, list[tuple[bytes, int]]] = {}
    for idx, s in enumerate(symbols):
        by_first.setdefault(s[0], []).append((s, idx))
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        best = None
        for s, idx in by_first.get(data[i], ()):
            if data[i : i + len(s)] == s:
                best = (s, idx)
                break  # lists are longest-first by construction
        if best is None:
            out.append(ESCAPE)
            out.append(data[i])
            i += 1
        else:
            out.append(best[1])
            i += len(best[0])
    return bytes(out)


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
