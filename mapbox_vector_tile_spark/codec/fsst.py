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
    """Per-position longest symbol match, vectorized per symbol LENGTH.

    Every 8-byte window packs into one little-endian uint64; for each
    symbol length the masked windows are matched against the (sorted)
    symbol keys of that length with one ``searchsorted`` — 8 vectorized
    passes total instead of one full-array scan per symbol (~30x for a
    255-symbol table). Ascending length order makes longer matches
    overwrite shorter ones. Returns ``(best_len, best_code)``;
    ``best_len == 0`` where no symbol matches."""
    n = data.size
    best_len = np.zeros(n, dtype=np.int8)
    best_code = np.zeros(n, dtype=np.uint8)
    if n == 0 or not symbols:
        return best_len, best_code
    pad = np.concatenate([data, np.zeros(MAX_SYMBOL_LEN, np.uint8)])
    w64 = (
        np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(pad, MAX_SYMBOL_LEN)[:n]
        )
        .view("<u8")
        .ravel()
    )
    by_len: dict[int, list[tuple[int, int]]] = {}
    for code, s in enumerate(symbols):
        by_len.setdefault(len(s), []).append(
            (int.from_bytes(s, "little"), code)
        )
    for ln in sorted(by_len):
        if ln > n:
            continue
        entries = sorted(by_len[ln])
        keys = np.array([k for k, _ in entries], dtype=np.uint64)
        codes_ = np.array([c for _, c in entries], dtype=np.uint8)
        masked = w64 & np.uint64((1 << (8 * ln)) - 1)
        pos = np.searchsorted(keys, masked)
        posc = np.minimum(pos, keys.size - 1)
        hit = keys[posc] == masked
        if ln > 1:  # windows running past the end are zero-padded, not data
            hit[n - ln + 1 :] = False
        best_len[hit] = ln
        best_code[hit] = codes_[posc[hit]]
    return best_len, best_code


def _greedy_parse(
    data: np.ndarray, symbols: list[bytes]
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy longest-match tokenization: ``(codes, lengths)`` where code
    255 means an escaped literal byte of length 1.

    Fully vectorized via pointer jumping (binary lifting) over the match
    table: ``succ[i] = i + step[i]`` is the parse's successor function, and
    doubling rounds materialize the whole visited chain from position 0 —
    after round k the frontier holds the positions reached after
    ``0..2^k - 1`` emitted tokens, so ``log2(n)`` vectorized gathers replace
    the former one-iteration-per-token Python loop. Measured warm on a 1 MB
    English-like blob: 116 ms (~8.7 MB/s) vs ~1 s/MB for the loop form
    (tests/test_fsst_strings.py gates parse equivalence vs a reference
    loop)."""
    n = data.size
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    best_len, best_code = _match_table(data, symbols)
    step = np.where(best_len > 0, best_len.astype(np.int64), 1)
    succ = np.minimum(np.arange(n, dtype=np.int64) + step, n)
    succ = np.append(succ, n)  # fixed point: succ[n] = n
    jump = succ
    chain = np.zeros(1, dtype=np.int64)  # positions after 0..2^k-1 tokens
    while chain[-1] < n:
        nxt = jump[chain]  # positions after 2^k..2^{k+1}-1 tokens
        chain = np.concatenate([chain, nxt])
        if nxt[-1] >= n:
            break
        jump = jump[jump]
    visited = chain[: int(np.searchsorted(chain, n, side="left"))]
    lens = step[visited]
    codes = np.where(
        best_len[visited] > 0, best_code[visited], np.uint8(ESCAPE)
    ).astype(np.uint8)
    return codes, lens


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
    pad = np.concatenate([arr, np.zeros(MAX_SYMBOL_LEN, np.uint8)])
    windows = np.lib.stride_tricks.sliding_window_view(pad, MAX_SYMBOL_LEN)
    mask8 = np.array(
        [(1 << (8 * ln)) - 1 for ln in range(MAX_SYMBOL_LEN)]
        + [int((1 << 64) - 1)],
        dtype=np.uint64,
    )
    for _ in range(_ROUNDS):
        # greedily parse the sample with current symbols, counting
        # (symbol, next-symbol) concatenations — vectorized: each candidate
        # concatenation (<= 8 bytes) packs into one little-endian uint64,
        # then np.unique counts per length class (no per-pair Python loop)
        table = sorted(symbols, key=lambda s: (-len(s), s))
        codes, lens = _greedy_parse(arr, table)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ext_counts: dict[bytes, int] = {}
        if lens.size >= 2:
            cat_len = lens[:-1] + lens[1:]
            ok = cat_len <= MAX_SYMBOL_LEN
            st, cl = starts[:-1][ok], cat_len[ok]
            u64 = (
                np.ascontiguousarray(windows[st]).view("<u8").ravel()
                & mask8[cl]
            )
            for ln in np.unique(cl):
                vals, cnts = np.unique(u64[cl == ln], return_counts=True)
                for v, c in zip(vals.astype("<u8"), cnts):
                    ext_counts[v.tobytes()[: int(ln)]] = int(c)
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


def _decode_loop(buf: bytes, symbols: list[bytes]) -> bytes:
    """Reference one-token-per-iteration decoder (parity oracle for tests)."""
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


def decode(buf: bytes, symbols: list[bytes]) -> bytes:
    """Vectorized decode: classify escape starts, then one gather.

    The only sequential ambiguity is runs of consecutive 0xFF bytes (an
    escaped literal may itself be 0xFF): a run's first byte is always a
    code position — the byte before it is not 0xFF, so it cannot be an
    escape — hence within each run, even offsets are escapes and odd
    offsets their literals. That classification is a forward-fill of run
    starts + a parity test, all vectorized — and runs on the compressed
    0xFF index set, so it costs O(#escape bytes). Output assembly: every
    token emits <= max-symbol-length bytes, so L fused gather+scatter
    passes over [flattened symbol table | input] copy everything; pass j
    writes byte j of every token, and descending-j order lets correct
    bytes overwrite tail junk (proof in the inline comment). Measured warm
    on a 1 MB text blob: ~6 ms (~120 MB/s output) vs ~11 ms for the loop
    form — the win is modest because CPython's ``bytearray += bytes`` is
    already amortized-C, but the vectorized form has no per-token
    interpreter cost, which matters when many small blobs decode inside
    one Arrow batch (tests/test_fsst_strings.py gates equivalence vs
    :func:`_decode_loop`, including adversarial 0xFF runs).
    """
    n = len(buf)
    if n == 0:
        return b""
    arr = np.frombuffer(buf, dtype=np.uint8)
    ff_pos = np.flatnonzero(arr == ESCAPE)
    if ff_pos.size:
        # classify on the compressed 0xFF index set, O(#escape bytes):
        # run starts are 0xFF positions not preceded by another 0xFF;
        # forward-fill each run's start, then even offsets are escapes
        run_start = np.concatenate(([True], np.diff(ff_pos) != 1))
        rs = np.maximum.accumulate(np.where(run_start, ff_pos, -1))
        esc_pos = ff_pos[((ff_pos - rs) & 1) == 0]
        if esc_pos[-1] + 1 >= n:
            raise ValueError("truncated escape at end of FSST stream")
        code_mask = np.ones(n, dtype=bool)
        code_mask[esc_pos + 1] = False
        tok_pos = np.flatnonzero(code_mask)
        c = arr[tok_pos]
        is_e = c == ESCAPE
    else:
        tok_pos = np.arange(n, dtype=np.int64)
        c = arr
        is_e = np.zeros(n, dtype=bool)
    if np.any(c[~is_e] >= len(symbols)):
        raise ValueError("FSST code out of symbol-table range")
    sym_lens = np.array([len(s) for s in symbols], dtype=np.int64)
    sym_off = np.concatenate(([0], np.cumsum(sym_lens)))
    sym_flat = np.frombuffer(b"".join(symbols), dtype=np.uint8)
    lens_lut = np.ones(256, dtype=np.int64)
    lens_lut[: len(symbols)] = sym_lens
    lens_lut[ESCAPE] = 1
    src_lut = np.zeros(256, dtype=np.int64)
    src_lut[: len(symbols)] = sym_off[:-1]
    tok_len = lens_lut[c]
    src = np.where(is_e, sym_flat.size + tok_pos + 1, src_lut[c])
    combined = np.concatenate(
        [sym_flat, arr, np.zeros(MAX_SYMBOL_LEN, dtype=np.uint8)]
    )
    starts = np.zeros(tok_len.size, dtype=np.int64)
    np.cumsum(tok_len[:-1], out=starts[1:])
    total = int(starts[-1] + tok_len[-1]) if tok_len.size else 0
    # every token emits <= max symbol length bytes, so L scatter passes copy
    # everything: pass j writes byte j of every token (from one windowed
    # gather). Tail-junk bytes (j >= token length) land inside the NEXT
    # token's span at a smaller j, so descending-j order lets the later,
    # correct pass overwrite them. Scatter indices are decremented in place
    # — no per-pass index-array allocation (the measured hot spot).
    max_len = int(sym_lens.max()) if sym_lens.size else 1
    out = np.empty(total + max_len, dtype=np.uint8)
    si = src
    si += max_len - 1
    so = starts
    so += max_len - 1
    for _ in range(max_len):
        out[so] = combined[si]
        si -= 1
        so -= 1
    return out[:total].tobytes()


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
_SHARED = 2  # payload only; symbol table lives OUTSIDE the blob


def compress(data: bytes, sample: bytes | None = None) -> bytes:
    """Self-contained blob: mode byte + [packed table + payload | raw data].
    Stored mode when compression doesn't pay (fallback-ladder contract)."""
    symbols = train(sample if sample is not None else data)
    body = encode(data, symbols)
    blob = pack_table(symbols) + body
    if len(blob) >= len(data):
        return bytes([_STORED]) + data
    return bytes([_FSST]) + blob


def compress_shared(data: bytes, symbols: list[bytes]) -> bytes:
    """Shared-table blob: mode byte + payload, NO embedded table — the
    caller stores the packed table once per file/column and passes it back
    at decode (``decompress(blob, shared_symbols=...)``). Amortizes both
    the table bytes and the training cost across every chunk that shares
    it (the paper's deployment mode for many small blocks). Falls back to
    stored mode when the shared table doesn't pay for THIS chunk — that
    blob stays self-contained."""
    body = encode(data, symbols)
    if len(body) >= len(data):
        return bytes([_STORED]) + data
    return bytes([_SHARED]) + body


def decompress(
    blob: bytes | memoryview, shared_symbols: list[bytes] | None = None
) -> bytes:
    mv = memoryview(blob)
    if mv[0] == _STORED:
        return bytes(mv[1:])
    if mv[0] == _SHARED:
        if shared_symbols is None:
            raise ValueError(
                "shared-table FSST blob but no shared_symbols supplied"
            )
        return decode(bytes(mv[1:]), shared_symbols)
    symbols, off = unpack_table(mv[1:])
    return decode(bytes(mv[1 + off :]), symbols)
