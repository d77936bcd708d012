"""Extra benchmarks (round 6) — NOT part of the driver contract.

``bench.py`` is the frozen driver surface; this file holds the
supplementary measurements OPTIMIZATION_r06.md cites:

  media   single-asset media codec decode throughput (JPEG entropy path,
          GIF/LZW) — the per-symbol loops vectorized in round 6
  kernels single-thread corpus/checksum kernel throughput (the memory-
          traffic rewrites)

Usage: python bench_extra.py [media|kernels|all]
Prints one JSON line per suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _rate(fn, min_s: float = 1.0) -> float:
    fn()  # warm (also fills LUT caches)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < min_s:
        fn()
        n += 1
    return (time.perf_counter() - t0) / n


def bench_media() -> dict:
    from mapbox_vector_tile_spark.functions import gif as GIF
    from mapbox_vector_tile_spark.functions import jpeg as J

    rng = np.random.default_rng(0)
    out: dict = {"suite": "media"}

    # entropy-bound JPEG: dense AC coefficients (worst case for the
    # huffman loop); and the gate-shaped block-constant q100 frame
    noise = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    enc = J.encode_jpeg(noise, quality=90)
    dt = _rate(lambda: J.decode_jpeg(enc))
    out["jpeg_decode_noise_ms"] = round(dt * 1e3, 2)
    out["jpeg_decode_noise_mpx_s"] = round(noise.size / dt / 1e6, 2)

    flat = np.repeat(
        np.repeat(rng.integers(0, 256, (16, 16), dtype=np.uint8), 8, 0), 8, 1
    )
    enc2 = J.encode_jpeg(flat, quality=100)
    dt = _rate(lambda: J.decode_jpeg(enc2))
    out["jpeg_decode_flat_ms"] = round(dt * 1e3, 2)

    fr = rng.integers(0, 16, (4, 64, 64), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    g = GIF.encode_gif(fr, pal)
    dt = _rate(lambda: GIF.decode_gif(g))
    out["gif_decode_4f_ms"] = round(dt * 1e3, 2)

    big = (np.arange(200_000) % 251 % 32).astype(np.uint8).tobytes()
    lz = GIF.lzw_encode(big, 5)
    assert GIF.lzw_decode(lz, 5) == big
    dt = _rate(lambda: GIF.lzw_decode(lz, 5))
    out["lzw_decode_200k_msym_s"] = round(len(big) / dt / 1e6, 1)
    return out


def bench_kernels() -> dict:
    import mapbox_vector_tile_spark.corpus as C

    ids = np.arange(0, 65536, dtype=np.int64)
    lengths, values = C.tokens_flat(ids)
    n = int(values.size)
    out: dict = {"suite": "kernels", "tokens": n}

    dt = _rate(lambda: C.tokens_flat(ids))
    out["tokens_flat_mtok_s"] = round(n / dt / 1e6, 1)

    dt = _rate(lambda: C.doc_checksums(ids, lengths, values, minmax=False))
    out["doc_checksums_mtok_s"] = round(n / dt / 1e6, 1)
    return out


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("media", "all"):
        print(json.dumps(bench_media()))
    if which in ("kernels", "all"):
        print(json.dumps(bench_kernels()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
