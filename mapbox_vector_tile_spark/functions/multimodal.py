"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning) is real
and tested; the actual media decoding is STUBBED — the container has no
image/audio libraries — behind :data:`REAL_DECODERS_AVAILABLE`. The stub
"decoder" is a deterministic function of the payload bytes so tests can pin
outputs. Swap ``_fake_decode_image`` for a PIL/ffmpeg call on a real cluster.

Pattern: ``mapInPandas`` over an assets table
``(asset_id string, kind string, payload binary, meta map<string,string>)``;
one Arrow batch in -> one feature batch out, never per-row Python dispatch.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

ASSETS_SCHEMA = "asset_id string, kind string, payload binary, meta map<string,string>"
FEATURES_SCHEMA = (
    "asset_id string, kind string, n_bytes long, crc32 long, "
    "width int, height int, feat array<float>"
)

try:  # real decoders would be imported here (PIL, soundfile, av, ...)
    import PIL.Image  # noqa: F401

    REAL_DECODERS_AVAILABLE = True
except Exception:
    REAL_DECODERS_AVAILABLE = False

FEAT_DIM = 16


def _fake_decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decode + feature extraction.

    Derives (width, height, feature-vector) purely from the payload bytes —
    stable across runs/engines — so all downstream plumbing is testable.
    """
    h = hashlib.md5(payload).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feat = (
        np.frombuffer(h, dtype=np.uint8).astype(np.float32).repeat(2)[:FEAT_DIM]
        / 255.0
    )
    return width, height, feat


def extract_features(assets: DataFrame) -> DataFrame:
    """assets table -> per-asset features via Arrow-batched ``mapInPandas``."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                if kind == "image":
                    if REAL_DECODERS_AVAILABLE:
                        raise NotImplementedError(
                            "real image decode not wired in this container"
                        )
                    w, hgt, feat = _fake_decode_image(payload)
                else:  # audio/video: same stub path, no spatial dims
                    w = hgt = -1
                    _, _, feat = _fake_decode_image(payload)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        "n_bytes": len(payload),
                        "crc32": zlib.crc32(payload),
                        "width": w,
                        "height": hgt,
                        "feat": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        fn, FEATURES_SCHEMA
    )


def synthetic_assets(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake assets table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                payload = rng.integers(0, 256, 64 + int(i) % 128, dtype=np.uint8)
                rows.append(
                    {
                        "asset_id": f"asset-{int(i):06d}",
                        "kind": kind,
                        "payload": payload.tobytes(),
                        "meta": {"idx": str(int(i))},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, ASSETS_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* (which frames to decode) — pure Catalyst:
    the decode itself is the stubbed heavy step, the plan is cheap metadata."""
    n_frames = (F.length("payload") % 300 + 1).cast("int")
    return assets.filter(F.col("kind") == "video").select(
        "asset_id",
        n_frames.alias("n_frames"),
        F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)).alias("frame_indices"),
    )
