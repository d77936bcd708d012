"""Blocks-table fsck: per-chunk integrity audit with quarantine semantics.

``decode_dataframe`` fails fast on a corrupt chunk — correct for a
pipeline whose output must be bit-exact, but a 100 TB operator first
needs to know *which* chunks are damaged without one poison row killing
the scan. ``fsck_blocks`` runs the full validation ladder per chunk and
returns one status row each instead of raising:

1. payload crc32 vs the manifest ``checksum`` column (bit-rot);
2. frame headers parse (magic/version/codec id) for payload AND lengths;
3. both streams decode;
4. structural invariant: decoded value count == sum of decoded lengths
   == manifest ``n_values``, doc count == ``n_rows``.

The scan is one ``mapInArrow`` pass (same projection as decode);
healthy-chunk cost is dominated by the decode it validates with.
Reference analog: the decoder's per-layer validation-and-skip of foreign
content (/root/reference/mapbox_vector_tile/decoder.py:114-124) — report
and continue, never die mid-tile.

``quarantine_scan`` splits a blocks table into (healthy, damaged) by
joining the report back on ``chunk_id`` — the damaged side is re-fetch /
re-encode work, the healthy side stays decodable immediately.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from ..codec import blocks as B

FSCK_SPARK_SCHEMA = "chunk_id long, status string, error string"
_FSCK_ARROW_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.int64()),
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)

OK = "ok"
BAD_CRC = "bad_crc"
BAD_FRAME = "bad_frame"
BAD_STRUCTURE = "bad_structure"


def _check_one(
    payload: memoryview,
    lengths_blob: memoryview,
    checksum: int,
    n_rows: int,
    n_values: int,
) -> tuple[str, str]:
    if zlib.crc32(payload) != checksum:
        return BAD_CRC, "payload crc32 != manifest checksum"
    try:
        lengths = B.decode_block(lengths_blob).astype(np.int64)
        values = B.decode_block(payload)
    except Exception as e:  # header parse or kernel failure
        return BAD_FRAME, str(e)[:200]
    if lengths.size != n_rows:
        return BAD_STRUCTURE, (
            f"decoded doc count {lengths.size} != manifest n_rows {n_rows}"
        )
    if values.size != int(lengths.sum()) or values.size != n_values:
        return BAD_STRUCTURE, (
            f"decoded values {values.size} != sum(lengths) "
            f"{int(lengths.sum())} / manifest n_values {n_values}"
        )
    return OK, ""


def fsck_blocks(blocks_df: DataFrame) -> DataFrame:
    """One ``(chunk_id, status, error)`` row per chunk; never raises."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("chunk_id")
            payloads = batch.column("payload")
            lens = batch.column("lengths_blob")
            crcs = batch.column("checksum")
            nr = batch.column("n_rows")
            nv = batch.column("n_values")
            rows = []
            for i in range(batch.num_rows):
                status, err = _check_one(
                    memoryview(payloads[i].as_buffer()),
                    memoryview(lens[i].as_buffer()),
                    crcs[i].as_py(),
                    nr[i].as_py(),
                    nv[i].as_py(),
                )
                rows.append((ids[i].as_py(), status, err))
            if rows:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([r[j] for r in rows],
                                 _FSCK_ARROW_SCHEMA.field(j).type)
                        for j in range(3)
                    ],
                    schema=_FSCK_ARROW_SCHEMA,
                )

    return blocks_df.select(
        "chunk_id", "payload", "lengths_blob", "checksum", "n_rows",
        "n_values",
    ).mapInArrow(fn, FSCK_SPARK_SCHEMA)


def fsck_summary(blocks_df: DataFrame) -> DataFrame:
    """``(status, n_chunks)`` rollup — the fleet-health one-liner."""
    return (
        fsck_blocks(blocks_df)
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n_chunks"))
        .orderBy("status")
    )


def quarantine_scan(blocks_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into ``(healthy, damaged)`` blocks DataFrames; the healthy
    side decodes immediately, the damaged side carries the fsck error."""
    report = fsck_blocks(blocks_df)
    healthy = blocks_df.join(
        report.filter(F.col("status") == OK).select("chunk_id"),
        "chunk_id",
    )
    damaged = blocks_df.join(
        report.filter(F.col("status") != OK), "chunk_id"
    )
    return healthy, damaged
