"""Distributed vocabulary remap over a blocks table — blocks in, blocks out.

The Spark face of :mod:`..codec.remap`: one Arrow-batched pass that
rewrites each chunk's value metadata in place (dict tables, run values,
constants) and re-encodes only param-free codecs. No shuffle — the plan is
a single ``mapInArrow`` over the blocks scan, so a 100 TB remap is one
read+write of the *compressed* bytes with O(vocabulary) CPU per chunk,
not a decode of the token streams.

The reference's analog is optimise's in-place tile rewrite
(/root/reference/mapbox_vector_tile/optimise.py): transform encoded data
without round-tripping through the full encoder.

Manifest columns are kept consistent with the new payload: ``codec_id`` /
``codec`` (a re-encoded chunk may select a different codec), ``bytes_enc``
and ``checksum`` (crc32 of the new payload) are recomputed; ``bytes_ref``
becomes ``-1`` (the reference-scheme size of the ORIGINAL values is stale
and recomputing it would cost the O(n) pass this operator exists to
avoid). Shape columns (``doc_ids``, ``lengths_blob``, ``n_rows``,
``n_values``, zone maps, buckets) pass through untouched — a remap never
moves a token between documents.

Auxiliary token-domain sidecar columns (e.g. Bloom filters from
:mod:`..codec.bloom`) are NOT rewritten: the output carries exactly the
base blocks schema, and token-domain indexes must be rebuilt over the
remapped table.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ..codec import blocks as B
from ..codec.remap import MapFn, remap_block
from .encode import _BLOCKS_ARROW_SCHEMA, BLOCKS_SPARK_SCHEMA


def remap_blocks(blocks_df: DataFrame, fn: MapFn) -> DataFrame:
    """Apply ``fn`` (vectorized int64 -> int32-safe map) to every token of
    every chunk, returning a new blocks DataFrame with the same schema."""
    base_cols = [f.name for f in _BLOCKS_ARROW_SCHEMA]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column("payload")
            new_payloads, codec_ids, codec_names, sizes, crcs = (
                [], [], [], [], []
            )
            for i in range(batch.num_rows):
                blk, _decoded = remap_block(
                    memoryview(payloads[i].as_buffer()), fn
                )
                info = B.block_info(blk)
                new_payloads.append(blk)
                codec_ids.append(info.codec_id)
                codec_names.append(info.codec)
                sizes.append(len(blk))
                crcs.append(zlib.crc32(blk))
            replaced = {
                "payload": pa.array(new_payloads, pa.binary()),
                "codec_id": pa.array(codec_ids, pa.int32()),
                "codec": pa.array(codec_names, pa.string()),
                "bytes_enc": pa.array(sizes, pa.int64()),
                "checksum": pa.array(crcs, pa.int64()),
                "bytes_ref": pa.array([-1] * batch.num_rows, pa.int64()),
            }
            yield pa.RecordBatch.from_arrays(
                [
                    replaced.get(f.name, batch.column(f.name))
                    for f in _BLOCKS_ARROW_SCHEMA
                ],
                schema=_BLOCKS_ARROW_SCHEMA,
            )

    return blocks_df.select(*base_cols).mapInArrow(run, BLOCKS_SPARK_SCHEMA)
