"""Distributed decode job: blocks DataFrame -> tokens DataFrame.

Inverse of :mod:`.encode`; dispatch is driven entirely by each block's stored
codec id (the manifest), never by assumptions about the encoder's choice —
the engine contract analog of the reference decoder accepting foreign
encoders (/root/reference/mapbox_vector_tile/decoder.py:68-80, SURVEY §2.8).
Round-trip bit-identity is the core contract, the analog of
``assertRoundTrip`` (/root/reference/tests/test_encoder.py:20-50).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from ..codec import blocks as B

TOKENS_OUT_SPARK_SCHEMA = "doc_id string, tokens array<int>, n_tok int"
TOKENS_SRC_OUT_SPARK_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string"
)

_OUT_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
    ]
)

_SRC_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def decode_block_row(
    payload: bytes, lengths_blob: bytes, checksum: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one blocks-table row into ``(lengths, flat_values)``."""
    if checksum is not None and zlib.crc32(payload) != checksum:
        raise ValueError("payload checksum mismatch (corrupt block)")
    lengths = B.decode_block(lengths_blob).astype(np.int64)
    values = B.decode_block(payload)
    if values.size != int(lengths.sum()):
        raise ValueError(
            f"decoded value count {values.size} != sum(lengths) {int(lengths.sum())}"
        )
    return lengths, values


# decode output batching: one Arrow batch per CHUNK is the zero-copy ideal
# for normal (~64k-value) chunks, but tiny chunks (selective decodes,
# min_chunk=0 stores, upsert deltas) would pay per-batch Arrow/JVM overhead
# per handful of rows. Chunks below the flush size accumulate and emit as
# one combined batch (one memcpy of their values — cheap exactly when the
# chunks are small); a chunk at/over it keeps the direct no-copy path.
DECODE_FLUSH_VALUES = 1 << 18
DECODE_FLUSH_ROWS = 1 << 12


def decode_dataframe(
    blocks_df,
    verify_checksum: bool = True,
    with_source: bool = False,
    transform=None,
):
    """blocks DataFrame -> ``(doc_id, tokens, n_tok[, source])`` DataFrame.

    ``with_source`` additionally decodes the per-chunk DICT+FSST string blob
    (requires blocks encoded with ``string_col``).

    ``transform``: optional post-decode hook ``DataFrame -> DataFrame`` —
    the decode-side custom transformer (the reference applies its
    transformer on decode too, /root/reference/mapbox_vector_tile/
    decoder.py:146-149); e.g. ``verify.inverse_transform_tokens`` to map a
    remapped vocabulary back to the original. Applied as a Catalyst
    expression over the decoded frame, so it stays JVM-side."""

    out_schema = _SRC_ARROW_SCHEMA if with_source else _OUT_ARROW_SCHEMA

    _FLUSH_VALUES = DECODE_FLUSH_VALUES
    _FLUSH_ROWS = DECODE_FLUSH_ROWS

    def _build(doc_ids, lengths, values, srcs):
        offsets = np.zeros(lengths.size + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        tokens = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(values, pa.int32())
        ).cast(pa.list_(pa.int32()))
        arrays = [
            doc_ids,
            tokens,
            pa.array(lengths.astype(np.int32), pa.int32()),
        ]
        if with_source:
            arrays.append(srcs)
        return pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..codec.strings import decode_string_chunk

        b_docs: list = []
        b_lens: list = []
        b_vals: list = []
        b_srcs: list = []
        b_nvals = b_nrows = 0

        def flush():
            nonlocal b_nvals, b_nrows
            out = _build(
                pa.concat_arrays(b_docs) if len(b_docs) > 1 else b_docs[0],
                np.concatenate(b_lens) if len(b_lens) > 1 else b_lens[0],
                np.concatenate(b_vals) if len(b_vals) > 1 else b_vals[0],
                (pa.concat_arrays(b_srcs) if len(b_srcs) > 1 else b_srcs[0])
                if with_source else None,
            )
            b_docs.clear(); b_lens.clear(); b_vals.clear(); b_srcs.clear()
            b_nvals = b_nrows = 0
            return out

        for batch in batches:
            payloads = batch.column("payload")
            lengths_blobs = batch.column("lengths_blob")
            checksums = batch.column("checksum")
            doc_ids_col = batch.column("doc_ids")
            src_col = batch.column("source_blob") if with_source else None
            for i in range(batch.num_rows):
                # zero-copy views into the Arrow batch: the compressed
                # stream is never duplicated on the decode hot path
                lengths, values = decode_block_row(
                    memoryview(payloads[i].as_buffer()),
                    memoryview(lengths_blobs[i].as_buffer()),
                    checksums[i].as_py() if verify_checksum else None,
                )
                srcs = None
                if with_source:
                    blob = src_col[i].as_py()
                    if blob is None:
                        raise ValueError(
                            "blocks were encoded without string_col"
                        )
                    srcs = pa.array(decode_string_chunk(blob), pa.string())
                if (
                    not b_docs
                    and (values.size >= _FLUSH_VALUES
                         or lengths.size >= _FLUSH_ROWS)
                ):
                    yield _build(doc_ids_col[i].values, lengths, values,
                                 srcs)
                    continue
                b_docs.append(doc_ids_col[i].values)
                b_lens.append(lengths)
                b_vals.append(values)
                if with_source:
                    b_srcs.append(srcs)
                b_nvals += values.size
                b_nrows += lengths.size
                if b_nvals >= _FLUSH_VALUES or b_nrows >= _FLUSH_ROWS:
                    yield flush()
        if b_docs:
            yield flush()

    cols = ["doc_ids", "lengths_blob", "payload", "checksum"] + (
        ["source_blob"] if with_source else []
    )
    schema_str = TOKENS_SRC_OUT_SPARK_SCHEMA if with_source else TOKENS_OUT_SPARK_SCHEMA
    out = blocks_df.select(*cols).mapInArrow(fn, schema_str)
    return transform(out) if transform is not None else out


def decode_doc_range(blocks_df, lo: str, hi: str, **decode_kwargs):
    """Selective decode of ``doc_id in [lo, hi)`` via zone-map pruning.

    Chunks whose ``[min_doc_id, max_doc_id]`` span does not intersect the
    requested range are dropped BEFORE decode by a Catalyst filter on the
    blocks scan — on a parquet/Iceberg blocks table the predicate reaches
    the reader (``PushedFilters``), so pruned row groups never read their
    ``payload`` bytes at all. Surviving chunks decode normally and a row
    filter trims boundary chunks that straddle the range.

    The point-lookup / range-scan analog of the reference decoding a single
    requested layer out of a multi-layer tile rather than the whole tile
    (/root/reference/mapbox_vector_tile/decoder.py:146-160): both use
    stored per-container metadata to touch only the containers a query
    needs. At 100 TB this is the difference between a metadata-bounded scan
    (chunks overlapping the range, typically one bucket's worth for a
    clustered table) and a full-corpus decode.
    """
    from pyspark.sql import functions as F

    pruned = blocks_df.filter(
        (F.col("max_doc_id") >= lo) & (F.col("min_doc_id") < hi)
    )
    out = decode_dataframe(pruned, **decode_kwargs)
    return out.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))


def decode_doc_ids(blocks_df, ids, verify_checksum: bool = True):
    """Point-lookup decode: tokens of an explicit ``doc_id`` set.

    The random-access read path of the store — "show me these training
    examples" — without a corpus scan. Three pruning layers, cheapest
    first:

    1. a Catalyst range filter on the id set's global envelope
       ``[min(ids), max(ids)]`` over the zone-map columns — this one is a
       plain column predicate, so on a parquet/Iceberg blocks table it
       reaches the scan (``PushedFilters``) and non-overlapping row groups
       never read their ``payload`` bytes;
    2. a per-chunk containment test of each requested id against
       ``[min_doc_id, max_doc_id]`` (``F.exists`` over the literal id
       array, O(|ids|) work per *chunk row*, zone-map-sized — prunes the
       envelope's interior chunks when the set is scattered);
    3. worker-side, the surviving chunk decodes ONLY the requested docs:
       the lengths stream gives each doc's flat span and
       :func:`~..codec.gather.decode_block_gather` resolves the positions
       codec-aware (RLE/CONSTANT/PAGED chunks never inflate their full
       value stream; a one-doc lookup in a sequential-codec chunk still
       decodes once but ships one doc across Arrow/JVM).

    ``ids`` must be point-lookup sized (the literal array and the broadcast
    of it bound the driver plan; ~10^4 is comfortable). For bulk subsets
    use :func:`decode_doc_range` (clustered) or a join after
    :func:`decode_dataframe` (scan-shaped). The per-doc analog of the
    reference decoding one requested layer out of a multi-layer tile
    (/root/reference/mapbox_vector_tile/decoder.py:146-160).
    """
    from pyspark.sql import functions as F

    from ..codec.gather import decode_block_gather

    ids = sorted(set(ids))
    if not ids:
        raise ValueError("ids must be a non-empty collection of doc ids")
    ids_np = np.array(ids, dtype=object)
    want_set = pa.array(ids, pa.string())

    id_arr = F.array(*[F.lit(d) for d in ids])
    pruned = blocks_df.filter(
        (F.col("max_doc_id") >= ids[0]) & (F.col("min_doc_id") <= ids[-1])
    ).filter(
        F.exists(
            id_arr,
            lambda d: (d >= F.col("min_doc_id")) & (d <= F.col("max_doc_id")),
        )
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            payloads = batch.column("payload")
            lengths_blobs = batch.column("lengths_blob")
            checksums = batch.column("checksum")
            doc_ids_col = batch.column("doc_ids")
            mins = batch.column("min_doc_id")
            maxs = batch.column("max_doc_id")
            for i in range(batch.num_rows):
                # re-narrow the sorted id set to this chunk's span so the
                # membership test is against the few ids that can match
                lo = int(np.searchsorted(ids_np, mins[i].as_py(), "left"))
                hi = int(np.searchsorted(ids_np, maxs[i].as_py(), "right"))
                if lo == hi:
                    continue  # zone-map false positive at batch level
                doc_ids = doc_ids_col[i].values
                mask_pa = pc.is_in(doc_ids, value_set=want_set[lo:hi])
                mask = mask_pa.to_numpy(zero_copy_only=False)
                if not mask.any():
                    continue
                payload = memoryview(payloads[i].as_buffer())
                if verify_checksum and zlib.crc32(payload) != checksums[
                    i
                ].as_py():
                    raise ValueError(
                        "payload checksum mismatch (corrupt block)"
                    )
                lengths = B.decode_block(
                    memoryview(lengths_blobs[i].as_buffer())
                ).astype(np.int64)
                starts = np.zeros(lengths.size, dtype=np.int64)
                np.cumsum(lengths[:-1], out=starts[1:])
                sel = np.flatnonzero(mask)
                out_lens = lengths[sel]
                total_out = int(out_lens.sum())
                if total_out:
                    out_starts = np.zeros(out_lens.size, dtype=np.int64)
                    np.cumsum(out_lens[:-1], out=out_starts[1:])
                    idx = np.arange(total_out, dtype=np.int64)
                    idx += np.repeat(starts[sel] - out_starts, out_lens)
                    values, _ = decode_block_gather(payload, idx)
                else:
                    values = np.zeros(0, dtype=np.int32)
                offsets = np.zeros(out_lens.size + 1, dtype=np.int64)
                np.cumsum(out_lens, out=offsets[1:])
                tokens = pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(values, pa.int32())
                ).cast(pa.list_(pa.int32()))
                yield pa.RecordBatch.from_arrays(
                    [
                        doc_ids.filter(mask_pa),
                        tokens,
                        pa.array(out_lens.astype(np.int32), pa.int32()),
                    ],
                    schema=_OUT_ARROW_SCHEMA,
                )

    cols = [
        "doc_ids", "lengths_blob", "payload", "checksum",
        "min_doc_id", "max_doc_id",
    ]
    return pruned.select(*cols).mapInArrow(fn, TOKENS_OUT_SPARK_SCHEMA)


def decode_doc_ids_df(blocks_df, ids_df, verify_checksum: bool = True):
    """Join-shaped bulk point-lookup decode: the requested ``doc_id`` set
    arrives as a DataFrame and NEVER routes through the driver.

    The delete-wave / GDPR-purge companion to :func:`decode_doc_ids`:
    that overload is right for interactive lookups (ids become plan
    literals, ~10^4 is the comfort bound); this one handles an unbounded
    id set — a CDC delete window, a takedown list — as two joins whose
    shuffles carry only metadata:

    1. each chunk's ``doc_ids`` array is ``explode``d to
       ``(chunk_id, doc_id)`` rows (the payload column is pruned out of
       this scan) and equi-joined to the distinct id set — shuffle
       volume is doc-id strings + ints, never payload bytes;
    2. matched ids fold to one sorted per-chunk ``__want`` array
       (bounded by docs-per-chunk) and join back to the blocks table on
       ``chunk_id`` — AQE broadcasts the matched side when small, and
       the inner join prunes every untouched chunk before its payload is
       read;
    3. worker-side, each surviving chunk membership-tests its OWN
       ``doc_ids`` against ``__want`` and decodes only the matching
       docs' spans via the codec-aware positional gather, exactly as the
       literal-id path does.

    Joining back id VALUES (not positions) makes ``chunk_id``
    collisions harmless: ``chunk_id`` is only unique within one encode
    run, and a union of several commits (the snapshot/matview read
    shape) can repeat it — colliding chunks then receive the UNION of
    their matched ids, and the per-row membership test restores
    exactness (every id in ``__want`` is a requested id; each chunk
    decodes requested ∩ own docs).

    Returns the standard ``(doc_id, tokens, n_tok)`` frame; an empty
    ``ids_df`` yields an empty result of the same schema.
    """
    from pyspark.sql import functions as F

    from ..codec.gather import decode_block_gather

    ids = (
        ids_df.select(F.col("doc_id").cast("string").alias("doc_id"))
        .distinct()
    )
    pos = blocks_df.select(
        "chunk_id", F.explode("doc_ids").alias("doc_id")
    )
    matched = (
        pos.join(ids, "doc_id")
        .groupBy("chunk_id")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("__want"))
    )
    hit = blocks_df.join(matched, "chunk_id").select(
        "doc_ids", "lengths_blob", "payload", "checksum", "__want"
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column("payload")
            lengths_blobs = batch.column("lengths_blob")
            checksums = batch.column("checksum")
            doc_ids_col = batch.column("doc_ids")
            wants = batch.column("__want")
            for i in range(batch.num_rows):
                doc_ids = doc_ids_col[i].values
                want = np.asarray(wants[i].values, dtype=object)
                sel = np.flatnonzero(
                    np.isin(np.asarray(doc_ids, dtype=object), want)
                ).astype(np.int64)
                if sel.size == 0:
                    continue
                payload = memoryview(payloads[i].as_buffer())
                if verify_checksum and zlib.crc32(payload) != checksums[
                    i
                ].as_py():
                    raise ValueError(
                        "payload checksum mismatch (corrupt block)"
                    )
                lengths = B.decode_block(
                    memoryview(lengths_blobs[i].as_buffer())
                ).astype(np.int64)
                starts = np.zeros(lengths.size, dtype=np.int64)
                np.cumsum(lengths[:-1], out=starts[1:])
                out_lens = lengths[sel]
                total_out = int(out_lens.sum())
                if total_out:
                    out_starts = np.zeros(out_lens.size, dtype=np.int64)
                    np.cumsum(out_lens[:-1], out=out_starts[1:])
                    idx = np.arange(total_out, dtype=np.int64)
                    idx += np.repeat(starts[sel] - out_starts, out_lens)
                    values, _ = decode_block_gather(payload, idx)
                else:
                    values = np.zeros(0, dtype=np.int32)
                offsets = np.zeros(out_lens.size + 1, dtype=np.int64)
                np.cumsum(out_lens, out=offsets[1:])
                tokens = pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(values, pa.int32())
                ).cast(pa.list_(pa.int32()))
                yield pa.RecordBatch.from_arrays(
                    [
                        doc_ids.take(pa.array(sel, pa.int64())),
                        tokens,
                        pa.array(out_lens.astype(np.int32), pa.int32()),
                    ],
                    schema=_OUT_ARROW_SCHEMA,
                )

    return hit.mapInArrow(fn, TOKENS_OUT_SPARK_SCHEMA)


def decode_prefix_dataframe(blocks_df, k: int, verify_checksum: bool = True):
    """Max-sequence-length truncation decode: ``tokens[:k]`` per document.

    The universal training-pipeline step "truncate every sequence to the
    model's context length" without ever materializing the full arrays:
    per chunk, the lengths stream gives each doc's flat start offset, the
    first ``min(k, n_tok)`` positions of every doc become one sorted gather
    index, and :func:`~..codec.gather.decode_block_gather` resolves them
    codec-aware (CONSTANT/RLE/PAGED chunks never inflate their full value
    stream; see that module for the per-codec cost table). ``n_tok`` in the
    output is the ORIGINAL length, so downstream can tell truncated docs
    (``size(tokens) < n_tok``) from short ones.

    At 100 TB the win is twofold: sequential-codec chunks still decode once
    but emit only O(k·docs) values into Arrow/JVM (materialization + transfer
    dominate decode at >200 M tok/s kernel speed), and RLE/CONSTANT/PAGED
    chunks skip the inflation entirely. The per-doc analog of the reference
    decoding a single layer out of a multi-layer tile
    (/root/reference/mapbox_vector_tile/decoder.py:146-160).
    """
    if k < 0:
        raise ValueError("prefix length k must be >= 0")

    from ..codec.gather import decode_block_gather

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column("payload")
            lengths_blobs = batch.column("lengths_blob")
            checksums = batch.column("checksum")
            doc_ids_col = batch.column("doc_ids")
            for i in range(batch.num_rows):
                payload = memoryview(payloads[i].as_buffer())
                if verify_checksum and zlib.crc32(payload) != checksums[
                    i
                ].as_py():
                    raise ValueError(
                        "payload checksum mismatch (corrupt block)"
                    )
                lengths = B.decode_block(
                    memoryview(lengths_blobs[i].as_buffer())
                ).astype(np.int64)
                out_lens = np.minimum(lengths, k)
                total_out = int(out_lens.sum())
                if total_out:
                    starts = np.zeros(lengths.size, dtype=np.int64)
                    np.cumsum(lengths[:-1], out=starts[1:])
                    out_starts = np.zeros(out_lens.size, dtype=np.int64)
                    np.cumsum(out_lens[:-1], out=out_starts[1:])
                    idx = np.arange(total_out, dtype=np.int64)
                    idx += np.repeat(starts - out_starts, out_lens)
                    values, _ = decode_block_gather(payload, idx)
                else:
                    values = np.zeros(0, dtype=np.int32)
                offsets = np.zeros(out_lens.size + 1, dtype=np.int64)
                np.cumsum(out_lens, out=offsets[1:])
                tokens = pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(values, pa.int32())
                ).cast(pa.list_(pa.int32()))
                yield pa.RecordBatch.from_arrays(
                    [
                        doc_ids_col[i].values,
                        tokens,
                        pa.array(lengths.astype(np.int32), pa.int32()),
                    ],
                    schema=_OUT_ARROW_SCHEMA,
                )

    cols = ["doc_ids", "lengths_blob", "payload", "checksum"]
    return blocks_df.select(*cols).mapInArrow(fn, TOKENS_OUT_SPARK_SCHEMA)


def decode_padded_dataframe(
    blocks_df, k: int, pad_id: int, verify_checksum: bool = True
):
    """Rectangular trainer egress: every doc as EXACTLY ``k`` tokens —
    truncated via the codec-aware gather (:func:`decode_prefix_dataframe`),
    then right-padded with ``pad_id`` as a Catalyst ``concat`` /
    ``array_repeat`` projection (JVM-side, no second Python pass).

    Output: ``(doc_id, tokens[k], n_fill, n_tok)`` — ``n_fill`` is the
    real-token count (the attention-mask length a trainer derives masks
    from), ``n_tok`` the original document length. The padding projection
    is map-side on the decode output; total egress is O(k·docs) exactly,
    which is what a fixed-shape tensor consumer reads anyway.
    """
    if k < 0:
        raise ValueError("target length k must be >= 0")
    from pyspark.sql import functions as F

    out = decode_prefix_dataframe(blocks_df, k, verify_checksum)
    fill = F.least(F.col("n_tok"), F.lit(k))
    return out.select(
        "doc_id",
        F.concat(
            "tokens",
            F.array_repeat(F.lit(int(pad_id)).cast("int"), F.lit(k) - fill),
        ).alias("tokens"),
        fill.cast("int").alias("n_fill"),
        "n_tok",
    )


def decode_suffix_dataframe(blocks_df, k: int, verify_checksum: bool = True):
    """Last-``k`` truncation decode: ``tokens[-k:]`` per document.

    The mirror of :func:`decode_prefix_dataframe` for recency-shaped reads
    — "the most recent context window of every sequence" (chat history
    tails, streaming continuation) — via the same codec-aware positional
    gather: each doc's last ``min(k, n_tok)`` flat positions form one
    sorted gather index (suffix spans are disjoint and ascending because
    doc spans are), so RLE/CONSTANT/PAGED chunks never inflate their full
    stream and Arrow/JVM egress is O(k·docs). ``n_tok`` stays the ORIGINAL
    length so truncated docs remain distinguishable.
    """
    if k < 0:
        raise ValueError("suffix length k must be >= 0")

    from ..codec.gather import decode_block_gather

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column("payload")
            lengths_blobs = batch.column("lengths_blob")
            checksums = batch.column("checksum")
            doc_ids_col = batch.column("doc_ids")
            for i in range(batch.num_rows):
                payload = memoryview(payloads[i].as_buffer())
                if verify_checksum and zlib.crc32(payload) != checksums[
                    i
                ].as_py():
                    raise ValueError(
                        "payload checksum mismatch (corrupt block)"
                    )
                lengths = B.decode_block(
                    memoryview(lengths_blobs[i].as_buffer())
                ).astype(np.int64)
                out_lens = np.minimum(lengths, k)
                total_out = int(out_lens.sum())
                if total_out:
                    starts = np.zeros(lengths.size, dtype=np.int64)
                    np.cumsum(lengths[:-1], out=starts[1:])
                    # suffix span of doc d starts at starts[d] + n_d - out_d
                    sel_starts = starts + lengths - out_lens
                    out_starts = np.zeros(out_lens.size, dtype=np.int64)
                    np.cumsum(out_lens[:-1], out=out_starts[1:])
                    idx = np.arange(total_out, dtype=np.int64)
                    idx += np.repeat(sel_starts - out_starts, out_lens)
                    values, _ = decode_block_gather(payload, idx)
                else:
                    values = np.zeros(0, dtype=np.int32)
                offsets = np.zeros(out_lens.size + 1, dtype=np.int64)
                np.cumsum(out_lens, out=offsets[1:])
                tokens = pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(values, pa.int32())
                ).cast(pa.list_(pa.int32()))
                yield pa.RecordBatch.from_arrays(
                    [
                        doc_ids_col[i].values,
                        tokens,
                        pa.array(lengths.astype(np.int32), pa.int32()),
                    ],
                    schema=_OUT_ARROW_SCHEMA,
                )

    cols = ["doc_ids", "lengths_blob", "payload", "checksum"]
    return blocks_df.select(*cols).mapInArrow(fn, TOKENS_OUT_SPARK_SCHEMA)
