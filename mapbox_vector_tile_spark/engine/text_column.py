"""Text-column encode: FSST+dictionary string chunks over a corpus column.

The string sibling of :mod:`.columnar` (scalar int32 columns): the raw
``documents.text`` column is stored as the engine's own string chunks —
per-chunk frequency-ordered dictionary with the dictionary blob
FSST-compressed (:mod:`..codec.strings`), rows as bit-packed indices.
This puts FSST in a *shipping data path* over a real corpus column, not
just the per-chunk dict blobs of the token pipeline: duplicate texts
dedupe through the dictionary, near-duplicate word-soup compresses
through the shared symbol table.

Layout discipline matches the scalar path exactly:

- chunk assignment ``chunk = order_key >> log2(chunk_rows)``, in-chunk
  order = the order key — a pure function of the data, deterministic
  across parallelism and row order (the resume/oracle property);
- encode is ``applyInPandas`` per chunk: one shuffle on the chunk id,
  O(chunk_rows) working memory per task;
- decode is a stateless ``mapInArrow`` over block rows emitting
  ``(chunk, pos, text)``; positions reconstruct the total order.

At 100 TB this is the same range-partitionable repartition-encode as the
scalar column; the FSST table is trained per chunk so no global state
exists. Reference analog: the per-layer deduplicated string table
(/root/reference/mapbox_vector_tile/encoder.py:241-266) — generalized to
arbitrary table columns and a trained symbol table.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..codec.strings import decode_string_chunk, encode_string_chunk

CHUNK_ROWS = 256

_BLOCKS_SCHEMA = (
    "chunk long, n_rows long, bytes_enc long, bytes_raw long, "
    "payload binary, fsst_table binary"
)


def train_shared_fsst_table(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    sample_rows: int = 256,
) -> bytes:
    """One FSST symbol table for a whole column: trained on a DETERMINISTIC
    sample (the ``sample_rows`` lowest order keys — resume/oracle-stable
    across parallelism), packed with :func:`..codec.fsst.pack_table`.
    Sharing it across every chunk amortizes training cost (the expensive
    FSST step) and removes the per-chunk table bytes; the paper deploys
    exactly this way over many small blocks."""
    from ..codec import fsst

    sample = (
        df.select(F.col(text_col).cast("string").alias("t"),
                  F.col(order_col).alias("k"))
        .orderBy("k")
        .limit(sample_rows)
        .collect()
    )
    blob = "\n".join(r.t for r in sample if r.t is not None).encode()
    return fsst.pack_table(fsst.train(blob))


def encode_text_column(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    chunk_rows: int = CHUNK_ROWS,
    shared_table: bytes | None = None,
) -> DataFrame:
    """Encode ``text_col`` into string chunks, chunked and ordered by the
    integer ``order_col``. Without ``shared_table`` each chunk embeds its
    own FSST table (self-describing). With it (see
    :func:`train_shared_fsst_table`) chunks encode against the ONE shared
    table and carry it in the ``fsst_table`` column — byte-identical
    across rows, so parquet's dictionary encoding stores it once per row
    group while every row stays independently decodable."""
    chunk = (
        (F.col(order_col) - F.pmod(F.col(order_col), F.lit(chunk_rows)))
        / chunk_rows
    ).cast("long")
    rows = df.select(
        chunk.alias("chunk"),
        F.col(order_col).cast("long").alias("k"),
        F.col(text_col).cast("string").alias("t"),
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("k", ignore_index=True)
        texts = pdf["t"].tolist()
        payload = encode_string_chunk(texts, shared_table=shared_table)
        raw = sum(len(s.encode()) for s in texts)
        return pd.DataFrame(
            {
                "chunk": [int(pdf["chunk"].iloc[0])],
                "n_rows": [len(texts)],
                "bytes_enc": [len(payload)],
                "bytes_raw": [raw],
                "payload": [payload],
                "fsst_table": [shared_table],
            }
        )

    return rows.groupBy("chunk").applyInPandas(enc, _BLOCKS_SCHEMA)


def decode_text_column(blocks: DataFrame) -> DataFrame:
    """Inverse: ``(chunk, pos, text)`` — pos is the in-chunk rank in
    order-key order."""

    def dec(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            chunks = batch.column("chunk").to_numpy(zero_copy_only=False)
            payloads = batch.column("payload")
            tables = (
                batch.column("fsst_table")
                if "fsst_table" in batch.schema.names else None
            )
            out_c, out_p, out_t = [], [], []
            for i in range(batch.num_rows):
                st = None
                if tables is not None and tables[i].is_valid:
                    st = memoryview(tables[i].as_buffer())
                texts = decode_string_chunk(
                    memoryview(payloads[i].as_buffer()), shared_table=st
                )
                out_c.append(np.full(len(texts), chunks[i], np.int64))
                out_p.append(np.arange(len(texts), dtype=np.int64))
                out_t.extend(texts)
            if out_c:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_c), pa.int64()),
                        pa.array(np.concatenate(out_p), pa.int64()),
                        pa.array(out_t, pa.string()),
                    ],
                    schema=pa.schema(
                        [
                            ("chunk", pa.int64()),
                            ("pos", pa.int64()),
                            ("text", pa.string()),
                        ]
                    ),
                )

    cols = ["chunk", "payload"] + (
        ["fsst_table"] if "fsst_table" in blocks.columns else []
    )
    return blocks.select(*cols).mapInArrow(
        dec, "chunk long, pos long, text string"
    )


def text_roundtrip_rollup(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    chunk_rows: int = CHUNK_ROWS,
    mod: int = 1_000_000_007,
    shared_fsst: bool = False,
) -> DataFrame:
    """Gated end-to-end: encode -> decode -> per-chunk order-sensitive text
    checksums. ``(chunk, n, sum_len, cks, wcks)`` where cks hashes each
    decoded string portably (48-bit md5 prefix mod ``mod``) and wcks weights
    by in-chunk rank, so content AND order are gated."""
    from ..functions.text import h48

    shared = (
        train_shared_fsst_table(df, text_col, order_col)
        if shared_fsst else None
    )
    blocks = encode_text_column(df, text_col, order_col, chunk_rows,
                                shared_table=shared)
    dec = decode_text_column(blocks)
    h = h48(F.col("text")) % F.lit(mod)
    return (
        dec.groupBy("chunk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.length(F.col("text"))).cast("long").alias("sum_len"),
            F.pmod(F.sum(h), F.lit(mod)).cast("long").alias("cks"),
            F.pmod(F.sum(h * (F.col("pos") + 1)), F.lit(mod))
            .cast("long")
            .alias("wcks"),
        )
        .orderBy("chunk")
    )


def text_roundtrip_rollup_sql(
    chunk_rows: int = CHUNK_ROWS,
    mod: int = 1_000_000_007,
    doc_source: str = "documents",
) -> str:
    """Oracle straight from the source table: identical per-chunk rollup
    (DuckDB md5 prefix matches Spark's — both hash the utf-8 bytes)."""
    from ..functions.text import h48_sql

    h = f"({h48_sql('text')} % {int(mod)})"
    return f"""
WITH rows_ AS (
  SELECT doc_id // {int(chunk_rows)} AS chunk,
         ROW_NUMBER() OVER (PARTITION BY doc_id // {int(chunk_rows)}
                            ORDER BY doc_id) - 1 AS pos,
         text
  FROM {doc_source})
SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(length(text)) AS BIGINT) AS sum_len,
       CAST(SUM({h}) % {int(mod)} AS BIGINT) AS cks,
       CAST(SUM({h} * (pos + 1)) % {int(mod)} AS BIGINT) AS wcks
FROM rows_ GROUP BY chunk ORDER BY chunk
"""
