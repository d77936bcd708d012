"""Spark-side corpus materialization: distributed, Arrow-batched, no per-row
Python. The numpy generator (:mod:`..corpus`) runs inside ``mapInArrow`` over
``spark.range`` partitions — each executor synthesizes its own slice."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from .. import corpus as C

TOKENS_SPARK_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

_TOKENS_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def doc_id_str(ids: np.ndarray) -> list[str]:
    return [f"doc-{int(i):08d}" for i in ids]


DOC_ID_STR_SQL = "printf('doc-%08d', doc_id)"  # DuckDB-side equivalent


def tokens_batch(ids: np.ndarray) -> pa.RecordBatch:
    """One Arrow batch of the corpus for integer doc ids."""
    ids = np.asarray(ids, dtype=np.int64)
    lengths, values = C.tokens_flat(ids)
    offsets = np.zeros(ids.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(values, pa.int32())
    ).cast(pa.list_(pa.int32()))
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_id_str(ids), pa.string()),
            tokens,
            pa.array(lengths.astype(np.int32), pa.int32()),
            pa.array(C.source_of(ids).tolist(), pa.string()),
        ],
        schema=_TOKENS_ARROW_SCHEMA,
    )


def corpus_dataframe(spark, n_docs: int, num_partitions: int | None = None):
    """Distributed tokens table ``(doc_id, tokens, n_tok, source)`` for doc
    ids ``0..n_docs-1`` (the BASELINE.json ``input_hint`` shape)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_numpy()
            if ids.size:
                yield tokens_batch(ids)

    base = spark.range(0, n_docs, numPartitions=num_partitions)
    return base.mapInArrow(gen, TOKENS_SPARK_SCHEMA)


def corpus_dataframe_from_ids(df_ids, id_col: str = "doc_id"):
    """Same, but for an explicit integer doc-id DataFrame (e.g. the driver's
    ``documents`` table ids, so the DuckDB oracle can reproduce the set)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col).to_numpy()
            if ids.size:
                yield tokens_batch(ids)

    return df_ids.select(id_col).mapInArrow(gen, TOKENS_SPARK_SCHEMA)
