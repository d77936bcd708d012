"""Columnar float32 embedding compression over Spark.

The embedding analog of the token encode/decode pipeline
(``engine/encode.py`` / ``engine/decode.py``): ``array<float>`` vectors
are flattened per Arrow batch inside the worker, the value stream is
compressed with the lossless float codecs (``codec/floats.py`` — ALP
decimal scaling / byte-stream split, both reusing the int codec suite),
and one blocks row per chunk carries payload + per-chunk codec manifest +
size accounting, mirroring the token blocks contract.

Scale shape (100 TB story): encode is ``mapInArrow`` over whatever
partitioning the source already has — no shuffle, no driver collection;
decode is the stateless inverse map. Chunk = one Arrow batch (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so worker memory is
O(batch), and the blocks table parallelizes decode by chunk row exactly
like the token path. The per-row invariant is IEEE-754 bit identity,
verified two ways: pytest asserts ``uint32``-view equality end-to-end,
and the oracle query compares order-sensitive fixed-point checksums of
the DECODED vectors against DuckDB computing the same from the source
table (``floor(x * 2^20)`` is exact for float32 inputs in both engines —
the multiply by a power of two is lossless in float64).

Reference parity: the geometry round-trip tests
(/root/reference/tests/test_decoder.py) gate bit-identical decode; here
the same gate covers the float value stream.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import floats as FC
from ..codec import select as S
from ..codec import blocks as B

EMB_BLOCKS_SCHEMA = (
    "chunk_id long, part_id int, n_rows int, n_values long, "
    "vec_ids array<long>, lengths_blob binary, payload binary, "
    "float_codec string, bytes_raw long, bytes_enc long, checksum long"
)

_EMB_ARROW_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.int64()),
        ("part_id", pa.int32()),
        ("n_rows", pa.int32()),
        ("n_values", pa.int64()),
        ("vec_ids", pa.list_(pa.int64())),
        ("lengths_blob", pa.binary()),
        ("payload", pa.binary()),
        ("float_codec", pa.string()),
        ("bytes_raw", pa.int64()),
        ("bytes_enc", pa.int64()),
        ("checksum", pa.int64()),
    ]
)


def encode_embeddings_dataframe(
    df: DataFrame, id_col: str = "vec_id", col: str = "embedding"
) -> DataFrame:
    """embeddings DataFrame -> float blocks DataFrame (one row per chunk)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx else 0
        seq = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            vec_ids = batch.column(id_col)
            emb = batch.column(col)
            if emb.null_count:
                raise ValueError(f"{col} must not contain null rows")
            lengths = emb.value_lengths().to_numpy().astype(np.int64)
            values = (
                emb.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float32, copy=False)
            )
            payload = FC.encode_float_block(values)
            lengths_blob, _ = S.encode_auto(lengths.astype(np.int32))
            ids = pa.ListArray.from_arrays(
                pa.array([0, len(vec_ids)], pa.int32()),
                vec_ids.cast(pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([(part_id << 40) | seq], pa.int64()),
                    pa.array([part_id], pa.int32()),
                    pa.array([batch.num_rows], pa.int32()),
                    pa.array([int(values.size)], pa.int64()),
                    ids,
                    pa.array([lengths_blob], pa.binary()),
                    pa.array([payload], pa.binary()),
                    pa.array([FC.float_block_codec(payload)], pa.string()),
                    pa.array([4 * int(values.size)], pa.int64()),
                    pa.array([len(payload)], pa.int64()),
                    pa.array([zlib.crc32(payload)], pa.int64()),
                ],
                schema=_EMB_ARROW_SCHEMA,
            )
            seq += 1

    return df.mapInArrow(fn, EMB_BLOCKS_SCHEMA)


def decode_embeddings_dataframe(blocks: DataFrame) -> DataFrame:
    """float blocks DataFrame -> (vec_id, embedding) DataFrame, bit-exact."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for i in range(batch.num_rows):
                payload = batch.column("payload")[i].as_py()
                if zlib.crc32(payload) != batch.column("checksum")[i].as_py():
                    raise ValueError("float block checksum mismatch")
                values = FC.decode_float_block(payload)
                lengths = B.decode_block(
                    batch.column("lengths_blob")[i].as_py()
                ).astype(np.int64)
                if int(lengths.sum()) != values.size:
                    raise ValueError("float block length sum mismatch")
                offs = np.zeros(lengths.size + 1, dtype=np.int64)
                np.cumsum(lengths, out=offs[1:])
                emb = pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()),
                    pa.array(values, pa.float32()),
                )
                vec_ids = batch.column("vec_ids")[i].values
                yield pa.RecordBatch.from_arrays(
                    [vec_ids, emb],
                    schema=pa.schema(
                        [
                            ("vec_id", pa.int64()),
                            ("embedding", pa.list_(pa.float32())),
                        ]
                    ),
                )

    return blocks.mapInArrow(fn, "vec_id long, embedding array<float>")


_SCALE = 1 << 20  # floor(x * 2^20): exact for float32 inputs in float64


def embedding_codec_roundtrip(emb: DataFrame) -> DataFrame:
    """Oracle-gated roundtrip: encode -> decode -> order-sensitive
    fixed-point checksums per vector. A hash match against DuckDB (which
    computes the same sums from the SOURCE table) proves the decoded
    stream carries the source values position-for-position."""
    decoded = decode_embeddings_dataframe(encode_embeddings_dataframe(emb))
    xi = F.expr(
        f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {_SCALE})"
        " AS BIGINT))"
    )
    wsum = (
        "aggregate(zip_with(xi, sequence(1, size(xi)), (v, i) -> v * i), "
        "CAST(0 AS BIGINT), (a, v) -> a + v)"
    )
    return (
        decoded.select(F.col("vec_id").cast("long").alias("vec_id"), xi.alias("xi"))
        .select(
            "vec_id",
            F.size("xi").alias("n_dims"),
            F.expr(
                "aggregate(xi, CAST(0 AS BIGINT), (a, v) -> a + v)"
            ).alias("sum_fixed"),
            F.expr(wsum).alias("wsum_fixed"),
        )
        .orderBy("vec_id")
    )


def embedding_codec_roundtrip_sql() -> str:
    return f"""
WITH x AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
         u.i AS i,
         CAST(floor(CAST(e.embedding[u.i+1] AS DOUBLE) * {_SCALE}) AS BIGINT) AS xi
  FROM embeddings e, unnest(range(len(e.embedding))) u(i))
SELECT vec_id,
       CAST(COUNT(*) AS INT) AS n_dims,
       CAST(SUM(xi) AS BIGINT) AS sum_fixed,
       CAST(SUM(xi * (i + 1)) AS BIGINT) AS wsum_fixed
FROM x GROUP BY vec_id ORDER BY vec_id
"""
