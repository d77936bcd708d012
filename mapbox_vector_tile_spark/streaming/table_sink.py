"""Structured Streaming ingest into the whole-table columnar store.

Rows of an arbitrary relational table arrive as a stream; each
micro-batch encodes EVERY column through its type's codec
(:mod:`..engine.table_encode`) and lands one idempotent
``batch_id=``-partitioned blocks write — the table-store twin of the
token encode stream (``encode_stream.py``).

Chunk ids stay a pure function of the ORDER KEY (``chunk = key >>
log2(rows)``), so a chunk whose key range straddles a micro-batch
boundary appears as two partial block rows; decode reconstructs rows
(not chunk layout) bit-exactly regardless of how the stream was split —
the parity gate therefore compares CONTENT keyed by the order column,
the same contract Iceberg-style ingest gives compaction. At scale each
micro-batch is one bounded encode pass (worker memory O(chunk_rows *
columns)); no state is kept between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..engine.table_encode import encode_table


def start_table_encode_stream(
    rows_stream: DataFrame,
    order_col: str,
    out_dir: str,
    stream_checkpoint_dir: str,
    chunk_rows: int = 4096,
    trigger_once: bool = True,
):
    """Start a streaming whole-table encode. Returns the StreamingQuery.
    A replayed micro-batch overwrites its own ``batch_id=`` partition
    (at-least-once upstream -> exactly-once blocks)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        blocks = encode_table(batch_df, order_col, chunk_rows).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        (
            blocks.write.partitionBy("batch_id")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    writer = (
        rows_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", stream_checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
