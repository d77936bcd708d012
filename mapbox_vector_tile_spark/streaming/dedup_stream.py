"""Streaming event deduplication with a bounded-state watermark.

At-least-once ingestion (Kafka replays, retried producers) delivers the
same event more than once; the exactly-once fix is stream-side
deduplication. Unbounded ``dropDuplicates`` would keep every key ever
seen in the state store; the production form is
``withWatermark(ts, horizon).dropDuplicatesWithinWatermark(keys)`` —
Spark keeps a key's fingerprint only until the watermark passes it, so
state is O(keys inside the horizon) regardless of stream length. The
trade is explicit: a duplicate arriving LATER than the horizon after its
original is no longer deduplicated (it is indistinguishable from a new
event once state is evicted); size the horizon to the producer's maximum
replay lag.

The sink appends each micro-batch to parquet under ``batch_id=``
partitions (idempotent dynamic overwrite — the same discipline as
``decode_stream``), so a replayed batch rewrites its own partition
instead of double-appending.

The reference deduplicates repeated attribute values within one tile at
encode time (/root/reference/mapbox_vector_tile/encoder.py:241-266);
this is the same idea along event time with bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_events_stream(
    events_stream: DataFrame, horizon: str = "10 minutes"
) -> DataFrame:
    """Deduplicated stream: one row per ``event_id`` within the watermark
    horizon. Keys carry only (event_id); the watermark column must be the
    event-time ``ts``."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", horizon)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def start_dedup_stream(
    events_stream: DataFrame,
    out_path: str,
    stream_checkpoint_dir: str,
    horizon: str = "10 minutes",
    trigger_once: bool = True,
):
    """Write the deduplicated stream to parquet, one idempotent
    ``batch_id=`` partition per micro-batch. Returns the StreamingQuery."""
    deduped = dedup_events_stream(events_stream, horizon)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(out_path)
            )
        finally:
            if prev is not None:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )

    writer = (
        deduped.writeStream.foreachBatch(process)
        .option("checkpointLocation", stream_checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
