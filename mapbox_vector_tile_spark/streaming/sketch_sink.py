"""Streaming sketch maintenance: one published sketch version per micro-batch.

Sketches are the rare analytics state that a stream can maintain EXACTLY:
count-min states merge by addition, KMV bottom-k states merge by
union-then-trim, HLL registers merge by register-wise max, and the
order-sample quantile sketch merges by union-then-trim under its
(hash, value) total order, so "fold
this micro-batch in" is a closed-form operation on tiny tables — never a
re-read of the corpus. Each micro-batch
computes its own partial over just the new documents
(:func:`..functions.sketch.cm_bucket_counts` / the row-local bottom-k),
merges it with the current version, and publishes the result as a new
immutable version behind an atomic pointer.

Exactly-once on top of foreachBatch's at-least-once replay — the same
ledger discipline as :mod:`.index_sink` / :mod:`.snapshot_sink`:
uuid-suffixed version directories (a crashed attempt is unreferenced), a
``_versions.jsonl`` batch-id ledger (a replayed batch publishes nothing),
and an ``os.replace``-swapped ``_current`` pointer (readers only ever see
fully written versions).

State size is O(w*d + k) regardless of stream length — the whole point:
at 100 TB/day ingest the published "how many distinct n-grams / how hot is
this n-gram" answer stays a two-small-parquet read.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.sketch import (
    CM_D,
    CM_W,
    _gram_hash_expr,
    cm_bucket_counts,
)


def _log_path(root: str) -> str:
    return os.path.join(root, "_versions.jsonl")


def version_log(root: str) -> list[dict]:
    path = _log_path(root)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def published_batch_ids(root: str) -> set[int]:
    return {v["batch_id"] for v in version_log(root)}


def current_sketch_dir(root: str) -> str | None:
    cur = os.path.join(root, "_current")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return os.path.join(root, f.read().strip())


def read_current_cm(spark: SparkSession, root: str) -> DataFrame:
    """(r, bucket, cnt) of the latest published version."""
    d = current_sketch_dir(root)
    if d is None:
        raise FileNotFoundError(f"no published sketch version in {root}")
    return spark.read.parquet(os.path.join(d, "cm"))

def read_current_kmv(spark: SparkSession, root: str) -> DataFrame:
    """(h) bottom-k gram hashes of the latest published version."""
    d = current_sketch_dir(root)
    if d is None:
        raise FileNotFoundError(f"no published sketch version in {root}")
    return spark.read.parquet(os.path.join(d, "kmv"))


def read_current_qsample(spark: SparkSession, root: str) -> DataFrame:
    d = current_sketch_dir(root)
    if d is None:
        raise FileNotFoundError(f"no published sketch under {root}")
    return spark.read.parquet(os.path.join(d, "qsample"))


def read_current_hll(spark: SparkSession, root: str) -> DataFrame:
    """(source, bucket, rho_max) HLL registers of the latest version."""
    d = current_sketch_dir(root)
    if d is None:
        raise FileNotFoundError(f"no published sketch version in {root}")
    return spark.read.parquet(os.path.join(d, "hll"))


def _qsample_partial(batch_df: DataFrame, k: int) -> DataFrame:
    """Bottom-k (hash, value) pairs of one batch under the order-sample
    sketch's total order (doc identity hashed, value = n_tok): the
    streaming partial of :func:`..functions.sketch
    .bottomk_sample_quantiles`."""
    from ..functions.text import h48

    return (
        batch_df.select(
            h48(F.col("doc_id").cast("string")).alias("hk"),
            F.col("n_tok").cast("long").alias("v"),
        )
        .orderBy("hk", "v")
        .limit(k)
    )


def _kmv_partial(batch_df: DataFrame, n: int, k: int) -> DataFrame:
    """Row-local bottom-k hashes of a batch (same shape the KMV query
    feeds its partition merge)."""
    return (
        batch_df.filter(F.col("n_tok") >= n)
        .select(
            F.slice(
                F.array_sort(F.array_distinct(F.expr(_gram_hash_expr(n)))),
                1,
                k,
            ).alias("hs")
        )
        .select(F.explode("hs").alias("h"))
    )


def publish_sketch_batch(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    batch_id: int,
    n: int = 2,
    w: int = CM_W,
    d: int = CM_D,
    k: int = 1024,
) -> str | None:
    """Fold one micro-batch of NEW documents into both sketches and publish
    a new version; ``None`` when the batch id was already published."""
    if int(batch_id) in published_batch_ids(root):
        return None
    os.makedirs(root, exist_ok=True)
    from ..functions.sketch import hll_register_table

    cm_new = cm_bucket_counts(batch_df, n, w, d)
    kmv_new = _kmv_partial(batch_df, n, k)
    hll_new = hll_register_table(batch_df)
    qs_new = _qsample_partial(batch_df, k)
    cur = current_sketch_dir(root)
    if cur is not None:
        cm_cur = spark.read.parquet(os.path.join(cur, "cm"))
        # CM merge = addition per (r, bucket); both sides are <= w*d rows
        cm_new = (
            cm_new.unionByName(cm_cur)
            .groupBy("r", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        kmv_cur = spark.read.parquet(os.path.join(cur, "kmv"))
        kmv_new = kmv_new.unionByName(kmv_cur)
        # HLL merge = register-wise max; both sides <= sources * 256 rows
        hll_cur = spark.read.parquet(os.path.join(cur, "hll"))
        hll_new = (
            hll_new.unionByName(hll_cur)
            .groupBy("source", "bucket")
            .agg(F.max("rho_max").alias("rho_max"))
        )
        qs_cur = spark.read.parquet(os.path.join(cur, "qsample"))
        qs_new = qs_new.unionByName(qs_cur)
    # KMV merge = distinct union trimmed back to k (both sides <= k + batch)
    kmv_new = kmv_new.distinct().orderBy("h").limit(k)
    # order-sample merge = set union trimmed under the (hk, v) total order
    # (dropDuplicates makes a replayed identical doc a no-op, KMV-style)
    qs_new = qs_new.dropDuplicates(["hk", "v"]).orderBy("hk", "v").limit(k)
    vname = f"v{len(version_log(root)) + 1}-{uuid.uuid4().hex[:8]}"
    out = os.path.join(root, vname)
    cm_new.coalesce(1).write.parquet(os.path.join(out, "cm"))
    kmv_new.coalesce(1).write.parquet(os.path.join(out, "kmv"))
    hll_new.coalesce(1).write.parquet(os.path.join(out, "hll"))
    qs_new.coalesce(1).write.parquet(os.path.join(out, "qsample"))
    with open(_log_path(root), "a") as f:
        f.write(json.dumps({"batch_id": int(batch_id), "dir": vname}) + "\n")
    tmp = os.path.join(root, "_current.tmp")
    with open(tmp, "w") as f:
        f.write(vname)
    os.replace(tmp, os.path.join(root, "_current"))
    return vname


def start_sketch_maintenance_stream(
    tokens_stream: DataFrame,
    root: str,
    stream_checkpoint_dir: str,
    n: int = 2,
    w: int = CM_W,
    d: int = CM_D,
    k: int = 1024,
    trigger_once: bool = True,
):
    """Maintain both sketches over a streaming tokens DataFrame, one
    published version per micro-batch. Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        publish_sketch_batch(
            batch_df.sparkSession, root, batch_df, batch_id, n, w, d, k
        )

    writer = (
        tokens_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", stream_checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
