"""File-level size-weighted exchange: repartition a tokens table into
equal-weight, key-clustered buckets WITHOUT a JVM row shuffle.

``partitioning.size_weighted_repartition`` expresses the same operator as a
Catalyst plan, but its exchange moves every ``array<int32>`` token payload
through JVM shuffle rows — measured as the slowest phase of the whole bench
(the JVM boxes each array element). Here the exchange happens at *file*
granularity instead, the way a table-format compaction job would:

1. **plan**: stride-sample ``(cluster_key, weight)`` from the input parquet
   (column-pruned worker-side scans), cut at equal cumulative-weight
   quantiles — same boundary semantics as ``partitioning.weighted_cuts``,
   but deterministic w.r.t. cluster layout (per-file stride, not
   ``df.sample``), so two runs at different parallelism produce identical
   buckets;
2. **exchange**: each task pyarrow-reads a group of input files, assigns
   buckets by binary-searching the broadcast cuts, sorts rows by the cluster
   key, and writes one sorted parquet fragment per (task, bucket) under
   ``out/bucket=N/`` (hive layout, atomic tmp+rename, deterministic names so
   task retries overwrite instead of duplicating).

Bytes flow parquet -> Arrow -> parquet inside workers; the JVM sees only
file-task rows and tiny manifest rows. This is the distribution analog of
the reference's greedy reorder that groups similar values so deltas stay
small (/root/reference/mapbox_vector_tile/optimise.py:133-163) — realized as
a scale-safe two-pass exchange instead of an in-memory sort.

At 100 TB: the sample pass reads two small columns (statistics could also
come from table-format column metrics); each exchange task handles one
executor-sized file group; fragments per bucket = number of tasks, each a
full-sized parquet file — the same shape Iceberg/Hive write-partitioned
tables take.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


def doc_id_key(table: pa.Table | pa.RecordBatch) -> pa.Array:
    """Default cluster key: the doc_id column itself."""
    col = table.column("doc_id")
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def regime_doc_key(table: pa.Table | pa.RecordBatch) -> pa.Array:
    """``{regime}|{doc_id}`` — the bench cluster key (same formula as
    ``engine.verify.regime_expr``), computed Arrow-side, no per-row Python."""
    doc_id = table.column("doc_id")
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    num = pc.cast(pc.utf8_slice_codeunits(doc_id, 4, 12), pa.int64()).to_numpy()
    regime = np.where(num % 131 == 13, 8, num % 8)
    return pc.binary_join_element_wise(
        pc.cast(pa.array(regime, pa.int64()), pa.string()), doc_id, "|"
    )


def _utf8_fixed_bytes(keys: pa.Array, width: int = 0) -> np.ndarray:
    """UTF-8 key column -> fixed-width numpy ``S`` array, fully vectorized.

    NUL-padded byte-wise comparison orders exactly like UTF-8 string
    comparison (code-point order), so ``argsort``/``searchsorted`` over the
    result match the Catalyst string expressions — without materializing a
    Python ``str`` per row (``Array.to_pylist`` was the one per-row object
    churn left on the flagship path). ``width`` raises the item size so cut
    boundary strings longer than any key in this batch are never truncated.
    """
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if keys.null_count:
        raise ValueError("cluster keys must not be null")
    n = len(keys)
    if n == 0:
        return np.empty(0, dtype=f"S{max(width, 1)}")
    large = pa.types.is_large_string(keys.type) or pa.types.is_large_binary(
        keys.type
    )
    off_dt, off_sz = (np.int64, 8) if large else (np.int32, 4)
    offs = np.frombuffer(
        keys.buffers()[1], dtype=off_dt, count=n + 1, offset=off_sz * keys.offset
    ).astype(np.int64)
    data = np.frombuffer(keys.buffers()[2], dtype=np.uint8, count=int(offs[-1]))
    seg = data[offs[0] : offs[-1]]
    lens = np.diff(offs)
    w = max(int(lens.max()), width, 1)
    if int(lens.min()) == w and int(lens.max()) == w:
        return np.ascontiguousarray(seg).view(f"S{w}")
    out = np.zeros(n * w, dtype=np.uint8)
    rel = offs - offs[0]
    pos = np.arange(seg.size, dtype=np.int64) - np.repeat(rel[:-1], lens)
    out[np.repeat(np.arange(n, dtype=np.int64) * w, lens) + pos] = seg
    return out.view(f"S{w}")


def _cuts_fixed_bytes(cuts: list[str]) -> tuple[np.ndarray, int]:
    """Cut boundaries as a fixed-width ``S`` array + the minimum item width
    every key array must be padded to so comparisons never truncate."""
    if not cuts:
        return np.empty(0, dtype="S1"), 0
    enc = [c.encode("utf-8") for c in cuts]
    w = max(len(e) for e in enc)
    return np.array(enc, dtype=f"S{w}"), w


def _list_files(path: str) -> list[str]:
    from ..sources.parquet_direct import list_parquet_files

    return list_parquet_files(path)


def _group_files(files: list[str], n_tasks: int) -> list[list[str]]:
    from ..sources.parquet_direct import group_files_by_size

    return group_files_by_size(files, n_tasks)


def plan_weighted_cuts(
    spark: SparkSession,
    files: list[str],
    num_buckets: int,
    key_fn: Callable[[pa.Table], pa.Array] = doc_id_key,
    key_cols: tuple[str, ...] = ("doc_id",),
    weight_col: str = "n_tok",
    sample_target: int = 100_000,
) -> list[str]:
    """Boundary keys at equal cumulative-weight quantiles, from a
    deterministic per-file stride sample of ``(key, weight)``.

    Unlike ``df.sample`` the stride depends only on file contents and the
    file count, so the plan is reproducible across cluster configurations —
    the property checkpoint resume needs (see engine/checkpoint.py). The
    stride is derived per file from its own row count (worker-side), so the
    driver never loops over file footers.
    """
    n_files = len(files)
    if n_files == 0:
        return []
    per_file_target = max(1, sample_target // n_files)
    groups = _group_files(files, spark.sparkContext.defaultParallelism)
    tasks = spark.createDataFrame(
        [(i, g) for i, g in enumerate(groups)],
        "task_id int, paths array<string>",
    ).repartition(len(groups), "task_id")
    cols = list(dict.fromkeys([*key_cols, weight_col]))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tb in batches:
            for paths in tb.column("paths").to_pylist():
                keys, weights = [], []
                for path in paths:
                    t = pq.read_table(path, columns=cols)
                    stride = max(1, t.num_rows // per_file_target)
                    idx = np.arange(0, t.num_rows, stride, dtype=np.int64)
                    if idx.size == 0:
                        continue
                    s = t.take(pa.array(idx))
                    keys.append(key_fn(s))
                    w = s.column(weight_col)
                    if isinstance(w, pa.ChunkedArray):
                        w = w.combine_chunks()
                    # each sampled row stands for `stride` rows: scale its
                    # weight so differently-sized files stay unbiased
                    weights.append(
                        pc.multiply(
                            pc.cast(w, pa.int64()),
                            pa.scalar(int(stride), pa.int64()),
                        )
                    )
                if keys:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in keys]),
                            pa.concat_arrays(weights),
                        ],
                        names=["key", "weight"],
                    )

    sample = tasks.mapInArrow(fn, "key string, weight long").collect()
    if not sample:
        return []
    sample.sort(key=lambda r: r.key)
    total = sum(max(int(r.weight), 1) for r in sample)
    target = total / num_buckets
    cuts, acc = [], 0.0
    for r in sample:
        acc += max(int(r.weight), 1)
        if acc >= target * (len(cuts) + 1) and len(cuts) < num_buckets - 1:
            cuts.append(r.key)
    return cuts


def size_weighted_exchange(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    num_buckets: int,
    key_fn: Callable[[pa.Table], pa.Array] = doc_id_key,
    key_cols: tuple[str, ...] = ("doc_id",),
    weight_col: str = "n_tok",
    n_tasks: int | None = None,
    cuts: list[str] | None = None,
) -> dict:
    """Exchange ``in_path`` tokens parquet into ``out_path/bucket=N/`` sorted
    fragments. Returns a summary dict; writes ``_SUCCESS`` on completion.

    Equivalent result contract to ``size_weighted_repartition`` +
    ``write.partitionBy("bucket")``: every row lands in the bucket given by
    its cluster key vs the cuts, rows within each fragment sorted by key.

    Any prior fragments under ``out_path`` are cleared first: fragment
    names encode the task file-grouping (``part-{task_id}``), and a rerun
    at different parallelism — or after input files changed size — groups
    differently, so an interrupted attempt's leftovers would otherwise
    survive as silent duplicate rows (the resume-with-different-cluster
    hazard). Bucket *membership* depends only on ``cuts``, so a wiped
    rerun under any grouping produces the same logical table.
    """
    import shutil

    files = _list_files(in_path)
    if not files:
        raise ValueError(f"no parquet files under {in_path}")
    if os.path.isdir(out_path):
        for d in os.listdir(out_path):
            if d.startswith("bucket="):
                shutil.rmtree(os.path.join(out_path, d), ignore_errors=True)
        success = os.path.join(out_path, "_SUCCESS")
        if os.path.exists(success):
            os.remove(success)
    if cuts is None:
        cuts = plan_weighted_cuts(
            spark, files, num_buckets, key_fn, key_cols, weight_col
        )
    cuts_b, cuts_w = _cuts_fixed_bytes(cuts)
    if n_tasks is None:
        n_tasks = spark.sparkContext.defaultParallelism
    groups = _group_files(files, n_tasks)
    tasks = spark.createDataFrame(
        [(i, g) for i, g in enumerate(groups)],
        "task_id int, paths array<string>",
    ).repartition(len(groups), "task_id")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tb in batches:
            task_ids = tb.column("task_id").to_pylist()
            for task_id, paths in zip(task_ids, tb.column("paths").to_pylist()):
                t = pa.concat_tables([pq.read_table(p) for p in paths])
                keys_b = _utf8_fixed_bytes(key_fn(t), cuts_w)
                order = np.argsort(keys_b, kind="stable")
                keys_sorted = keys_b[order]
                t = t.take(pa.array(order))
                # bucket = count of cuts < key (matches partitioning._bucket_expr);
                # keys are sorted, so buckets are too — slice at transitions
                if cuts_b.size:
                    buckets = np.searchsorted(cuts_b, keys_sorted, side="left")
                else:
                    buckets = np.zeros(keys_sorted.size, dtype=np.int64)
                seg_starts = np.concatenate(
                    ([0], np.flatnonzero(np.diff(buckets) != 0) + 1, [len(buckets)])
                )
                out_rows = {"bucket": [], "n_rows": [], "n_tok": [], "path": []}
                weights = t.column(weight_col)
                if isinstance(weights, pa.ChunkedArray):
                    weights = weights.combine_chunks()
                w_np = weights.to_numpy(zero_copy_only=False).astype(np.int64)
                w_cum = np.concatenate(([0], np.cumsum(w_np)))
                for a, b in zip(seg_starts[:-1], seg_starts[1:]):
                    if a == b:
                        continue
                    bucket = int(buckets[a])
                    frag = t.slice(a, b - a)
                    d = os.path.join(out_path, f"bucket={bucket}")
                    os.makedirs(d, exist_ok=True)
                    final = os.path.join(d, f"part-{task_id:05d}.parquet")
                    tmp = os.path.join(d, f".part-{task_id:05d}.tmp")
                    pq.write_table(frag, tmp)
                    os.replace(tmp, final)  # atomic: retries overwrite
                    out_rows["bucket"].append(bucket)
                    out_rows["n_rows"].append(b - a)
                    out_rows["n_tok"].append(int(w_cum[b] - w_cum[a]))
                    out_rows["path"].append(final)
                yield pa.RecordBatch.from_pydict(
                    {
                        "task_id": [task_id] * len(out_rows["bucket"]),
                        **out_rows,
                    },
                    schema=pa.schema(
                        [
                            ("task_id", pa.int32()),
                            ("bucket", pa.int32()),
                            ("n_rows", pa.int64()),
                            ("n_tok", pa.int64()),
                            ("path", pa.string()),
                        ]
                    ),
                )

    manifest = tasks.mapInArrow(
        fn, "task_id int, bucket int, n_rows long, n_tok long, path string"
    ).collect()
    os.makedirs(out_path, exist_ok=True)
    with open(os.path.join(out_path, "_SUCCESS"), "w"):
        pass
    per_bucket: dict[int, int] = {}
    n_rows = 0
    for r in manifest:
        per_bucket[r.bucket] = per_bucket.get(r.bucket, 0) + int(r.n_tok)
        n_rows += int(r.n_rows)
    return {
        "n_rows": n_rows,
        "n_fragments": len(manifest),
        "n_buckets": len(per_bucket),
        "bucket_weights": per_bucket,
        "cuts": cuts,
    }


def bucketed_tokens_dataframe(spark: SparkSession, out_path: str) -> DataFrame:
    """Read an exchanged table back as a DataFrame (bucket from hive path)."""
    return spark.read.option("basePath", out_path).parquet(out_path)


def exchange_encode_fused(
    spark: SparkSession,
    in_path: str,
    num_buckets: int,
    options=None,
    key_fn: Callable[[pa.Table], pa.Array] = doc_id_key,
    key_cols: tuple[str, ...] = ("doc_id",),
    weight_col: str = "n_tok",
    n_tasks: int | None = None,
    cuts: list[str] | None = None,
    min_chunk_values: int | None = None,
) -> DataFrame:
    """Fused exchange + encode: each task reads its file group, sorts by the
    cluster key, cuts bucket segments, and encodes blocks DIRECTLY from the
    sorted in-memory rows — the intermediate bucketed table is never
    written or re-read, halving end-to-end memory/IO traffic vs
    exchange-then-encode (the 8->32 scaling lever named in BENCH/BASELINE).

    ``min_chunk_values`` (default ``max_chunk_values // 4``) merges
    sub-budget bucket segments: a bucket-transition chunk cut is kept only
    once the running chunk holds at least this many values. Without it every
    (task x bucket) crossing forces its own chunk — n_chunks grows as
    O(tasks x buckets) and decode pays the per-block fixed cost that many
    times (the round-2 q_decode regression). Rows stay fully sorted by the
    cluster key, so a merged chunk is still delta-local; the PAGED codec
    re-picks per 64k-value page inside heterogeneous chunks. A merged
    chunk's ``bucket`` is its first (lowest-key) row's bucket — pass
    ``min_chunk_values=0`` when strict chunk/bucket homogeneity matters
    (e.g. ``write.partitionBy("bucket")`` products).

    Trade recorded, not hidden: chunks cannot span tasks, so n_chunks >=
    n_tasks, and there is no bucketed table for other readers — use the
    two-phase path when the clustered tokens table itself is a product.

    Returns the blocks DataFrame (standard blocks schema, ``bucket`` set).
    """
    from .encode import (
        _BLOCKS_ARROW_SCHEMA,
        BLOCKS_SPARK_SCHEMA,
        EncodeOptions,
        _encode_chunk,
        chunk_row_starts,
    )

    opts = options or EncodeOptions()
    if min_chunk_values is None:
        min_chunk_values = opts.max_chunk_values // 4
    files = _list_files(in_path)
    if not files:
        raise ValueError(f"no parquet files under {in_path}")
    if cuts is None:
        cuts = plan_weighted_cuts(
            spark, files, num_buckets, key_fn, key_cols, weight_col
        )
    cuts_b, cuts_w = _cuts_fixed_bytes(cuts)
    if n_tasks is None:
        n_tasks = spark.sparkContext.defaultParallelism
    groups = _group_files(files, n_tasks)
    tasks = spark.createDataFrame(
        [(i, g) for i, g in enumerate(groups)],
        "task_id int, paths array<string>",
    ).repartition(len(groups), "task_id")
    read_cols = list(dict.fromkeys([*key_cols, "doc_id", "tokens"]))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tb in batches:
            task_ids = tb.column("task_id").to_pylist()
            for task_id, paths in zip(task_ids, tb.column("paths").to_pylist()):
                # no combine_chunks here: Arrow `take` gathers from the
                # chunked table directly, so merging chunks first would be
                # a redundant full copy of the task's token data (the
                # biggest single allocation in the fused path)
                t = pa.concat_tables(
                    [pq.read_table(p, columns=read_cols) for p in paths]
                )
                keys_b = _utf8_fixed_bytes(key_fn(t), cuts_w)
                order = np.argsort(keys_b, kind="stable")
                t = t.take(pa.array(order)).combine_chunks()
                if cuts_b.size:
                    buckets = np.searchsorted(cuts_b, keys_b[order], side="left")
                else:
                    buckets = np.zeros(order.size, dtype=np.int64)

                tokens_col = t.column("tokens")
                tokens_arr = (
                    tokens_col.chunk(0)
                    if tokens_col.num_chunks
                    else pa.array([], pa.list_(pa.int32()))
                )
                doc_ids = t.column("doc_id")
                doc_ids = (
                    doc_ids.chunk(0) if doc_ids.num_chunks
                    else pa.array([], pa.string())
                )
                lengths_all = tokens_arr.value_lengths().to_numpy().astype(np.int64)
                values_all = tokens_arr.flatten().to_numpy(
                    zero_copy_only=False
                ).astype(np.int32, copy=False)
                val_off = np.concatenate(([0], np.cumsum(lengths_all)))

                forced_all = np.flatnonzero(np.diff(buckets) != 0) + 1
                forced = forced_all
                if forced.size and min_chunk_values > 0:
                    # keep a bucket-transition cut only once the running
                    # chunk has accrued min_chunk_values tokens: one loop
                    # iteration per bucket transition, not per row
                    kept, last = [], 0
                    for f in forced_all:
                        if val_off[f] - val_off[last] >= min_chunk_values:
                            kept.append(int(f))
                            last = int(f)
                    forced = np.asarray(kept, dtype=np.int64)
                row_starts = chunk_row_starts(
                    lengths_all, opts.max_chunk_values, forced
                )
                rows, bounds = [], []
                seq = 0
                for a, b in zip(row_starts[:-1], row_starts[1:]):
                    if a == b:
                        continue
                    # bucket transitions this chunk absorbed -> PAGED
                    # segment boundaries (value offsets within the chunk)
                    inner = forced_all[(forced_all > a) & (forced_all < b)]
                    seg = (
                        val_off[inner] - val_off[a] if inner.size else None
                    )
                    rows.append(
                        _encode_chunk(
                            doc_ids.slice(a, b - a),
                            lengths_all[a:b],
                            values_all[val_off[a] : val_off[b]],
                            opts,
                            task_id,
                            seq,
                            int(buckets[a]),
                            seg_values=seg,
                        )
                    )
                    bounds.append(a)
                    seq += 1
                if not rows:
                    continue
                bounds.append(row_starts[-1])
                doc_id_lists = pa.ListArray.from_arrays(
                    pa.array(bounds, pa.int32()), doc_ids
                )
                cols = [
                    doc_id_lists
                    if f.name == "doc_ids"
                    else pa.array([r[f.name] for r in rows], f.type)
                    for f in _BLOCKS_ARROW_SCHEMA
                ]
                yield pa.RecordBatch.from_arrays(cols, schema=_BLOCKS_ARROW_SCHEMA)

    return tasks.mapInArrow(fn, BLOCKS_SPARK_SCHEMA)
