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
    # NUL-padding makes 'a' and 'a\x00' compare equal — reject embedded
    # NULs up front (vectorized min scan) rather than silently mis-bucket
    if seg.size and int(seg.min()) == 0:
        raise ValueError(
            "cluster keys must not contain NUL bytes (fixed-width padding "
            "would make keys differing only by trailing \\x00 compare equal)"
        )
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
    from ..sources.parquet_direct import task_rows_dataframe

    tasks = task_rows_dataframe(
        spark,
        [(i, g) for i, g in enumerate(groups)],
        "task_id int, paths array<string>",
    )
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

    # Arrow collect + arrow-side sort: the pickled-Row path (collect() then
    # Row-attribute sort) cost ~2x the sample job itself at 100k samples
    # (measured r6: collect 1.05 s + row sort/walk 0.44 s vs toArrow 0.50 s
    # + 0.09 s). Cut selection is bit-identical: UTF-8 byte order equals
    # code-point order, and the walk below is unchanged.
    sample = tasks.mapInArrow(fn, "key string, weight long").toArrow()
    if sample.num_rows == 0:
        return []
    sample = sample.take(
        pc.sort_indices(sample, sort_keys=[("key", "ascending")])
    )
    keys = sample.column("key").to_pylist()
    weights = np.maximum(
        sample.column("weight").to_numpy(zero_copy_only=False).astype(np.int64),
        1,
    )
    total = int(weights.sum())
    target = total / num_buckets
    cuts, acc = [], 0.0
    for key, w in zip(keys, weights.tolist()):
        acc += w
        if acc >= target * (len(cuts) + 1) and len(cuts) < num_buckets - 1:
            cuts.append(key)
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
        for marker in ("_SUCCESS", "_manifest.json"):
            p = os.path.join(out_path, marker)
            if os.path.exists(p):
                os.remove(p)
    if cuts is None:
        cuts = plan_weighted_cuts(
            spark, files, num_buckets, key_fn, key_cols, weight_col
        )
    cuts_b, cuts_w = _cuts_fixed_bytes(cuts)
    if n_tasks is None:
        n_tasks = spark.sparkContext.defaultParallelism
    groups = _group_files(files, n_tasks)
    from ..sources.parquet_direct import task_rows_dataframe

    tasks = task_rows_dataframe(
        spark,
        [(i, g) for i, g in enumerate(groups)],
        "task_id int, paths array<string>",
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..sources.parquet_direct import write_parquet_atomic

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
                    # atomic + retry/speculation-safe (unique tmp per attempt)
                    write_parquet_atomic(frag, final)
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
    from ..sources.parquet_direct import write_file_manifest

    write_file_manifest(
        out_path,
        {os.path.relpath(r.path, out_path): int(r.n_rows) for r in manifest},
    )
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


class _BucketAcc:
    """One bucket's pending (file x bucket) runs, kept as parallel part
    lists so every part junction is a known distribution boundary (a PAGED
    segment bound if the chunk ends up mixed)."""

    __slots__ = ("docs", "lens", "vals", "serials", "n_values")

    def __init__(self):
        self.docs: list[pa.Array] = []
        self.lens: list[np.ndarray] = []
        self.vals: list[np.ndarray] = []
        self.serials: list[int] = []  # add_file serial each part came from
        self.n_values = 0


class _FusedChunkEmitter:
    """Streams per-file sorted row groups into encoded chunks through
    PER-BUCKET accumulators — the memory AND compression contract of the
    fused path.

    Each :meth:`add_file` call hands over ONE file's rows, already sorted
    by the cluster key, with their bucket assignments. Runs are split at
    bucket transitions and appended to that bucket's accumulator; a bucket
    emits a chunk only once it has accrued ``opts.max_chunk_values`` —
    so a bucket's runs from CONSECUTIVE FILES merge into one bucket-pure
    chunk, and whole-chunk codec state (one dictionary, one FOR frame) is
    amortized across the per-file segments instead of duplicated per
    segment. Round 4's first per-file form cut chunks inside each file,
    which regressed compressed size 0.6659 -> 0.6744 at sf0.1: every
    (file x bucket) crossing restarted codec state. File junctions inside
    an emitted chunk are still recorded as PAGED segment bounds, so the
    selector keeps the exact choice between one shared whole-chunk codec
    and per-segment re-selection (codec/select.candidate_sizes evaluates
    both and takes the min).

    Memory contract — zero-copy with a pinned-file window: accumulator
    parts are VIEWS into the source files' Arrow buffers (no copy on the
    encode hot path; the host-bandwidth ceiling is the encode-scaling
    wall, so every avoided byte of traffic counts). A view pins its whole
    file's token buffer, so pinning is bounded two ways: (a)
    ``pin_window`` — after each file, any accumulator still holding parts
    from more than ``pin_window`` files ago is drained in full (its
    views, and therefore those old file buffers, are released); (b)
    ``buffer_budget_values`` — when total buffered values exceed the
    budget, the largest accumulators are drained early as sub-max chunks.
    High-water memory is therefore O(pin_window files + budget), never
    O(task file group). The only payload copy in the path is the
    per-chunk gather when an emitted chunk spans multiple parts (a
    contiguous buffer is what the codec kernels encode from).

    At :meth:`flush` (end of task) each bucket's sub-``min_chunk`` tail
    that cannot stand alone is merged with neighbouring buckets' tails
    into a mixed chunk carrying ``[bucket, bucket_max]`` and per-tail
    segment bounds — at most one mixed chunk per ~``min_chunk`` values,
    instead of one fragment per (file x bucket) crossing.
    """

    def __init__(
        self,
        opts,
        task_id: int,
        min_chunk_values: int,
        buffer_budget_values: int = 1 << 25,
        pin_window: int = 8,
    ):
        from .encode import _encode_chunk, chunk_row_starts

        self._encode_chunk = _encode_chunk
        self._chunk_row_starts = chunk_row_starts
        self.opts = opts
        self.task_id = task_id
        self.min_chunk = min_chunk_values
        self.budget = max(int(buffer_budget_values), opts.max_chunk_values)
        self.pin_window = max(1, int(pin_window))
        self.seq = 0
        self.rows: list[dict] = []
        self.chunk_docs: list[pa.Array] = []
        self._accs: dict[int, _BucketAcc] = {}
        self._buffered = 0
        self._serial = 0

    def add_file(self, doc_ids, lengths, values, buckets) -> None:
        n = int(lengths.size)
        if n == 0:
            return
        val_off = np.concatenate(([0], np.cumsum(lengths)))
        trans = np.flatnonzero(np.diff(buckets) != 0) + 1
        bounds = [0, *(int(x) for x in trans), n]
        max_chunk = self.opts.max_chunk_values
        serial = self._serial
        self._serial += 1
        for s, e in zip(bounds[:-1], bounds[1:]):
            b = int(buckets[s])
            acc = self._accs.get(b)
            if acc is None:
                acc = self._accs[b] = _BucketAcc()
            acc.docs.append(doc_ids.slice(s, e - s))
            acc.lens.append(lengths[s:e])
            acc.vals.append(values[val_off[s] : val_off[e]])
            acc.serials.append(serial)
            nv = int(val_off[e] - val_off[s])
            acc.n_values += nv
            self._buffered += nv
            if acc.n_values >= max_chunk:
                self._drain(b, acc, hold_tail=True)
        # pinned-file window: release views into files older than the
        # window by draining the accumulators that still hold them
        horizon = self._serial - self.pin_window
        if horizon > 0:
            for b, acc in self._accs.items():
                if acc.serials and acc.serials[0] < horizon:
                    self._drain(b, acc, hold_tail=False)
        while self._buffered > self.budget:
            b = max(self._accs, key=lambda k: self._accs[k].n_values)
            self._drain(b, self._accs[b], hold_tail=False)

    def flush(self) -> None:
        """End of task: emit every bucket's tail. Tails of at least
        ``min_chunk`` values stand alone (bucket-pure); smaller tails are
        merged with neighbouring buckets into mixed chunks."""
        pending: list[tuple[int, _BucketAcc]] = []
        for b in sorted(self._accs):
            acc = self._accs[b]
            if acc.n_values <= 0:
                continue
            if acc.n_values >= self.min_chunk or self.min_chunk <= 0:
                self._drain(b, acc, hold_tail=False)
            else:
                pending.append((b, acc))
        group: list[tuple[int, _BucketAcc]] = []
        gsize = 0
        for b, acc in pending:
            group.append((b, acc))
            gsize += acc.n_values
            if gsize >= self.min_chunk:
                self._emit_merged(group)
                group, gsize = [], 0
        if group:
            self._emit_merged(group)
        self._accs.clear()
        self._buffered = 0

    def _drain(self, bucket: int, acc: _BucketAcc, hold_tail: bool) -> None:
        """Cut full chunks from one bucket's accumulated runs; when
        ``hold_tail`` keep the sub-max trailing rows buffered (as detached
        per-part copies, preserving junctions)."""
        lengths = (
            acc.lens[0] if len(acc.lens) == 1 else np.concatenate(acc.lens)
        )
        n = int(lengths.size)
        if n == 0:
            return
        val_off = np.concatenate(([0], np.cumsum(lengths)))
        starts = self._chunk_row_starts(
            lengths, self.opts.max_chunk_values, None
        )
        pairs = [(a, b) for a, b in zip(starts[:-1], starts[1:]) if a < b]
        tail_start = n
        if hold_tail and pairs:
            a, b = pairs[-1]
            if val_off[b] - val_off[a] < self.opts.max_chunk_values:
                pairs.pop()
                tail_start = a
        if not pairs:
            return
        sizes = np.array([x.size for x in acc.lens], dtype=np.int64)
        pbounds = np.concatenate(([0], np.cumsum(sizes)))  # part row bounds
        junctions = pbounds[1:-1]
        for a, b in pairs:
            docs_c = self._gather_docs(acc, pbounds, a, b)
            vals_c = self._gather_vals(acc, pbounds, val_off, a, b)
            inner = junctions[(junctions > a) & (junctions < b)]
            seg = (val_off[inner] - val_off[a]) if inner.size else None
            self._emit(docs_c, lengths[a:b], vals_c, bucket, bucket, seg)
        old = acc.n_values
        self._rebuild_tail(acc, pbounds, val_off, lengths, tail_start, n)
        self._buffered += acc.n_values - old

    def _gather_docs(self, acc, pbounds, a, b) -> pa.Array:
        i = int(np.searchsorted(pbounds, a, side="right")) - 1
        j = int(np.searchsorted(pbounds, b, side="left")) - 1
        if i == j:
            return acc.docs[i].slice(a - pbounds[i], b - a)
        pieces = []
        for p in range(i, j + 1):
            s = max(a, int(pbounds[p])) - int(pbounds[p])
            e = min(b, int(pbounds[p + 1])) - int(pbounds[p])
            if e > s:
                pieces.append(acc.docs[p].slice(s, e - s))
        return pa.concat_arrays(pieces)

    def _gather_vals(self, acc, pbounds, val_off, a, b) -> np.ndarray:
        i = int(np.searchsorted(pbounds, a, side="right")) - 1
        j = int(np.searchsorted(pbounds, b, side="left")) - 1
        va, vb = int(val_off[a]), int(val_off[b])
        pv = int(val_off[pbounds[i]])
        if i == j:
            return acc.vals[i][va - pv : vb - pv]
        pieces = []
        for p in range(i, j + 1):
            ps = int(val_off[pbounds[p]])
            pe = int(val_off[pbounds[p + 1]])
            s, e = max(va, ps) - ps, min(vb, pe) - ps
            if e > s:
                pieces.append(acc.vals[p][s:e])
        return np.concatenate(pieces)

    def _rebuild_tail(
        self, acc, pbounds, val_off, lengths, tail_start, n
    ) -> None:
        """Replace the accumulator's parts with rows [tail_start, n),
        keeping per-part splits (future segment bounds) and part serials
        (the pin-window bound). Value pieces stay views — the pin window /
        budget own the memory bound, not copies. Length pieces are copied
        (8 B/row) so the concatenated cutting temp is not pinned."""
        docs, lens, vals, serials = [], [], [], []
        nv = 0
        for p in range(len(acc.lens)):
            rs, re = int(pbounds[p]), int(pbounds[p + 1])
            s, e = max(rs, tail_start), re
            if s >= e:
                continue
            docs.append(acc.docs[p].slice(s - rs, e - s))
            lens.append(lengths[s:e].copy())
            ps = int(val_off[pbounds[p]])
            vals.append(
                acc.vals[p][int(val_off[s]) - ps : int(val_off[e]) - ps]
            )
            serials.append(acc.serials[p])
            nv += int(val_off[e] - val_off[s])
        acc.docs, acc.lens, acc.vals, acc.n_values = docs, lens, vals, nv
        acc.serials = serials

    def _emit_merged(self, group: list[tuple[int, _BucketAcc]]) -> None:
        """One mixed chunk from several buckets' sub-min_chunk tails:
        every part junction (bucket or file) becomes a segment bound;
        ``bucket``/``bucket_max`` record the true range."""
        docs = [d for _, acc in group for d in acc.docs]
        lens = [x for _, acc in group for x in acc.lens]
        vals = [v for _, acc in group for v in acc.vals]
        lengths = lens[0] if len(lens) == 1 else np.concatenate(lens)
        values = vals[0] if len(vals) == 1 else np.concatenate(vals)
        sizes = np.array([v.size for v in vals], dtype=np.int64)
        seg_all = np.cumsum(sizes)[:-1]
        seg = seg_all[(seg_all > 0) & (seg_all < int(values.size))]
        self._emit(
            pa.concat_arrays(docs) if len(docs) > 1 else docs[0],
            lengths,
            values,
            group[0][0],
            group[-1][0],
            seg if seg.size else None,
        )

    def _emit(self, docs, lengths, values, bucket, bucket_max, seg) -> None:
        self.rows.append(
            self._encode_chunk(
                docs,
                lengths,
                values,
                self.opts,
                self.task_id,
                self.seq,
                int(bucket),
                seg_values=seg,
                bucket_max=int(bucket_max),
            )
        )
        self.chunk_docs.append(docs)
        self.seq += 1

    def batch(self) -> pa.RecordBatch | None:
        from .encode import _BLOCKS_ARROW_SCHEMA

        if not self.rows:
            return None
        offs = np.zeros(len(self.chunk_docs) + 1, dtype=np.int64)
        np.cumsum([len(d) for d in self.chunk_docs], out=offs[1:])
        doc_id_lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.concat_arrays(self.chunk_docs)
        )
        cols = [
            doc_id_lists
            if f.name == "doc_ids"
            else pa.array([r[f.name] for r in self.rows], f.type)
            for f in _BLOCKS_ARROW_SCHEMA
        ]
        return pa.RecordBatch.from_arrays(cols, schema=_BLOCKS_ARROW_SCHEMA)


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
    """Fused exchange + encode: each task streams its file group ONE FILE AT
    A TIME — read, sort by the cluster key, bucket, encode — so the bucketed
    intermediate is never written or re-read AND working memory is O(one
    file), not O(task file group). Round 3 materialized the whole group
    (``concat_tables + take + combine_chunks`` ≈ 3 copies of the task's
    token data) before encoding; at low parallelism groups grow and that
    allocation traffic was the encode-scaling wall. Per-file processing
    keeps the allocation profile flat across parallelism levels.

    Chunk composition comes from PER-BUCKET accumulators
    (:class:`_FusedChunkEmitter`): each bucket's per-file runs merge into
    bucket-pure chunks of up to ``max_chunk_values``, so whole-chunk codec
    state (one dictionary, one FOR frame) is shared across files instead of
    restarting at every (file x bucket) crossing — per-file sorting costs
    no compression vs a task-global sort (measured 0.6647 vs 0.6659 at
    sf0.1). File junctions inside a chunk stay recorded as PAGED segment
    bounds, so the selector can still re-pick codecs per segment when that
    is smaller.

    ``min_chunk_values`` (default ``max_chunk_values // 4``) governs
    end-of-task tails: a bucket tail at least this large stands alone;
    smaller tails merge with neighbouring buckets into mixed chunks. A
    mixed chunk's ``bucket`` is the lowest bucket its rows span and
    ``bucket_max`` the highest — readers filtering by bucket must use the
    ``[bucket, bucket_max]`` range (or pass ``min_chunk_values=0`` for
    strict chunk/bucket homogeneity, e.g. ``write.partitionBy("bucket")``
    products).

    Trade recorded, not hidden: chunks cannot span tasks, so n_chunks >=
    n_tasks, and there is no bucketed table for other readers — use the
    two-phase path when the clustered tokens table itself is a product.

    Returns the blocks DataFrame (standard blocks schema, ``bucket`` set).
    """
    from .encode import BLOCKS_SPARK_SCHEMA, EncodeOptions

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
    from ..sources.parquet_direct import task_rows_dataframe

    tasks = task_rows_dataframe(
        spark,
        [(i, g) for i, g in enumerate(groups)],
        "task_id int, paths array<string>",
    )
    read_cols = list(dict.fromkeys([*key_cols, "doc_id", "tokens"]))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tb in batches:
            task_ids = tb.column("task_id").to_pylist()
            for task_id, paths in zip(task_ids, tb.column("paths").to_pylist()):
                em = _run_fused_task(
                    task_id, paths, opts, min_chunk_values,
                    cuts_b, cuts_w, key_fn, read_cols,
                )
                out = em.batch()
                if out is not None:
                    yield out

    return tasks.mapInArrow(fn, BLOCKS_SPARK_SCHEMA)


def _run_fused_task(
    task_id, paths, opts, min_chunk_values, cuts_b, cuts_w, key_fn, read_cols
) -> _FusedChunkEmitter:
    """One fused-encode task: stream each file through read -> key -> sort ->
    bucket -> emitter (shared by the DataFrame and direct-sink forms)."""
    em = _FusedChunkEmitter(opts, task_id, min_chunk_values)
    for path in paths:
        t = pq.read_table(path, columns=read_cols)
        if t.num_rows == 0:
            continue
        keys_b = _utf8_fixed_bytes(key_fn(t), cuts_w)
        # corpora are commonly written key-sorted within each file (the
        # generator's layout, and the natural shape of a resharded corpus);
        # then the argsort is the identity and the row gather — a full copy
        # of every token value — is skipped entirely
        if keys_b.size < 2 or bool(np.all(keys_b[:-1] <= keys_b[1:])):
            keys_sorted = keys_b
            t = t.combine_chunks()
        else:
            order = np.argsort(keys_b, kind="stable")
            keys_sorted = keys_b[order]
            t = t.take(pa.array(order)).combine_chunks()
        if cuts_b.size:
            buckets = np.searchsorted(cuts_b, keys_sorted, side="left")
        else:
            buckets = np.zeros(keys_b.size, dtype=np.int64)
        tokens_arr = t.column("tokens").chunk(0)
        doc_arr = t.column("doc_id").chunk(0)
        lengths = tokens_arr.value_lengths().to_numpy().astype(np.int64)
        values = tokens_arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.int32, copy=False
        )
        em.add_file(doc_arr, lengths, values, buckets)
    em.flush()
    return em


def exchange_encode_fused_direct(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    num_buckets: int,
    options=None,
    key_fn: Callable[[pa.Table], pa.Array] = doc_id_key,
    key_cols: tuple[str, ...] = ("doc_id",),
    weight_col: str = "n_tok",
    n_tasks: int | None = None,
    cuts: list[str] | None = None,
    min_chunk_values: int | None = None,
) -> dict:
    """:func:`exchange_encode_fused` with a WORKER-SIDE parquet sink.

    The DataFrame form returns encoded chunks to the JVM, which boxes every
    payload into rows and funnels them through Spark's parquet writer —
    measured as the 4N-executor encode ceiling on this host (decode, which
    moves no payload bytes into the JVM, scaled 0.93 in the same campaign
    while encode sat at ~15 M tok/s for 2 AND 8 cores). Here each task
    writes its own blocks fragment with pyarrow (deterministic name, atomic
    tmp+rename — the corpus generator / exchange sink pattern), so encoded
    bytes go numpy -> Arrow -> parquet entirely inside the worker and the
    JVM sees only one manifest row per task.

    Also writes ``_manifest.json`` per-fragment row counts (the decode
    side's row-range split planning reads it without touching footers) and
    ``_SUCCESS``. Returns a summary dict with the manifest totals.
    """
    import shutil

    from .encode import EncodeOptions
    from ..sources.parquet_direct import write_file_manifest

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
    if n_tasks is None:
        n_tasks = spark.sparkContext.defaultParallelism
    if os.path.isdir(out_path):
        shutil.rmtree(out_path, ignore_errors=True)
    groups = list(enumerate(_group_files(files, n_tasks)))
    manifest = _fused_direct_run(
        spark, groups, out_path, opts, cuts, key_fn, key_cols,
        min_chunk_values,
    )
    write_file_manifest(
        out_path,
        {
            os.path.relpath(r.path, out_path): int(r.n_chunks)
            for r in manifest
            if r.path
        },
        file_stats={
            os.path.relpath(r.path, out_path): {
                "min_doc_id": r.min_doc_id, "max_doc_id": r.max_doc_id
            }
            for r in manifest
            if r.path
        },
    )
    with open(os.path.join(out_path, "_SUCCESS"), "w"):
        pass
    return {
        "n_fragments": sum(1 for r in manifest if r.path),
        "n_chunks": sum(r.n_chunks for r in manifest),
        "n_rows": sum(r.n_rows for r in manifest),
        "n_values": sum(r.n_values for r in manifest),
        "bytes_raw": sum(r.bytes_raw for r in manifest),
        "bytes_enc": sum(r.bytes_enc for r in manifest),
        "bytes_ref": sum(r.bytes_ref for r in manifest),
        "cuts": cuts,
        # per-task wall spans (epoch sec): diagnosing scaling — worker busy
        # time vs scheduling gaps / stragglers / driver-side serial work
        "task_spans": sorted(
            (round(r.t_start, 3), round(r.t_end, 3)) for r in manifest
        ),
    }


def _fused_direct_run(
    spark: SparkSession,
    groups: list[tuple[int, list[str]]],
    out_path: str,
    opts,
    cuts: list[str],
    key_fn: Callable[[pa.Table], pa.Array],
    key_cols: tuple[str, ...],
    min_chunk_values: int,
) -> list:
    """Run fused encode for explicit ``(task_id, paths)`` groups, one
    worker-written fragment per task (atomic rename, deterministic name —
    a task retry or a resumed run overwrites, never duplicates). Returns
    the collected per-task manifest rows. Shared by the one-shot direct
    sink and the checkpoint-resumable job, which passes only its PENDING
    task groups."""
    cuts_b, cuts_w = _cuts_fixed_bytes(cuts)
    os.makedirs(out_path, exist_ok=True)
    from ..sources.parquet_direct import task_rows_dataframe

    tasks = task_rows_dataframe(
        spark, groups, "task_id int, paths array<string>"
    )
    read_cols = list(dict.fromkeys([*key_cols, "doc_id", "tokens"]))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import time as _time

        from ..sources.parquet_direct import write_parquet_atomic

        for tb in batches:
            task_ids = tb.column("task_id").to_pylist()
            for task_id, paths in zip(task_ids, tb.column("paths").to_pylist()):
                t0 = _time.time()
                em = _run_fused_task(
                    task_id, paths, opts, min_chunk_values,
                    cuts_b, cuts_w, key_fn, read_cols,
                )
                out = em.batch()
                n_chunks = n_rows = n_values = 0
                b_raw = b_enc = b_ref = 0
                dmin = dmax = ""
                final = os.path.join(out_path, f"part-{task_id:05d}.parquet")
                if out is not None:
                    write_parquet_atomic(pa.Table.from_batches([out]), final)
                    n_chunks = out.num_rows
                    n_rows = sum(r["n_rows"] for r in em.rows)
                    n_values = sum(r["n_values"] for r in em.rows)
                    b_raw = sum(r["bytes_raw"] for r in em.rows)
                    b_enc = sum(r["bytes_enc"] for r in em.rows)
                    b_ref = sum(r["bytes_ref"] for r in em.rows)
                    # fragment zone map: the file-level envelope of the
                    # per-chunk doc-id spans, recorded in _manifest.json so
                    # range scans drop whole fragments before any footer.
                    # Chunks of empty doc_id sets carry None spans — skip
                    # them; an all-None fragment keeps the "" sentinel
                    # (scans treat an empty envelope as "always keep").
                    mins = [r["min_doc_id"] for r in em.rows
                            if r["min_doc_id"] is not None]
                    maxs = [r["max_doc_id"] for r in em.rows
                            if r["max_doc_id"] is not None]
                    dmin = min(mins) if mins else ""
                    dmax = max(maxs) if maxs else ""
                yield pa.RecordBatch.from_pydict(
                    {
                        "task_id": [task_id],
                        "path": [final if out is not None else ""],
                        "min_doc_id": [dmin],
                        "max_doc_id": [dmax],
                        "n_chunks": [n_chunks],
                        "n_rows": [n_rows],
                        "n_values": [n_values],
                        "bytes_raw": [b_raw],
                        "bytes_enc": [b_enc],
                        "bytes_ref": [b_ref],
                        # per-task wall span: lets callers separate worker
                        # busy time from scheduling/stragglers/serial driver
                        # work when diagnosing scaling (epoch seconds)
                        "t_start": [t0],
                        "t_end": [_time.time()],
                    },
                    schema=pa.schema(
                        [
                            ("task_id", pa.int32()),
                            ("path", pa.string()),
                            ("min_doc_id", pa.string()),
                            ("max_doc_id", pa.string()),
                            ("n_chunks", pa.int64()),
                            ("n_rows", pa.int64()),
                            ("n_values", pa.int64()),
                            ("bytes_raw", pa.int64()),
                            ("bytes_enc", pa.int64()),
                            ("bytes_ref", pa.int64()),
                            ("t_start", pa.float64()),
                            ("t_end", pa.float64()),
                        ]
                    ),
                )

    return tasks.mapInArrow(
        fn,
        "task_id int, path string, min_doc_id string, max_doc_id string, "
        "n_chunks long, n_rows long, "
        "n_values long, bytes_raw long, bytes_enc long, bytes_ref long, "
        "t_start double, t_end double",
    ).collect()
