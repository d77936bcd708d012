"""Native columnar scan path: pyarrow reads parquet inside the worker.

Spark's ``mapInArrow`` input conversion materializes ``array<int>`` rows
element-by-element in the JVM before shipping them to Python — measured ~20s
for a 440 MB token table that pyarrow scans columnar in ~2s. This module is
the engine's "vectorized native reader" (SURVEY §2.1 S1/S3): Spark still
owns distribution — file splits become task rows, with scheduling, retries
and locality — but bytes go parquet -> Arrow -> numpy with no JVM row trip.
This mirrors how production DSv2 connectors (Iceberg's vectorized reader)
bypass row materialization.

Works for any parquet/Iceberg-data-files layout; at 100 TB the file list
comes from the table's manifest instead of a directory listing.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from ..engine.encode import (
    _BLOCKS_ARROW_SCHEMA,
    BLOCKS_SPARK_SCHEMA,
    EncodeOptions,
)


def write_parquet_atomic(table: pa.Table, final: str) -> None:
    """Worker-side atomic parquet write: unique per-attempt tmp name (pid +
    random suffix, leading dot so data scans skip it) then ``os.replace``.
    A fixed tmp name races when two attempts of the same task overlap
    (speculation / stage retry): the first rename consumes the shared tmp
    and the second crashes with FileNotFoundError — observed in a 2-core
    scaling campaign. Unique tmp names make concurrent attempts each
    rename their own file; last rename wins, content is identical."""
    import uuid

    d, name = os.path.split(final)
    tmp = os.path.join(d, f".{name}.{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, final)


def write_file_manifest(
    root: str,
    row_counts: dict[str, int],
    file_stats: dict[str, dict] | None = None,
) -> None:
    """Write-side fragment manifest (``_manifest.json``): per-file row
    counts keyed by path relative to the dataset root — the seam where a
    table format's manifest column metrics (Iceberg ``record_count``) plug
    in. Readers plan row-range splits from it without opening parquet
    footers. ``file_stats`` adds per-file ZONE MAPS (e.g. ``{"min_doc_id":
    ..., "max_doc_id": ...}`` for blocks fragments — the manifest-level
    analog of Iceberg's ``lower_bounds``/``upper_bounds``): range scans
    drop whole files from the plan before Spark opens a single footer.
    Atomic tmp+rename; name starts with ``_`` so Spark/DuckDB data scans
    ignore it."""
    import json

    path = os.path.join(root, "_manifest.json")
    tmp = path + ".tmp"
    doc = {"row_counts": row_counts}
    if file_stats:
        doc["file_stats"] = file_stats
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, path)


def _manifest_row_counts(files: list[str]) -> dict[str, int] | None:
    """Per-file row counts from ``_manifest.json`` sidecars, or ``None``
    when any file is uncovered. Checks each file's directory, then one
    level up (hive ``bucket=N/`` layouts keep fragments below the root)."""
    import json

    cache: dict[str, dict | None] = {}
    counts: dict[str, int] = {}
    for f in files:
        found = None
        d = os.path.dirname(f)
        for root in (d, os.path.dirname(d)):
            if root not in cache:
                try:
                    with open(os.path.join(root, "_manifest.json")) as fh:
                        cache[root] = json.load(fh).get("row_counts", {})
                except (OSError, ValueError):
                    cache[root] = None
            rc = cache[root]
            if rc is not None:
                rel = os.path.relpath(f, root)
                if rel in rc:
                    found = int(rc[rel])
                    break
        if found is None:
            return None
        counts[f] = found
    return counts


def manifest_file_stats(files: list[str]) -> dict[str, dict]:
    """Per-file zone maps from ``_manifest.json`` sidecars (same two-level
    directory lookup as the row counts). Files without recorded stats just
    don't appear — pruning treats them conservatively."""
    import json

    cache: dict[str, dict | None] = {}
    out: dict[str, dict] = {}
    for f in files:
        d = os.path.dirname(f)
        for root in (d, os.path.dirname(d)):
            if root not in cache:
                try:
                    with open(os.path.join(root, "_manifest.json")) as fh:
                        cache[root] = json.load(fh).get("file_stats", {})
                except (OSError, ValueError):
                    cache[root] = None
            st = cache[root]
            if st is not None:
                rel = os.path.relpath(f, root)
                if rel in st:
                    out[f] = st[rel]
                    break
    return out


def prune_files_by_doc_range(
    files: list[str], lo: str | None, hi: str | None
) -> list[str]:
    """Drop files whose manifest zone map ``[min_doc_id, max_doc_id]``
    cannot intersect ``[lo, hi)`` — BEFORE any parquet footer is opened.
    Files without recorded stats are kept (conservative). At 100 TB this
    turns a range query's planning cost from O(all files) into O(matching
    files + manifest read); the surviving files' row groups still prune
    again at the parquet level via the pushed zone-map predicate."""
    stats = manifest_file_stats(files)
    keep = []
    for f in files:
        st = stats.get(f)
        if st is None:
            keep.append(f)
            continue
        mn, mx = st.get("min_doc_id"), st.get("max_doc_id")
        # "" is the sink's "no envelope" sentinel (all chunks had empty
        # doc-id sets) — conservative keep, same as missing stats
        if not mn or not mx:
            keep.append(f)
            continue
        if (hi is not None and mn >= hi) or (lo is not None and mx < lo):
            continue
        keep.append(f)
    return keep


def blocks_scan(
    spark: SparkSession,
    blocks_path: str,
    doc_range: tuple[str | None, str | None] | None = None,
):
    """Catalyst scan over a blocks table with MANIFEST-level file pruning.

    ``doc_range=(lo, hi)`` (half-open, either end ``None``) drops whole
    fragments via the ``_manifest.json`` zone maps before the Spark scan
    is even planned; chunk- and row-group-level pruning on
    ``min_doc_id``/``max_doc_id`` (``decode_doc_range``'s pushed filter)
    then applies within the survivors. Without ``doc_range`` this is just
    ``spark.read.parquet`` over the table's files."""
    files = list_parquet_files(blocks_path)
    if not files:
        raise ValueError(f"no parquet files under {blocks_path}")
    if doc_range is not None:
        pruned = prune_files_by_doc_range(files, doc_range[0], doc_range[1])
        if not pruned:  # everything pruned: empty frame, real schema
            return spark.read.parquet(files[0]).limit(0)
        files = pruned
    return spark.read.parquet(*files)


def blocks_files_df(spark: SparkSession, blocks_path: str):
    """The blocks store's ``files`` metadata table (the
    :func:`..sources.iceberg.files_df` analog): one row per fragment with
    its manifest row count, doc-id envelope, and size — all from
    ``_manifest.json`` + a directory listing, no parquet footer opened.
    Fragments predating zone-map manifests surface NULL envelopes (the
    conservative readers keep them; this view is how an operator SEES
    which fragments lack stats and would benefit from a rewrite)."""
    files = list_parquet_files(blocks_path)
    if not files:
        raise ValueError(f"no parquet files under {blocks_path}")
    counts = _manifest_row_counts(files) or {}
    stats = manifest_file_stats(files)
    rows = [
        {
            "file_path": f,
            "n_chunks": counts.get(f),
            "min_doc_id": (stats.get(f) or {}).get("min_doc_id"),
            "max_doc_id": (stats.get(f) or {}).get("max_doc_id"),
            "file_size_in_bytes": os.path.getsize(f),
        }
        for f in files
    ]
    return spark.createDataFrame(
        rows,
        "file_path string, n_chunks long, min_doc_id string, "
        "max_doc_id string, file_size_in_bytes long",
    )


def task_rows_dataframe(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Task-plan DataFrame with deterministic, balanced task groups per
    Spark partition, from a JVM-side source (no exchange, no Python scan).

    Up to ``4 * defaultParallelism`` groups, the rows ship as an
    Arrow-backed local table: PySpark slices it positionally into
    ``min(n, defaultParallelism)`` even partitions, so each Spark task
    carries at most 4 consecutive groups and the job pays ONE Python pass
    (its mapInArrow) instead of two. The previous ``parallelize`` form kept
    exactly one group per partition but its Python-RDD scan is a second
    per-task Python round-trip (~160 ms each, measured r6): a no-work
    64-group plan fell 0.90 s -> 0.28 s at 32 cores under the Arrow form.
    Beyond ``4 * parallelism`` groups the ``parallelize`` slicing returns
    (one group per partition, exact): at fleet scale retry, speculation
    and straggler granularity beat per-task launch latency, and group
    counts there exceed core counts anyway. Results never depend on the
    partitioning — fragments and ledgers key on ``task_id`` from the row."""
    sc = spark.sparkContext
    n = len(rows)
    if 0 < n <= 4 * sc.defaultParallelism:
        import pandas as pd
        from pyspark.sql.types import StructType

        names = StructType.fromDDL(schema).names
        pdf = pd.DataFrame.from_records(list(rows), columns=names)
        return spark.createDataFrame(pdf, schema)
    return spark.createDataFrame(
        sc.parallelize(rows, max(1, n)), schema
    )


def _footer_row_counts(spark: SparkSession, files: list[str]) -> dict[str, int]:
    """Distributed footer scan: workers read ``num_rows`` from their share
    of the file list — never a driver loop over footers (at 100 TB even
    listing-adjacent metadata reads belong on executors)."""
    n_parts = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    df = spark.createDataFrame(
        spark.sparkContext.parallelize([(f,) for f in files], n_parts),
        "path string",
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            paths = b.column("path").to_pylist()
            if not paths:
                continue
            yield pa.RecordBatch.from_pydict(
                {
                    "path": paths,
                    "n": [pq.read_metadata(p).num_rows for p in paths],
                },
                schema=pa.schema([("path", pa.string()), ("n", pa.int64())]),
            )

    return {
        r.path: int(r.n)
        for r in df.mapInArrow(fn, "path string, n long").collect()
    }


def file_row_counts(spark: SparkSession, files: list[str]) -> dict[str, int]:
    """Manifest sidecar when every file is covered, else distributed
    footer reads."""
    return _manifest_row_counts(files) or _footer_row_counts(spark, files)


def list_parquet_files(path: str) -> list[str]:
    """Input-path resolver for the worker-side scan paths. Plain paths
    walk the directory; ``iceberg://<table>[@<snapshot-id>]`` resolves the
    LIVE data files of an Iceberg snapshot via scan planning
    (:mod:`.iceberg`) — the whole fused/direct deployment surface then
    consumes Iceberg tables natively, including time travel."""
    if path.startswith("iceberg://"):
        from .iceberg import plan_scan
        from .iceberg_catalog import resolve_uri

        table, snap = resolve_uri(path)  # plain path or warehouse::ns.tbl
        snapshot_id = int(snap) if snap else None
        live_deletes = [
            f
            for f in plan_scan(table, snapshot_id, content=None)
            if f.content != 0
        ]
        if live_deletes:
            raise ValueError(
                "iceberg table has live position/equality deletes; the "
                "file-level scan path cannot apply them — read via "
                "sources.iceberg.read_table (merge-on-read) or run "
                "rewrite_data_files first"
            )
        return sorted(f.file_path for f in plan_scan(table, snapshot_id))
    return sorted(
        os.path.join(dp, f)
        for dp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def group_files_by_size(files: list[str], n_tasks: int) -> list[list[str]]:
    """Greedy size-balanced grouping (largest-first into lightest group) —
    the fan-in that keeps per-task work even when fragment sizes skew.
    Lightest-group selection via a heap: O(n log k) over n files, not the
    O(n*k) linear scan per file (driver-side planning cost matters once
    fragment counts reach the millions)."""
    import heapq

    n_tasks = max(1, min(n_tasks, len(files)))
    sized = sorted(((os.path.getsize(f), f) for f in files), key=lambda t: -t[0])
    groups: list[list[str]] = [[] for _ in range(n_tasks)]
    # (load, group_index) heap; ties break on the lower index, matching
    # the list-scan behavior so existing groupings are unchanged
    heap = [(0, i) for i in range(n_tasks)]
    heapq.heapify(heap)
    for sz, f in sized:
        load, i = heapq.heappop(heap)
        groups[i].append(f)
        heapq.heappush(heap, (load + sz, i))
    return [sorted(g) for g in groups if g]


def file_task_dataframe(
    spark: SparkSession, files: list[str], n_tasks: int | None = None
) -> DataFrame:
    """One task row per file group; Spark schedules/retries, pyarrow reads.

    ``n_tasks=None`` keeps one file per task; passing a target groups small
    fragments together (decode fan-in — many small blocks files otherwise
    pay a fixed Arrow/scheduling overhead each)."""
    groups = (
        [[f] for f in files] if n_tasks is None
        else group_files_by_size(files, n_tasks)
    )
    return task_rows_dataframe(
        spark,
        [(i, g) for i, g in enumerate(groups)],
        "task_id int, paths array<string>",
    )


_TASK_SCHEMA = (
    "task_id int, paths array<string>, los array<long>, his array<long>"
)


def block_task_dataframe(
    spark: SparkSession, files: list[str], n_tasks: int | None = None
) -> DataFrame:
    """Task planning with sub-file splits: when there are fewer files than
    ``n_tasks``, large files are split into row ranges (row counts from the
    write-side ``_manifest.json`` when present — the table-format manifest
    seam — else a distributed footer scan; the driver never loops over
    footers), so DECODE parallelism is decoupled from however many files
    the encode side happened to write. ``hi == -1`` means "to end"."""
    if n_tasks is None or len(files) >= n_tasks:
        groups = (
            [[f] for f in files] if n_tasks is None
            else group_files_by_size(files, n_tasks)
        )
        rows = [
            (i, g, [0] * len(g), [-1] * len(g)) for i, g in enumerate(groups)
        ]
    else:
        counts = file_row_counts(spark, files)
        total = sum(counts.values())
        per = max(1, -(-total // n_tasks))
        specs = [
            (f, lo, min(lo + per, counts[f]))
            for f in files
            for lo in range(0, counts[f], per)
        ]
        rows = [
            (i, [p], [lo], [hi]) for i, (p, lo, hi) in enumerate(specs)
        ]
    rows = [r for r in rows if r[1]]
    return task_rows_dataframe(spark, rows, _TASK_SCHEMA)


def _iter_task_files(tb: pa.RecordBatch):
    """Yield ``(task_id, [(path, lo, hi), ...])`` from a task batch of
    either schema (with or without the row-range columns)."""
    names = tb.schema.names
    task_ids = tb.column("task_id").to_pylist()
    paths_col = tb.column("paths").to_pylist()
    if "los" in names:
        los_col = tb.column("los").to_pylist()
        his_col = tb.column("his").to_pylist()
    else:
        los_col = [[0] * len(p) for p in paths_col]
        his_col = [[-1] * len(p) for p in paths_col]
    for task_id, paths, los, his in zip(task_ids, paths_col, los_col, his_col):
        yield task_id, list(zip(paths, los, his))


def _read_block_batches(
    path: str, cols: list[str], lo: int = 0, hi: int = -1, batch_size: int = 64
):
    """Record batches for a (possibly row-sliced) parquet file. Whole-file
    reads stream via ``iter_batches``; sliced reads prune at ROW-GROUP
    level first — ``[lo, hi)`` maps to the overlapping row groups via the
    footer, only those are read, then the exact row slice is taken — so k
    slices of one file cost ~one file's IO total, not k full-file reads."""
    if lo == 0 and hi == -1:
        pf = pq.ParquetFile(path)
        yield from pf.iter_batches(batch_size=batch_size, columns=cols)
    else:
        pf = pq.ParquetFile(path)
        md = pf.metadata
        hi = md.num_rows if hi < 0 else min(hi, md.num_rows)
        if hi <= lo:
            return
        rg_start, keep = 0, []
        base = None
        for i in range(md.num_row_groups):
            rg_end = rg_start + md.row_group(i).num_rows
            if rg_start < hi and rg_end > lo:
                if base is None:
                    base = rg_start
                keep.append(i)
            rg_start = rg_end
        if not keep:
            return
        t = pf.read_row_groups(keep, columns=cols)
        yield from t.slice(lo - base, hi - lo).to_batches(
            max_chunksize=batch_size
        )


def encode_parquet_direct(
    spark: SparkSession,
    in_path: str,
    options: EncodeOptions | None = None,
    batch_rows: int = 4096,
    bucket_from_dir: bool = False,
    n_tasks: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Encode a tokens parquet dataset via worker-side columnar scans.

    Returns the blocks DataFrame (same schema as
    :func:`..engine.encode.encode_dataframe`). ``bucket_from_dir`` parses
    ``bucket=N`` path segments (hive-partitioned layout) into the manifest.
    ``n_tasks`` groups many small files into size-balanced tasks.
    ``buckets`` restricts the scan to those ``bucket=N`` directories
    (partition pruning for the resumable job's pending set).
    """
    from ..engine import encode as E

    opts = options or EncodeOptions()
    files = list_parquet_files(in_path)
    if buckets is not None:
        keep = {f"bucket={b}" for b in buckets}
        files = [
            f for f in files if keep.intersection(f.split(os.sep))
        ]
    if not files:
        raise ValueError(f"no parquet files under {in_path}")
    tasks = file_task_dataframe(spark, files, n_tasks)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx else 0
        seq = 0
        for tb in batches:
            for path in (
                p for ps in tb.column("paths").to_pylist() for p in ps
            ):
                bucket = 0
                if bucket_from_dir:
                    for seg in path.split(os.sep):
                        if seg.startswith("bucket="):
                            bucket = int(seg.split("=", 1)[1])
                pf = pq.ParquetFile(path)
                for batch in pf.iter_batches(
                    batch_size=batch_rows, columns=["doc_id", "tokens"]
                ):
                    if batch.num_rows == 0:
                        continue
                    lengths, values = E._flatten_tokens(batch)
                    import numpy as np

                    val_offsets = np.concatenate(([0], np.cumsum(lengths)))
                    row_starts = E.chunk_row_starts(lengths, opts.max_chunk_values)
                    doc_ids = batch.column("doc_id")
                    if isinstance(doc_ids, pa.ChunkedArray):
                        doc_ids = doc_ids.combine_chunks()
                    rows, bounds = [], []
                    for a, b in zip(row_starts[:-1], row_starts[1:]):
                        if a == b:
                            continue
                        rows.append(
                            E._encode_chunk(
                                doc_ids.slice(a, b - a),
                                lengths[a:b],
                                values[val_offsets[a] : val_offsets[b]],
                                opts,
                                part_id,
                                seq,
                                bucket,
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


def decode_stats_direct(
    spark: SparkSession,
    blocks_path: str,
    verify_checksum: bool = True,
    n_tasks: int | None = None,
) -> DataFrame:
    """Decode every block but emit only per-task stats (n_rows, n_values,
    pmod token checksum) — measures pure decode throughput without shipping
    the decoded arrays back to the JVM. The checksum still proves the decode
    actually ran over every value. ``n_tasks`` coalesces small block files
    per task (fan-in: fixed Arrow/scheduling overhead per file otherwise
    caps decode scaling) — or, when files are FEWER than tasks, splits them
    into row ranges (:func:`block_task_dataframe`), so decode parallelism
    never depends on the encode side's file count."""
    from ..engine import decode as D

    files = list_parquet_files(blocks_path)
    tasks = block_task_dataframe(spark, files, n_tasks)
    MOD = 1_000_000_007

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for tb in batches:
            for _tid, items in _iter_task_files(tb):
                n_rows = n_values = cks = 0
                for path, lo, hi in items:
                    cols = ["lengths_blob", "payload", "checksum"]
                    for batch in _read_block_batches(path, cols, lo, hi):
                        payloads = batch.column("payload")
                        lb = batch.column("lengths_blob")
                        ck = batch.column("checksum")
                        for i in range(batch.num_rows):
                            lengths, values = D.decode_block_row(
                                memoryview(payloads[i].as_buffer()),
                                memoryview(lb[i].as_buffer()),
                                ck[i].as_py() if verify_checksum else None,
                            )
                            n_rows += int(lengths.size)
                            n_values += int(values.size)
                            # int64-accumulator sum, no astype copy (saves
                            # 8 B/token of traffic on the pure-decode path)
                            cks = (cks + int(values.sum(dtype=np.int64) % MOD)) % MOD
                yield pa.RecordBatch.from_pydict(
                    {
                        "n_rows": [n_rows],
                        "n_values": [n_values],
                        "tok_cks": [cks],
                    },
                    schema=pa.schema(
                        [("n_rows", pa.int64()), ("n_values", pa.int64()),
                         ("tok_cks", pa.int64())]
                    ),
                )

    return tasks.mapInArrow(fn, "n_rows long, n_values long, tok_cks long")


def decode_to_parquet_direct(
    spark: SparkSession,
    blocks_path: str,
    out_path: str,
    verify_checksum: bool = True,
    n_tasks: int | None = None,
    doc_range: tuple[str, str] | None = None,
) -> int:
    """Decode a blocks dataset straight to a tokens parquet dataset — the
    sink-side twin of :func:`encode_parquet_direct`: each task decodes its
    block-file group and writes one tokens file with pyarrow (deterministic
    name, atomic rename, ``_SUCCESS`` marker), so the decoded arrays never
    cross the JVM row boundary. Returns rows written.

    ``doc_range=(lo, hi)`` makes this the worker-side-sink twin of the
    Catalyst selective path (:func:`blocks_scan` + ``decode_doc_range``):
    fragments prune from the task plan via the manifest zone maps, chunks
    whose ``[min_doc_id, max_doc_id]`` envelope misses the range skip
    without touching their payload, and boundary chunks row-trim after
    decode."""
    import numpy as np

    from ..engine import decode as D

    files = list_parquet_files(blocks_path)
    if not files:
        raise ValueError(f"no parquet files under {blocks_path}")
    lo = hi = None
    if doc_range is not None:
        lo, hi = doc_range
        files = prune_files_by_doc_range(files, lo, hi)
        if not files:
            os.makedirs(out_path, exist_ok=True)
            write_file_manifest(out_path, {})
            with open(os.path.join(out_path, "_SUCCESS"), "w"):
                pass
            return 0
    os.makedirs(out_path, exist_ok=True)
    tasks = file_task_dataframe(spark, files, n_tasks)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tb in batches:
            task_ids = tb.column("task_id").to_pylist()
            for task_id, paths in zip(task_ids, tb.column("paths").to_pylist()):
                parts = []
                for path in paths:
                    pf = pq.ParquetFile(path)
                    cols = ["doc_ids", "lengths_blob", "payload", "checksum"]
                    if lo is not None:
                        cols += ["min_doc_id", "max_doc_id"]
                    for batch in pf.iter_batches(batch_size=64, columns=cols):
                        payloads = batch.column("payload")
                        lb = batch.column("lengths_blob")
                        cks = batch.column("checksum")
                        dids = batch.column("doc_ids")
                        zmin = (batch.column("min_doc_id")
                                if lo is not None else None)
                        zmax = (batch.column("max_doc_id")
                                if lo is not None else None)
                        for i in range(batch.num_rows):
                            if lo is not None:
                                zlo, zhi = zmin[i].as_py(), zmax[i].as_py()
                                # null zone map (empty-doc_ids chunk or
                                # pre-zonemap writer) -> conservative keep
                                if (zlo is not None and zhi is not None
                                        and (zhi < lo or zlo >= hi)):
                                    continue  # zone map: payload untouched
                            lengths, values = D.decode_block_row(
                                memoryview(payloads[i].as_buffer()),
                                memoryview(lb[i].as_buffer()),
                                cks[i].as_py() if verify_checksum else None,
                            )
                            offsets = np.zeros(lengths.size + 1, dtype=np.int64)
                            np.cumsum(lengths, out=offsets[1:])
                            tokens = pa.LargeListArray.from_arrays(
                                pa.array(offsets, pa.int64()),
                                pa.array(values, pa.int32()),
                            ).cast(pa.list_(pa.int32()))
                            out_batch = pa.RecordBatch.from_arrays(
                                [
                                    dids[i].values,
                                    tokens,
                                    pa.array(
                                        lengths.astype(np.int32), pa.int32()
                                    ),
                                ],
                                schema=D._OUT_ARROW_SCHEMA,
                            )
                            if lo is not None:
                                ids = np.asarray(
                                    dids[i].values.to_pylist(), object
                                )
                                sel = np.flatnonzero(
                                    (ids >= lo) & (ids < hi)
                                )
                                if sel.size == 0:
                                    continue
                                if sel.size < out_batch.num_rows:
                                    out_batch = out_batch.take(
                                        pa.array(sel.astype(np.int64))
                                    )
                            parts.append(out_batch)
                n_rows = sum(p.num_rows for p in parts)
                if parts:
                    table = pa.Table.from_batches(parts, D._OUT_ARROW_SCHEMA)
                    final = os.path.join(
                        out_path, f"part-{task_id:05d}.parquet"
                    )
                    write_parquet_atomic(table, final)
                yield pa.RecordBatch.from_pydict(
                    {"task_id": [task_id], "n_rows": [n_rows]},
                    schema=pa.schema(
                        [("task_id", pa.int32()), ("n_rows", pa.int64())]
                    ),
                )

    written = tasks.mapInArrow(fn, "task_id int, n_rows long").collect()
    write_file_manifest(
        out_path,
        {
            f"part-{r.task_id:05d}.parquet": int(r.n_rows)
            for r in written
            if r.n_rows
        },
    )
    with open(os.path.join(out_path, "_SUCCESS"), "w"):
        pass
    return sum(r.n_rows for r in written)


_CKS_SCHEMA = "doc_id string, n_tok long, tok_cks long, tok_wcks long"
_CKS_ARROW = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_tok", pa.int64()),
        ("tok_cks", pa.int64()),
        ("tok_wcks", pa.int64()),
    ]
)


def _doc_cks_batch(doc_ids: pa.Array, lengths, values) -> pa.RecordBatch:
    """Per-doc order-sensitive checksums (same formulas as
    ``corpus.doc_checksums``: sum(tok) % MOD, sum((j+1)*tok) % MOD)."""
    import numpy as np

    from .. import corpus as C

    lengths = np.asarray(lengths, dtype=np.int64)
    cks = C.doc_checksums(
        np.zeros(lengths.size, np.int64), lengths, values, minmax=False
    )
    return pa.RecordBatch.from_arrays(
        [
            doc_ids,
            pa.array(lengths, pa.int64()),
            pa.array(cks["tok_cks"], pa.int64()),
            pa.array(cks["tok_wcks"], pa.int64()),
        ],
        schema=_CKS_ARROW,
    )


def doc_checksums_direct(
    spark: SparkSession,
    tokens_path: str,
    n_tasks: int | None = None,
    batch_rows: int = 4096,
) -> DataFrame:
    """Worker-side columnar scan of a tokens parquet dataset -> per-doc
    checksum rows. The arrays never reach the JVM — only (doc_id, n_tok,
    cks, wcks) metadata rows do, which makes the round-trip verify a
    metadata join instead of a full-array exchange."""
    from ..engine import encode as E

    files = list_parquet_files(tokens_path)
    if not files:
        raise ValueError(f"no parquet files under {tokens_path}")
    tasks = file_task_dataframe(spark, files, n_tasks)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tb in batches:
            for path in (
                p for ps in tb.column("paths").to_pylist() for p in ps
            ):
                pf = pq.ParquetFile(path)
                for batch in pf.iter_batches(
                    batch_size=batch_rows, columns=["doc_id", "tokens"]
                ):
                    if batch.num_rows == 0:
                        continue
                    lengths, values = E._flatten_tokens(batch)
                    doc_ids = batch.column("doc_id")
                    if isinstance(doc_ids, pa.ChunkedArray):
                        doc_ids = doc_ids.combine_chunks()
                    yield _doc_cks_batch(doc_ids, lengths, values)

    return tasks.mapInArrow(fn, _CKS_SCHEMA)


def decoded_doc_checksums_direct(
    spark: SparkSession,
    blocks_path: str,
    verify_checksum: bool = True,
    n_tasks: int | None = None,
) -> DataFrame:
    """Decode every block worker-side and emit per-doc checksum rows (same
    schema as :func:`doc_checksums_direct`) — the decoded arrays stay in the
    worker; only checksum metadata crosses to the JVM. Files split into row
    ranges when fewer than ``n_tasks`` (:func:`block_task_dataframe`)."""
    from ..engine import decode as D

    files = list_parquet_files(blocks_path)
    if not files:
        raise ValueError(f"no parquet files under {blocks_path}")
    tasks = block_task_dataframe(spark, files, n_tasks)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tb in batches:
            for _tid, items in _iter_task_files(tb):
                for path, lo, hi in items:
                    cols = ["doc_ids", "lengths_blob", "payload", "checksum"]
                    for batch in _read_block_batches(path, cols, lo, hi):
                        payloads = batch.column("payload")
                        lb = batch.column("lengths_blob")
                        cks_col = batch.column("checksum")
                        dids = batch.column("doc_ids")
                        for i in range(batch.num_rows):
                            lengths, values = D.decode_block_row(
                                memoryview(payloads[i].as_buffer()),
                                memoryview(lb[i].as_buffer()),
                                cks_col[i].as_py() if verify_checksum else None,
                            )
                            yield _doc_cks_batch(
                                dids[i].values, lengths, values
                            )

    return tasks.mapInArrow(fn, _CKS_SCHEMA)


def decode_blocks_direct(
    spark: SparkSession,
    blocks_path: str,
    verify_checksum: bool = True,
    n_tasks: int | None = None,
    flush_values: int = 1 << 22,
) -> DataFrame:
    """Worker-side columnar scan of a blocks parquet dataset -> tokens DF.

    Decoded blocks are coalesced into ~``flush_values``-token output
    RecordBatches (fan-in): emitting one Arrow batch per block makes small
    blocks pay a fixed per-batch transfer cost that caps decode scaling.
    Files split into row ranges when fewer than ``n_tasks``
    (:func:`block_task_dataframe`).
    """
    from ..engine import decode as D

    files = list_parquet_files(blocks_path)
    if not files:
        raise ValueError(f"no parquet files under {blocks_path}")
    tasks = block_task_dataframe(spark, files, n_tasks)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        acc_docs: list[pa.Array] = []
        acc_lengths: list[np.ndarray] = []
        acc_values: list[np.ndarray] = []
        acc_nvals = 0

        def flush() -> Iterator[pa.RecordBatch]:
            nonlocal acc_docs, acc_lengths, acc_values, acc_nvals
            if not acc_docs:
                return
            lengths = np.concatenate(acc_lengths)
            values = (
                np.concatenate(acc_values) if acc_values
                else np.zeros(0, dtype=np.int32)
            )
            offsets = np.zeros(lengths.size + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            tokens = pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), pa.array(values, pa.int32())
            ).cast(pa.list_(pa.int32()))
            out = pa.RecordBatch.from_arrays(
                [
                    pa.concat_arrays(acc_docs),
                    tokens,
                    pa.array(lengths.astype(np.int32), pa.int32()),
                ],
                schema=D._OUT_ARROW_SCHEMA,
            )
            acc_docs, acc_lengths, acc_values, acc_nvals = [], [], [], 0
            yield out

        for tb in batches:
            for _tid, items in _iter_task_files(tb):
                for path, lo, hi in items:
                    cols = ["doc_ids", "lengths_blob", "payload", "checksum"]
                    for batch in _read_block_batches(path, cols, lo, hi):
                        payloads = batch.column("payload")
                        lb = batch.column("lengths_blob")
                        cks = batch.column("checksum")
                        dids = batch.column("doc_ids")
                        for i in range(batch.num_rows):
                            lengths, values = D.decode_block_row(
                                memoryview(payloads[i].as_buffer()),
                                memoryview(lb[i].as_buffer()),
                                cks[i].as_py() if verify_checksum else None,
                            )
                            acc_docs.append(dids[i].values)
                            acc_lengths.append(lengths)
                            acc_values.append(values)
                            acc_nvals += int(values.size)
                            if acc_nvals >= flush_values:
                                yield from flush()
        yield from flush()

    return tasks.mapInArrow(fn, D.TOKENS_OUT_SPARK_SCHEMA)
