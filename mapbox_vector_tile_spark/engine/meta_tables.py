"""Metadata tables: the snapshot store's own state as queryable DataFrames.

Iceberg exposes ``db.table.snapshots`` / ``.files`` / ``.refs`` so
operators can run SQL over table METADATA (find bloated snapshots, audit
retention, size compaction). Same surface here, built from the snapshot
log + file manifests without touching a single payload byte:

- :func:`table_snapshots` — one row per commit (operation, file/total
  counts, parent);
- :func:`table_files` — one row per live data file at a snapshot, with
  byte size and the owning commit (first snapshot that listed it);
- :func:`table_refs` — tags/branches and the snapshots they pin.

Everything is driver-side JSON (the log/manifests are metadata-sized by
contract) lifted into DataFrames so it joins/filters/aggregates with the
rest of the engine — e.g. ``table_files`` joined to zone-map stats picks
compaction candidates.

Reference surface: the reference tile's header/metadata is readable
without decoding geometry (/root/reference/mapbox_vector_tile/
decoder.py:146-160 lists layers before decoding one); these tables are
that property at table scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .snapshots import read_snapshot, snapshot_log

_SNAP_SCHEMA = (
    "snapshot_id long, operation string, parent_id long, "
    "n_files long, n_new_files long"
)
_FILES_SCHEMA = (
    "snapshot_id long, path string, bytes long, committed_in long"
)
_REFS_SCHEMA = "name string, kind string, snapshot_id long"


def table_snapshots(spark: SparkSession, root: str) -> DataFrame:
    rows = []
    prev_files: set[str] = set()
    prev_id = None
    for s in snapshot_log(root):
        files = set(s["data_files"])
        rows.append(
            (
                int(s["snapshot_id"]),
                s["operation"],
                prev_id,
                len(files),
                len(files - prev_files),
            )
        )
        prev_files = files
        prev_id = int(s["snapshot_id"])
    return spark.createDataFrame(rows, _SNAP_SCHEMA)


def table_files(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    log = snapshot_log(root)
    if snapshot_id is None:
        snapshot_id = int(log[-1]["snapshot_id"])
    snap = read_snapshot(root, snapshot_id)
    first_seen: dict[str, int] = {}
    for s in log:
        if int(s["snapshot_id"]) > snapshot_id:
            break
        for f in s["data_files"]:
            first_seen.setdefault(f, int(s["snapshot_id"]))
    rows = [
        (
            snapshot_id,
            f,
            os.path.getsize(os.path.join(root, f)),
            first_seen[f],
        )
        for f in snap["data_files"]
    ]
    return spark.createDataFrame(rows, _FILES_SCHEMA)


def table_refs(spark: SparkSession, root: str) -> DataFrame:
    from .snapshots import list_refs

    rows = [
        (name, r["kind"], int(r["snapshot_id"]))
        for name, r in sorted(list_refs(root).items())
    ]
    return spark.createDataFrame(rows, _REFS_SCHEMA)
