"""Snapshot commits + time travel for the blocks table.

The Iceberg metadata-layer analog over the engine's direct parquet layout:
every mutation (append of freshly encoded blocks, an equality-delete
sidecar, a compaction rewrite) is a COMMIT that writes an immutable
snapshot manifest and atomically swaps a current-pointer file — data files
themselves are append-only and never edited, so any historical snapshot
remains readable forever (time travel) until explicitly expired.

Layout under the table root::

    data/s<id>/*.parquet      blocks fragments added by commit <id>
    deletes/s<id>/*.parquet   equality-delete sidecars added by commit <id>
    snapshots/v<id>.json      {snapshot_id, parent_id, operation,
                               data_files: [...], delete_files: [...]}
    _current                  text file: id of the live snapshot

Commit = write ``v<id>.json`` (exclusive-create, so two racing writers
cannot both claim an id — the loser gets a conflict error, Iceberg's
optimistic-concurrency contract) then ``os.replace`` the ``_current``
pointer (atomic on POSIX, the metadata-pointer swap). Readers resolve a
snapshot id to explicit file lists and hand Spark exactly those paths —
no directory listing races with concurrent writers, and a 100 TB reader
plans from manifest metadata alone.

Reference parity: the reference has no table layer (it returns one encoded
tile per call), but its round-trip contract is per-tile immutability —
this module is where that contract lives once tiles become a mutable-by-
commit table. Deletes compose with :mod:`.deletes` (merge-on-read);
``expire_snapshots`` + ``orphan_files`` are the `expire_snapshots` /
`remove_orphan_files` maintenance analogs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .decode import decode_dataframe
from .deletes import decode_with_deletes


def _snap_path(root: str, sid: int) -> str:
    return os.path.join(root, "snapshots", f"v{sid}.json")


def current_snapshot_id(root: str) -> int | None:
    """Id of the live snapshot, or ``None`` for an empty table."""
    try:
        with open(os.path.join(root, "_current")) as fh:
            return int(fh.read().strip())
    except OSError:
        return None


def read_snapshot(root: str, sid: int) -> dict:
    with open(_snap_path(root, sid)) as fh:
        return json.load(fh)


def snapshot_log(root: str) -> list[dict]:
    """All snapshots, oldest first — the table-history surface."""
    d = os.path.join(root, "snapshots")
    if not os.path.isdir(d):
        return []
    sids = sorted(
        int(f[1:-5]) for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )
    return [read_snapshot(root, s) for s in sids]


def _commit(root: str, operation: str, new_data: list[str],
            new_deletes: list[str], replace: bool = False,
            meta: dict | None = None) -> int:
    parent = current_snapshot_id(root)
    base = read_snapshot(root, parent) if parent is not None and not replace else {
        "data_files": [], "delete_files": [],
    }
    sid = (parent or 0) + 1
    snap = {
        "snapshot_id": sid,
        "parent_id": parent,
        "operation": operation,
        "data_files": base["data_files"] + new_data,
        "delete_files": base["delete_files"] + new_deletes,
        **(meta or {}),
    }
    os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
    # exclusive create: a concurrent committer racing to the same id loses
    # here with FileExistsError instead of silently clobbering history
    with open(_snap_path(root, sid), "x") as fh:
        json.dump(snap, fh)
    tmp = os.path.join(root, f"_current.{sid}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(sid))
    os.replace(tmp, os.path.join(root, "_current"))
    return sid


def _rel_parquet_files(root: str, subdir: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(os.path.join(root, subdir)):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(
                    os.path.relpath(os.path.join(dirpath, f), root)
                )
    return sorted(out)


def commit_append(
    root: str, blocks_df: DataFrame, meta: dict | None = None
) -> int:
    """Append freshly encoded blocks as a new snapshot; returns its id.

    ``meta`` lands verbatim in the snapshot manifest (e.g. a streaming
    sink's ``batch_id`` for exactly-once replay detection). ``meta`` may
    carry ``"_subdir"`` to override the data directory name — a retried
    writer must use a FRESH directory per attempt so a partial write from
    a crashed attempt (unreferenced by any manifest — invisible to readers,
    reaped by :func:`orphan_files`) can never collide with the retry."""
    meta = dict(meta or {})
    subdir = meta.pop("_subdir", None) or f"s{(current_snapshot_id(root) or 0) + 1}"
    out_dir = os.path.join(root, "data", subdir)
    blocks_df.write.mode("error").parquet(out_dir)
    return _commit(
        root, "append", _rel_parquet_files(root, f"data/{subdir}"), [], meta=meta
    )


def commit_deletes(root: str, deletes_df: DataFrame) -> int:
    """Commit an equality-delete sidecar (merge-on-read, no data rewrite)."""
    sid = (current_snapshot_id(root) or 0) + 1
    out_dir = os.path.join(root, "deletes", f"s{sid}")
    deletes_df.select("doc_id").distinct().write.mode("error").parquet(out_dir)
    return _commit(
        root, "delete", [], _rel_parquet_files(root, f"deletes/s{sid}")
    )


def commit_rewrite(root: str, blocks_df: DataFrame) -> int:
    """Commit a full rewrite (e.g. :func:`..compact.compact_blocks` output,
    or deletes applied for real): the new snapshot references ONLY the
    rewritten files and drops all delete sidecars — the rewrite_data_files
    commit shape. Prior snapshots keep reading the old files until expired."""
    sid = (current_snapshot_id(root) or 0) + 1
    out_dir = os.path.join(root, "data", f"s{sid}")
    blocks_df.write.mode("error").parquet(out_dir)
    return _commit(
        root, "rewrite", _rel_parquet_files(root, f"data/s{sid}"), [],
        replace=True,
    )


def read_blocks_at(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """Blocks DataFrame of exactly one snapshot's data files (time travel)."""
    sid = current_snapshot_id(root) if snapshot_id is None else snapshot_id
    if sid is None:
        raise ValueError(f"table at {root} has no snapshots")
    snap = read_snapshot(root, sid)
    if not snap["data_files"]:
        raise ValueError(f"snapshot {sid} has no data files")
    return spark.read.parquet(*(os.path.join(root, f) for f in snap["data_files"]))


def decode_at(
    spark: SparkSession, root: str, snapshot_id: int | None = None, **kw
) -> DataFrame:
    """Decode the table as of a snapshot, applying that snapshot's deletes
    merge-on-read (chunks are never rewritten by a delete commit)."""
    sid = current_snapshot_id(root) if snapshot_id is None else snapshot_id
    blocks = read_blocks_at(spark, root, sid)
    snap = read_snapshot(root, sid)
    if not snap["delete_files"]:
        return decode_dataframe(blocks, **kw)
    dels = spark.read.parquet(
        *(os.path.join(root, f) for f in snap["delete_files"])
    )
    return decode_with_deletes(blocks, dels, **kw)


def incremental_changes(
    spark: SparkSession,
    root: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
    **decode_kw,
):
    """Changes BETWEEN two snapshots: ``(inserted, deleted_ids)``.

    The Iceberg incremental-scan / CDC-read analog: ``inserted`` is the
    decode of only the data files ADDED after ``from_snapshot`` (a consumer
    that already processed ``from_snapshot`` reads new bytes only — the
    scan cost is proportional to the delta, not the table), and
    ``deleted_ids`` is the DataFrame of doc ids removed by delete commits
    in the window (empty DataFrame when none). Rewrite commits replace the
    file set wholesale; incremental reads across one raise instead of
    silently re-emitting the whole table as inserts.
    """
    to_snapshot = current_snapshot_id(root) if to_snapshot is None else to_snapshot
    lo = read_snapshot(root, from_snapshot)
    hi = read_snapshot(root, to_snapshot)
    sids = range(from_snapshot + 1, to_snapshot + 1)
    if any(read_snapshot(root, s)["operation"] == "rewrite" for s in sids):
        raise ValueError(
            "incremental read across a rewrite commit is not change-shaped; "
            "start a fresh full read from the rewrite snapshot instead"
        )
    new_data = [f for f in hi["data_files"] if f not in set(lo["data_files"])]
    inserted = (
        decode_dataframe(
            spark.read.parquet(*(os.path.join(root, f) for f in new_data)),
            **decode_kw,
        )
        if new_data
        else spark.createDataFrame(
            [], "doc_id string, tokens array<int>, n_tok int"
        )
    )
    new_dels = [
        f for f in hi["delete_files"] if f not in set(lo["delete_files"])
    ]
    deleted_ids = (
        spark.read.parquet(*(os.path.join(root, f) for f in new_dels))
        if new_dels
        else spark.createDataFrame([], "doc_id string")
    )
    return inserted, deleted_ids


_REFS = "_refs.json"


def _read_refs(root: str) -> dict[str, dict]:
    try:
        with open(os.path.join(root, _REFS)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {}


def _write_refs(root: str, refs: dict[str, dict]) -> None:
    tmp = os.path.join(root, f"{_REFS}.tmp")
    with open(tmp, "w") as fh:
        json.dump(refs, fh)
    os.replace(tmp, os.path.join(root, _REFS))  # atomic like _current


def set_ref(
    root: str, name: str, sid: int | None = None, kind: str = "tag"
) -> int:
    """Create or move a named ref (Iceberg branch/tag analog).

    A ``tag`` is an immutable name for a snapshot (release pinning: "the
    corpus train run 7 used"); a ``branch`` is a movable head. Both are
    stored in one atomically swapped ``_refs.json``, so readers never see
    a torn ref table. Retagging an existing tag to a DIFFERENT snapshot
    raises — tags are write-once by contract; branches move freely.
    Returns the snapshot id the ref points at (default: current).
    """
    if kind not in ("tag", "branch"):
        raise ValueError(f"kind must be 'tag' or 'branch', got {kind!r}")
    if sid is None:
        sid = current_snapshot_id(root)
    if sid is None:
        raise ValueError("cannot ref an empty table")
    read_snapshot(root, sid)  # fail fast on dangling target
    refs = _read_refs(root)
    old = refs.get(name)
    if old is not None:
        if old["kind"] == "tag" and (
            kind != "tag" or old["snapshot_id"] != sid
        ):
            raise ValueError(f"tag {name!r} already pins snapshot "
                             f"{old['snapshot_id']} (tags are write-once)")
    refs[name] = {"kind": kind, "snapshot_id": int(sid)}
    _write_refs(root, refs)
    return int(sid)


def resolve_ref(root: str, name: str) -> int:
    """Snapshot id a ref points at; raises on unknown names and on refs
    whose snapshot has been expired (a dangling ref is an error, not an
    empty table)."""
    refs = _read_refs(root)
    if name not in refs:
        raise KeyError(f"unknown ref {name!r}")
    sid = int(refs[name]["snapshot_id"])
    read_snapshot(root, sid)
    return sid


def drop_ref(root: str, name: str) -> None:
    """Remove a ref (tags included — dropping is how a tag is retired)."""
    refs = _read_refs(root)
    if name not in refs:
        raise KeyError(f"unknown ref {name!r}")
    del refs[name]
    _write_refs(root, refs)


def list_refs(root: str) -> dict[str, dict]:
    """Name -> ``{kind, snapshot_id}`` mapping (copy)."""
    return dict(_read_refs(root))


def decode_at_ref(spark: SparkSession, root: str, name: str, **kw):
    """Time travel by name: :func:`decode_at` of the ref's snapshot."""
    return decode_at(spark, root, resolve_ref(root, name), **kw)


def expire_snapshots(root: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshot manifests; returns the
    expired ids. Data files stay until :func:`orphan_files` cleanup."""
    log = snapshot_log(root)
    expired = [s["snapshot_id"] for s in log[:-keep_last]] if keep_last else [
        s["snapshot_id"] for s in log
    ]
    cur = current_snapshot_id(root)
    pinned = {
        r["snapshot_id"]: name for name, r in _read_refs(root).items()
    }
    for sid in expired:
        if sid == cur:
            raise ValueError("refusing to expire the current snapshot")
        if sid in pinned:
            raise ValueError(
                f"refusing to expire snapshot {sid}: pinned by ref "
                f"{pinned[sid]!r} (drop the ref first)"
            )
        os.remove(_snap_path(root, sid))
    return expired


def orphan_files(root: str) -> list[str]:
    """Data/delete files referenced by NO live snapshot (safe to delete
    after :func:`expire_snapshots`) — the remove_orphan_files analog.
    Returns table-relative paths; caller decides when to unlink."""
    live: set[str] = set()
    for s in snapshot_log(root):
        live.update(s["data_files"])
        live.update(s["delete_files"])
    return [
        f
        for sub in ("data", "deletes")
        if os.path.isdir(os.path.join(root, sub))
        for f in _rel_parquet_files(root, sub)
        if f not in live
    ]
