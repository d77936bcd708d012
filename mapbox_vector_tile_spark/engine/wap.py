"""Write-audit-publish (WAP): staged commits gated by an audit.

The ingestion-safety pattern (Netflix's Iceberg WAP / `git branch` for
tables): a new data batch is COMMITTED but not PUBLISHED — readers follow
the ``main`` branch ref, which still points at the audited table — then
an audit runs against the staged snapshot, and only on success does
``main`` fast-forward. A bad batch never becomes visible to consumers.

On a linear snapshot history (this table format's, like Iceberg's
main-line) rejection needs a COMPENSATING commit: the staged snapshot is
already in the ancestry, so ``wap_append`` restores the branch's file set
with a rewrite commit and leaves ``main`` where it was. Both outcomes are
explicit in the returned mode and in the table history — nothing is
silently dropped.

The default audit enforces the engine's ingest contracts: non-empty
batch, no duplicate doc ids table-wide (F4's fail-fast, here moved
before publication), and a full checksum-verified decode of the staged
snapshot (corrupt payloads reject the batch instead of failing readers
later).

Reference surface: encode-time validation gates
(/root/reference/mapbox_vector_tile/encoder.py rejects malformed
features before they reach the tile) — WAP is that gate at table scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .snapshots import (
    commit_append,
    commit_rewrite,
    current_snapshot_id,
    decode_at,
    read_blocks_at,
    resolve_ref,
    set_ref,
)

MAIN = "main"


def default_audit(spark: SparkSession, root: str, sid: int) -> tuple[bool, str]:
    """(ok, reason): duplicate-doc and checksum-decode gate at ``sid``."""
    decoded = decode_at(spark, root, sid)  # checksum-verified decode
    counts = (
        decoded.groupBy("doc_id")
        .count()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("count") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .first()
    )
    if counts.n_docs == 0:
        return False, "empty table after batch"
    if counts.n_dup:
        return False, f"{counts.n_dup} duplicate doc ids"
    return True, "ok"


def wap_append(
    spark: SparkSession,
    root: str,
    blocks_df: DataFrame,
    audit_fn=default_audit,
    branch: str = MAIN,
) -> dict:
    """Stage ``blocks_df`` as a commit, audit it, publish or roll back.

    Returns ``{"mode": "published"|"rejected", "reason", "snapshot_id"}``
    where ``snapshot_id`` is what ``branch`` points at afterwards.
    """
    try:
        base_sid = resolve_ref(root, branch)
    except (KeyError, FileNotFoundError):
        base_sid = current_snapshot_id(root)
        if base_sid is not None:
            set_ref(root, branch, base_sid, kind="branch")
    staged = commit_append(root, blocks_df)
    ok, reason = audit_fn(spark, root, staged)
    if ok:
        set_ref(root, branch, staged, kind="branch")
        return {"mode": "published", "reason": reason, "snapshot_id": staged}
    # compensate: restore the branch's file set as a new rewrite commit;
    # the bad batch stays in history (auditable) but never reaches readers
    if base_sid is None:
        raise ValueError(f"first batch failed audit ({reason}); empty table "
                         "has no state to restore — fix the batch")
    rid = commit_rewrite(root, read_blocks_at(spark, root, base_sid))
    set_ref(root, branch, rid, kind="branch")
    return {"mode": "rejected", "reason": reason, "snapshot_id": rid}


def read_main(spark: SparkSession, root: str, branch: str = MAIN):
    """What consumers see: a checksum-verified decode at the branch head."""
    return decode_at(spark, root, resolve_ref(root, branch))
