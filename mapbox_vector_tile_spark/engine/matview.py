"""Incremental materialized-view maintenance over snapshot commits.

The continuous-aggregate story: a per-source rollup (doc counts, token
sums, additive checksums) kept CURRENT against the snapshot table without
ever recomputing from the full corpus. Each refresh reads only the CDC
window since the view's last snapshot (:func:`.snapshots.
incremental_changes` — scan cost proportional to the delta):

- inserted docs fold in as an ADDED partial aggregate;
- deleted docs fold in as a SUBTRACTED partial, computed by point-lookup
  decode of exactly those ids at the view's OLD snapshot (equality-delete
  commits are metadata-sized by contract, so the retraction set is
  bounded; the decode prunes by zone maps, never a table scan);
- counts/sums subtract exactly, checksums subtract mod M (they are sums
  mod M, so retraction is ``pmod(a - b, M)``).

A rewrite commit in the window is not change-shaped — the refresh
detects it (incremental_changes raises) and falls back to a full
recompute, recording ``mode='full'`` so the fallback is visible.

Durability discipline is the same as the streaming sinks: immutable
uuid-suffixed version dirs, `_mv_state.json` swapped with ``os.replace``
— readers only ever see a fully written version, a crashed refresh
leaves an unreferenced directory.

This is the Iceberg/Materialize "incrementally maintained aggregate"
analog; the reference's running per-tile stats accounting
(/root/reference/mapbox_vector_tile/optimise.py:20-57) is the single-node
version of the same fold.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus import MOD
from .decode import decode_doc_ids_df
from .snapshots import (
    current_snapshot_id,
    decode_at,
    incremental_changes,
    read_blocks_at,
)
from .verify import with_doc_checksums

def _source_expr():
    from ..corpus import SOURCES
    from .verify import doc_num_expr

    d = doc_num_expr()
    expr = F.lit(SOURCES[-1])
    for i in range(len(SOURCES) - 2, -1, -1):
        expr = F.when((d * 131071) % len(SOURCES) == i, SOURCES[i]).otherwise(
            expr
        )
    return expr


def _partial(decoded: DataFrame) -> DataFrame:
    """Per-source additive measures of a set of decoded docs."""
    return (
        with_doc_checksums(decoded)
        .select(
            _source_expr().alias("source"),
            F.col("n_tok").cast("long").alias("n_tok"),
            "tok_cks",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").alias("sum_tok"),
            F.pmod(F.sum("tok_cks"), F.lit(MOD)).cast("long").alias("cks"),
        )
    )


def _state_path(mv_dir: str) -> str:
    return os.path.join(mv_dir, "_mv_state.json")


def mv_state(mv_dir: str) -> dict | None:
    p = _state_path(mv_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_mv(spark: SparkSession, mv_dir: str) -> DataFrame:
    st = mv_state(mv_dir)
    if st is None:
        raise FileNotFoundError(f"no materialized view in {mv_dir}")
    return spark.read.parquet(os.path.join(mv_dir, st["dir"]))


def _publish(mv: DataFrame, mv_dir: str, sid: int, mode: str) -> None:
    os.makedirs(mv_dir, exist_ok=True)
    vname = f"v{sid}-{uuid.uuid4().hex[:8]}"
    mv.coalesce(1).write.parquet(os.path.join(mv_dir, vname))
    tmp = _state_path(mv_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": sid, "dir": vname, "mode": mode}, f)
    os.replace(tmp, _state_path(mv_dir))


def refresh_source_rollup_mv(
    spark: SparkSession, root: str, mv_dir: str
) -> dict:
    """Bring the per-source rollup view up to the table's current snapshot.
    Returns ``{"snapshot_id", "mode"}`` with mode one of
    ``full`` / ``incremental`` / ``noop``."""
    sid = current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no snapshots in {root}")
    st = mv_state(mv_dir)
    if st is not None and st["snapshot_id"] == sid:
        return {"snapshot_id": sid, "mode": "noop"}
    if st is None:
        _publish(_partial(decode_at(spark, root, sid)), mv_dir, sid, "full")
        return {"snapshot_id": sid, "mode": "full"}
    try:
        inserted, deleted_ids = incremental_changes(
            spark, root, st["snapshot_id"], sid
        )
    except ValueError:
        # rewrite in the window: change-shaped delta does not exist
        _publish(_partial(decode_at(spark, root, sid)), mv_dir, sid, "full")
        return {"snapshot_id": sid, "mode": "full"}
    old = read_mv(spark, mv_dir).select(
        "source",
        F.col("n_docs").alias("a_docs"),
        F.col("sum_tok").alias("a_tok"),
        F.col("cks").alias("a_cks"),
    )
    add = _partial(inserted).select(
        "source",
        F.col("n_docs").alias("i_docs"),
        F.col("sum_tok").alias("i_tok"),
        F.col("cks").alias("i_cks"),
    )
    # delete retraction stays distributed: the CDC delete-id set joins
    # into the old blocks table (decode_doc_ids_df), so a delete wave of
    # any size — GDPR purge, domain takedown — never routes doc ids
    # through the driver as plan literals
    if not deleted_ids.isEmpty():
        old_blocks = read_blocks_at(spark, root, st["snapshot_id"])
        sub = _partial(decode_doc_ids_df(old_blocks, deleted_ids)).select(
            "source",
            F.col("n_docs").alias("d_docs"),
            F.col("sum_tok").alias("d_tok"),
            F.col("cks").alias("d_cks"),
        )
    else:
        sub = add.sparkSession.createDataFrame(
            [], "source string, d_docs long, d_tok long, d_cks long"
        )
    z = F.lit(0).cast("long")
    folded = (
        old.join(add, "source", "full")
        .join(sub, "source", "full")
        .select(
            "source",
            (
                F.coalesce("a_docs", z)
                + F.coalesce("i_docs", z)
                - F.coalesce("d_docs", z)
            ).alias("n_docs"),
            (
                F.coalesce("a_tok", z)
                + F.coalesce("i_tok", z)
                - F.coalesce("d_tok", z)
            ).alias("sum_tok"),
            F.pmod(
                F.coalesce("a_cks", z)
                + F.coalesce("i_cks", z)
                - F.coalesce("d_cks", z),
                F.lit(MOD),
            )
            .cast("long")
            .alias("cks"),
        )
        .filter(F.col("n_docs") > 0)
    )
    _publish(folded, mv_dir, sid, "incremental")
    return {"snapshot_id": sid, "mode": "incremental"}


def source_rollup_mv_sql(delete_mod: int = 17, delete_rem: int = 3) -> str:
    """Oracle for the gated MV query: the per-source rollup over the
    surviving doc set, straight from the generator formula."""
    from ..corpus import params_cte_sql, source_case_sql, tokens_cte_sql

    return f"""
WITH{params_cte_sql('documents')},{tokens_cte_sql()},
per_doc AS (
  SELECT t.doc_id, MIN(t.n_tok) AS n_tok,
         ((COALESCE(SUM(tok), 0) % {MOD}) + {MOD}) % {MOD} AS tok_cks
  FROM t GROUP BY t.doc_id),
kept AS (
  SELECT * FROM per_doc WHERE doc_id % {delete_mod} != {delete_rem})
SELECT {source_case_sql('doc_id')} AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(((SUM(tok_cks) % {MOD}) + {MOD}) % {MOD} AS BIGINT) AS cks
FROM kept GROUP BY 1 ORDER BY source
"""
