"""Deterministic epoch shuffle: a reproducible global permutation per epoch.

A training pipeline re-orders its corpus every epoch. Doing that with
``DataFrame.orderBy(rand())`` is non-reproducible (seed and partitioning
dependent); doing it on the driver doesn't exist at 10^12 sequences. Here
the shuffle key is a pure function of (doc identity, epoch) — a
multiplicative hash with an epoch offset — so the permutation is stable
across reruns, cluster sizes, and row order, and any SQL engine can
reproduce it (the property the DuckDB oracle checks).

Positions are assigned with the same two-level distributed rank used by
``size_weighted_buckets_plan`` (components.py): the key space is cut into
fixed contiguous blocks, rows rank locally inside their block (window
PARTITIONED by block — blocks are contiguous in key order so the
decomposition is exact), and block offsets come from a tiny per-block
count aggregate. No single-partition window ever touches the data; the
one global window runs over ~n_blocks rows.

Analog surface: the reference's deterministic feature ordering inside a
tile (/root/reference/mapbox_vector_tile/encoder.py iterates features in
input order so output bytes are reproducible); here the *order itself* is
the product, re-derived per epoch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..engine.verify import doc_num_expr

_SHUF_MULT = 2654435761  # Knuth multiplicative constant (public)
_EPOCH_SALT = 2654435769  # golden-ratio constant (public), epoch mixer
_KEY_SPACE = 2**32
_MIX_SPACE = 2**31  # pre-multiply clamp: _MIX_SPACE * _SHUF_MULT < 2^63


def epoch_key_expr(epoch: int, doc_id_col: str = "doc_id") -> Column:
    """Shuffle key of a doc for one epoch — pure function of identity.

    The epoch salt is XORed into the doc number BEFORE the multiply: an
    additive (post-multiply) salt would only rotate the circular key
    order, leaving epochs with near-identical permutations; XOR flips a
    different bit pattern per epoch and the multiply spreads it."""
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    salt = ((int(epoch) + 1) * _EPOCH_SALT) % _KEY_SPACE
    mixed = doc_num_expr(doc_id_col).bitwiseXOR(F.lit(salt)) % F.lit(
        _MIX_SPACE
    )  # clamp below 2^31 so mixed * MULT stays inside int64 (ANSI mode)
    return (mixed * F.lit(_SHUF_MULT)) % F.lit(_KEY_SPACE)


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    doc_id_col: str = "doc_id",
    n_blocks: int = 1024,
) -> DataFrame:
    """Global position of every doc in the epoch's permutation:
    ``(pos, doc_id)``, ``pos`` dense in ``[0, n)``.

    Ties (two docs hashing to the same key) break on ``doc_id``, so the
    permutation is total and deterministic at any parallelism.
    ``n_blocks`` sizes the rank decomposition: per-block windows see
    ~n/n_blocks rows; the offset window sees n_blocks rows. At cluster
    scale raise it so blocks stay executor-sized.
    """
    block = _KEY_SPACE // int(n_blocks) + 1
    keyed = df.select(
        F.col(doc_id_col).alias("doc_id"),
        epoch_key_expr(epoch, doc_id_col).alias("k"),
    ).withColumn("pt", F.floor(F.col("k") / F.lit(block)))
    w_local = Window.partitionBy("pt").orderBy("k", "doc_id")
    local = keyed.withColumn("rn", F.row_number().over(w_local))
    parts = keyed.groupBy("pt").agg(F.count(F.lit(1)).alias("c"))
    w_off = Window.orderBy("pt").rowsBetween(
        Window.unboundedPreceding, -1
    )  # over the small per-block aggregate only
    offsets = parts.select(
        "pt",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
    )
    return local.join(F.broadcast(offsets), "pt").select(
        (F.col("off") + F.col("rn") - 1).cast("long").alias("pos"),
        "doc_id",
    )


def epoch_shuffle_sql(
    epoch: int, doc_source: str = "documents"
) -> str:
    """DuckDB-executable mirror of :func:`epoch_shuffle` (numeric doc ids
    in ``doc_source``, doc id emitted in the engine's ``doc-%08d`` form)."""
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    salt = ((int(epoch) + 1) * _EPOCH_SALT) % _KEY_SPACE
    k = (
        f"((xor(doc_id, {salt}) % {_MIX_SPACE}) * {_SHUF_MULT})"
        f" % {_KEY_SPACE}"
    )
    return f"""
WITH keyed AS (SELECT doc_id, {k} AS k FROM {doc_source})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS BIGINT) AS pos,
       printf('doc-%08d', doc_id) AS doc_id
FROM keyed
ORDER BY pos
"""
