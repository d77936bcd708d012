"""Length-grouped batch assembly: deterministic padding-minimizing batches.

A training pipeline that pads every batch to its longest sequence wastes
``batch_size * max_len - sum_len`` tokens per batch; sorting the corpus by
length before chunking into batches is the standard fix (bucketed batching).
Done naively that is one global sort + a driver loop. Here the assignment is
a pure function of ``(n_tok, doc identity, epoch)``:

- docs order by ``(n_tok, epoch_key, doc_id)`` — equal-length docs are mixed
  by the same XOR-salted multiplicative hash as the epoch shuffle
  (:mod:`.shuffle`), so consecutive epochs get different same-length
  groupings while the permutation stays reproducible at any parallelism;
- global positions come from the two-level distributed rank (per-(length,
  key-sub-range) local windows + a tiny offset aggregate — no
  single-partition window ever sees the data; the sub-range split keeps one
  popular length from becoming a straggler partition);
- ``batch_id = pos // batch_size``; the per-batch rollup (docs, max/sum
  length, padding waste) is a plain hash aggregate.

Everything is exact integers over two tiny columns (``doc_id``, ``n_tok``) —
the token arrays are never touched — so any SQL engine reproduces the
assignment bit-for-bit (the DuckDB oracle runs :func:`length_grouped_sql`).

Analog surface: the reference orders features deterministically inside a
tile so output bytes are reproducible (/root/reference/mapbox_vector_tile/
encoder.py iterates features in input order); here the deterministic order
is the product, optimized for padding instead of bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .shuffle import _EPOCH_SALT, _KEY_SPACE, _MIX_SPACE, _SHUF_MULT, epoch_key_expr


def length_grouped_batches(
    df: DataFrame,
    batch_size: int,
    epoch: int = 0,
    doc_id_col: str = "doc_id",
    n_sub: int = 64,
) -> DataFrame:
    """Per-doc batch assignment: ``(doc_id, n_tok, batch_id, slot)``.

    ``slot`` is the doc's position inside its batch (``pos % batch_size``).
    ``n_sub`` sub-splits each length's key range for the rank decomposition:
    local windows see ~``count(len)/n_sub`` rows even when one length
    dominates the corpus; the offset window runs over at most
    ``distinct_lengths * n_sub`` aggregate rows.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    sub_width = _KEY_SPACE // int(n_sub) + 1
    keyed = df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col("n_tok").cast("long").alias("n_tok"),
        epoch_key_expr(epoch, doc_id_col).alias("k"),
    ).withColumn("sub", F.floor(F.col("k") / F.lit(sub_width)))
    w_local = Window.partitionBy("n_tok", "sub").orderBy("k", "doc_id")
    local = keyed.withColumn("rn", F.row_number().over(w_local))
    parts = keyed.groupBy("n_tok", "sub").agg(F.count(F.lit(1)).alias("c"))
    w_off = Window.orderBy("n_tok", "sub").rowsBetween(
        Window.unboundedPreceding, -1
    )  # over the small per-(length, sub-range) aggregate only
    offsets = parts.select(
        "n_tok",
        "sub",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
    )
    pos = F.col("off") + F.col("rn") - 1
    return local.join(F.broadcast(offsets), ["n_tok", "sub"]).select(
        "doc_id",
        "n_tok",
        (pos / F.lit(batch_size)).cast("long").alias("batch_id"),
        (pos % F.lit(batch_size)).cast("long").alias("slot"),
    )


def batch_padding_rollup(assigned: DataFrame) -> DataFrame:
    """Per-batch padding accounting over :func:`length_grouped_batches`
    output: ``(batch_id, n_docs, max_len, sum_len, pad_tokens)`` where
    ``pad_tokens`` is the waste of padding every doc to the batch max."""
    return (
        assigned.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("max_len"),
            F.sum("n_tok").alias("sum_len"),
        )
        .select(
            "batch_id",
            "n_docs",
            "max_len",
            "sum_len",
            (F.col("n_docs") * F.col("max_len") - F.col("sum_len")).alias(
                "pad_tokens"
            ),
        )
        .orderBy("batch_id")
    )


def length_grouped_sql(
    batch_size: int, epoch: int = 0, doc_source: str = "documents"
) -> str:
    """DuckDB mirror of ``length_grouped_batches`` + ``batch_padding_rollup``
    (numeric doc ids in ``doc_source``; lengths from the generator params)."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    from ..corpus import params_cte_sql

    salt = ((int(epoch) + 1) * _EPOCH_SALT) % _KEY_SPACE
    k = (
        f"((xor(doc_id, {salt}) % {_MIX_SPACE}) * {_SHUF_MULT})"
        f" % {_KEY_SPACE}"
    )
    return f"""
WITH{params_cte_sql(doc_source)},
  keyed AS (SELECT doc_id, n_tok, {k} AS k FROM p),
  ranked AS (
    SELECT n_tok,
           (ROW_NUMBER() OVER (ORDER BY n_tok, k, doc_id) - 1)
             // {int(batch_size)} AS batch_id
    FROM keyed
  )
SELECT CAST(batch_id AS BIGINT) AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_tok) AS BIGINT) AS max_len,
       CAST(SUM(n_tok) AS BIGINT) AS sum_len,
       CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS pad_tokens
FROM ranked
GROUP BY batch_id
ORDER BY batch_id
"""
