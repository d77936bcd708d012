"""GPT-style sequence packing, MATERIALIZED: concatenate documents in key
order and emit the actual fixed-length ``array<int32>`` training rows
(documents span sequence boundaries — the standard LLM pre-training layout).

Complements :func:`..functions.components.sequence_pack_plan`, which emits
only the packing *metadata*; this operator produces the packed sequences
themselves, entirely as Catalyst expressions:

1. global token start positions via the distributed two-level prefix sum
   (per-range local window + broadcast per-range offsets — never a
   single-partition window over the data);
2. each document explodes into one row PER COVERED SEQUENCE (``<= n_tok /
   seq_len + 1`` rows) carrying ``F.slice`` of its token array — no
   token-level explode;
3. one shuffle keyed by ``seq_id`` (uniformly distributed by construction)
   reassembles fragments with ``array_sort(collect_list(struct)) ->
   flatten`` — per-group state is bounded by ``seq_len`` tokens.

At 100 TB this is the minimal data movement for repacking: every token
crosses the wire exactly once, partial aggregation needs nothing, and the
only skew risk (a single document larger than an executor) is already
bounded upstream by the corpus ``max_chunk`` discipline.

Contract style mirrors the reference's round-trip equality tests
(/root/reference/tests/test_encoder.py:20-50): the packed output is gated by
per-sequence ORDER-SENSITIVE checksums against the closed-form corpus
oracle (DuckDB recomputes every token's global position from the generator
formula, so a hash match proves both membership and in-sequence order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..corpus import MOD, params_cte_sql, tokens_cte_sql


def pack_sequences(
    tokens_df: DataFrame,
    seq_len: int = 512,
    part_width: int = 64,
    doc_num=None,
) -> DataFrame:
    """Tokens table ``(doc_id, tokens, n_tok)`` -> packed sequences
    ``(seq_id, n_filled, tokens)``.

    Documents are concatenated in ``doc_num`` order (default: the numeric
    part of the engine's ``doc-%08d`` ids; pass any monotone numeric
    expression for other tables — it doubles as the range key of the
    two-level prefix sum, so it must be roughly uniform). The final
    sequence may be partial (``n_filled < seq_len``); no padding is added —
    pad downstream with ``concat(tokens, array_repeat(pad_id, ...))`` if a
    trainer needs rectangular batches.
    """
    if doc_num is None:
        from ..engine.verify import doc_num_expr

        doc_num = doc_num_expr()
    keyed = tokens_df.select(
        doc_num.alias("dn"),
        "tokens",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.floor(doc_num / F.lit(part_width)).alias("pt"),
    )
    w_local = (
        Window.partitionBy("pt")
        .orderBy("dn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = keyed.withColumn("local_cum", F.sum("n_tok").over(w_local))
    parts = keyed.groupBy("pt").agg(F.sum("n_tok").alias("part_sum"))
    w_off = Window.orderBy("pt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = parts.select(
        "pt",
        F.coalesce(F.sum("part_sum").over(w_off), F.lit(0)).alias("offset"),
    )
    cum = (
        local.join(F.broadcast(offsets), "pt")
        .withColumn("end_pos", F.col("offset") + F.col("local_cum"))
        .withColumn("start_pos", F.col("end_pos") - F.col("n_tok"))
        .filter(F.col("n_tok") > 0)
    )
    L = F.lit(seq_len)
    contrib = cum.select(
        "tokens",
        "start_pos",
        "end_pos",
        F.explode(
            F.sequence(
                F.floor(F.col("start_pos") / L),
                F.floor((F.col("end_pos") - 1) / L),
            )
        ).alias("seq_id"),
    )
    frag_from = F.greatest(F.col("seq_id") * L, F.col("start_pos"))
    frag_to = F.least((F.col("seq_id") + 1) * L, F.col("end_pos"))
    frags = contrib.select(
        "seq_id",
        (frag_from % L).alias("frag_pos"),
        F.slice(
            "tokens",
            (frag_from - F.col("start_pos") + 1).cast("int"),
            (frag_to - frag_from).cast("int"),
        ).alias("frag"),
    )
    assembled = frags.groupBy("seq_id").agg(
        F.flatten(
            # array_sort on structs orders by the first field: frag_pos is
            # unique within a sequence, so fragments land in stream order
            F.transform(
                F.array_sort(F.collect_list(F.struct("frag_pos", "frag"))),
                lambda s: s.frag,
            )
        ).alias("tokens")
    )
    return assembled.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.size("tokens").cast("int").alias("n_filled"),
        "tokens",
    )


def packed_sequence_checksums(packed: DataFrame) -> DataFrame:
    """Per-sequence order-sensitive checksums of the MATERIALIZED arrays:
    ``seq_cks = pmod(sum(tok))``, ``seq_wcks = pmod(sum((i+1) * tok))``
    with ``i`` the position inside the packed sequence — computed from the
    assembled output (higher-order array functions, no explode), so any
    mis-ordered or mis-sliced fragment breaks the hash."""
    weighted = F.aggregate(
        F.zip_with(
            "tokens",
            F.sequence(F.lit(1), F.size("tokens")),
            lambda x, i: x.cast("long") * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    plain = F.aggregate(
        "tokens",
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    return packed.select(
        "seq_id",
        F.col("n_filled").cast("long").alias("n_filled"),
        F.pmod(plain, F.lit(MOD)).cast("long").alias("seq_cks"),
        F.pmod(weighted, F.lit(MOD)).cast("long").alias("seq_wcks"),
    ).orderBy("seq_id")


def packed_sequence_checksums_sql(
    seq_len: int = 512, doc_source: str = "documents"
) -> str:
    """DuckDB oracle: every token's global position from the closed-form
    generator (cumulative ``n_tok`` over doc order), then per-sequence
    checksums with in-sequence positions ``gpos % seq_len`` — the exact
    quantities :func:`packed_sequence_checksums` computes from the packed
    arrays."""
    return f"""
WITH{params_cte_sql(doc_source)},{tokens_cte_sql()},
  c AS (
    SELECT doc_id,
           SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok
             AS start_pos
    FROM p
  ),
  g AS (
    SELECT t.tok, c.start_pos + t.j AS gpos
    FROM t JOIN c USING (doc_id)
    WHERE t.j IS NOT NULL
  )
SELECT CAST(gpos // {seq_len} AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_filled,
       CAST(((SUM(tok) % {MOD}) + {MOD}) % {MOD} AS BIGINT) AS seq_cks,
       CAST(((SUM((gpos % {seq_len} + 1) * tok) % {MOD}) + {MOD}) % {MOD}
            AS BIGINT) AS seq_wcks
FROM g
GROUP BY 1
ORDER BY 1
"""
