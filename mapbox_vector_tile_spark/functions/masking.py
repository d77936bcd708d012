"""Deterministic span-corruption masks (T5/BERT-family pretraining).

Span corruption needs, for every document, a reproducible set of masked
token spans — the same spans on every rerun, at any parallelism, from any
row order, or the training data is not the training data. The mask
decision is a pure function of (doc identity, span index): the token
stream is cut into fixed ``span_len`` spans and span ``s`` of doc ``d``
is masked iff a multiplicative hash of ``(d mod 2^20) * P + s`` lands
under the per-mille rate — the same determinism contract as the split /
sample / shuffle family (:mod:`.split`, :mod:`.sample`, :mod:`.shuffle`),
with its own constants so masking never correlates with any of them.

One per-row Catalyst ``aggregate`` over the position sequence — zero
shuffle, zero Python (plan-asserted) — and exact integers throughout, so
the DuckDB oracle reproduces every mask decision bit-for-bit (the
position-weighted checksum of masked tokens gates WHICH tokens are
masked, not merely how many).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..corpus import MOD

_MASK_MULT = 2654435761  # Knuth multiplicative (public)
_DOC_MIX = 1_048_573  # prime > 2^20: doc slot and span index never collide
_DOC_SPACE = 2**20
_MIX_SPACE = 2**31  # clamp before multiply: fits int64 (ANSI-safe)
_SPACE = 1000


def _masked_pred_ints(dn: str, s: str, rate_permille: int) -> str:
    """SQL/Catalyst-shared predicate text over integer expressions."""
    mix = f"((({dn}) % {_DOC_SPACE}) * {_DOC_MIX} + ({s})) % {_MIX_SPACE}"
    return f"(({mix}) * {_MASK_MULT}) % {_SPACE} < {int(rate_permille)}"


def span_corruption_summary(
    df: DataFrame,
    span_len: int = 3,
    rate_permille: int = 150,
    doc_num=None,
) -> DataFrame:
    """Per-doc mask audit: ``(doc_id, n_tok, n_masked, masked_cks)``.

    ``masked_cks`` is the pmod sum of ``(j + 1) * tok`` over masked
    positions — position-and-value evidence of the exact mask. The mask
    itself is the predicate; materializing sentinel-replaced streams is a
    trivial ``transform`` over the same predicate and adds nothing the
    checksum doesn't already gate.
    """
    if span_len < 1:
        raise ValueError(f"span_len must be >= 1, got {span_len}")
    if not 0 <= rate_permille <= _SPACE:
        raise ValueError(f"rate_permille out of [0, {_SPACE}]")
    if doc_num is None:
        from ..engine.verify import doc_num_expr

        doc_num = doc_num_expr()
    toks = F.col("tokens")
    zero = F.struct(
        F.lit(0).cast("long").alias("m"), F.lit(0).cast("long").alias("c")
    )
    acc = F.aggregate(
        F.sequence(F.lit(0), F.col("n_tok") - 1),
        zero,
        lambda a, j: F.struct(
            F.when(_mask_col(span_len, rate_permille, j), a["m"] + 1)
            .otherwise(a["m"])
            .alias("m"),
            F.when(
                _mask_col(span_len, rate_permille, j),
                a["c"]
                + (j.cast("long") + 1)
                * F.element_at(toks, j + 1).cast("long"),
            )
            .otherwise(a["c"])
            .alias("c"),
        ),
    )
    out = df.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        doc_num.alias("dn"),
        F.when(F.col("n_tok") > 0, acc).otherwise(
            F.struct(
                F.lit(0).cast("long").alias("m"),
                F.lit(0).cast("long").alias("c"),
            )
        ).alias("_a"),
    )
    return out.select(
        "doc_id",
        "n_tok",
        F.col("_a.m").alias("n_masked"),
        F.pmod(F.col("_a.c"), F.lit(MOD)).cast("long").alias("masked_cks"),
    ).orderBy("doc_id")


def _mask_col(span_len: int, rate_permille: int, j):
    """Catalyst form of the mask predicate for position column ``j``
    (requires a ``dn`` column in scope)."""
    mix = (
        (F.col("dn") % _DOC_SPACE) * _DOC_MIX
        + F.floor(j / span_len).cast("long")
    ) % _MIX_SPACE
    return (mix * _MASK_MULT) % _SPACE < F.lit(int(rate_permille))


def span_corruption_sql(
    span_len: int = 3,
    rate_permille: int = 150,
    doc_source: str = "documents",
) -> str:
    """DuckDB mirror of :func:`span_corruption_summary` from the generator
    formula."""
    if span_len < 1:
        raise ValueError(f"span_len must be >= 1, got {span_len}")
    from ..corpus import params_cte_sql, tokens_cte_sql

    pred = _masked_pred_ints("doc_id", f"j // {int(span_len)}", rate_permille)
    return f"""
WITH{params_cte_sql(doc_source)},{tokens_cte_sql()}
SELECT printf('doc-%08d', doc_id) AS doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(COALESCE(SUM(CASE WHEN {pred} THEN 1 END), 0) AS BIGINT)
         AS n_masked,
       CAST(((COALESCE(SUM(CASE WHEN {pred} THEN (j + 1) * tok END), 0)
            % {MOD}) + {MOD}) % {MOD} AS BIGINT) AS masked_cks
FROM t
GROUP BY doc_id, n_tok
ORDER BY doc_id
"""
