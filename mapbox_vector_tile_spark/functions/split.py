"""Deterministic corpus splits: train/val/test by hashed doc identity.

A training pipeline's split must be a *pure function of the document id* —
stable across reruns, cluster sizes, and row order, never a
`randomSplit` (which is seed- and partitioning-dependent). The assignment
here is the classic multiplicative hash on the numeric doc id
(Knuth's 2654435761, the same constant the corpus generator uses for its
closed-form streams) reduced mod a per-mille space, so any SQL engine can
reproduce the exact membership — the property the DuckDB oracle checks.

Pure Catalyst: one projection, no shuffle, no Python. Buckets are
half-open per-mille ranges; unassigned mass falls through to the last
named split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..engine.verify import doc_num_expr

_HASH_MULT = 2654435761  # Knuth multiplicative hash constant (public)
_SPACE = 1000  # per-mille assignment space


def split_expr(splits: dict[str, int], doc_id_col: str = "doc_id") -> Column:
    """``splits`` maps name -> per-mille share (must sum to 1000).

    Returns a string column assigning each doc to a split. Shares are
    consumed in insertion order as half-open ranges of
    ``(doc_num * 2654435761) mod 1000``."""
    if sum(splits.values()) != _SPACE:
        raise ValueError(
            f"split shares must sum to {_SPACE}, got {sum(splits.values())}"
        )
    h = (doc_num_expr(doc_id_col) * F.lit(_HASH_MULT)) % F.lit(_SPACE)
    return _assign(splits, h)


def split_expr_from_num(splits: dict[str, int], num: Column) -> Column:
    """:func:`split_expr` over an already-numeric doc-id column (e.g.
    the ``documents`` table's BIGINT ``doc_id``)."""
    if sum(splits.values()) != _SPACE:
        raise ValueError(
            f"split shares must sum to {_SPACE}, got {sum(splits.values())}"
        )
    return _assign(splits, (num * F.lit(_HASH_MULT)) % F.lit(_SPACE))


def _assign(splits: dict[str, int], h: Column) -> Column:
    names = list(splits)
    expr = F.lit(names[-1])
    edge = 0
    conds = []
    for name, share in splits.items():
        edge += share
        conds.append((name, edge))
    for name, upper in reversed(conds[:-1]):
        expr = F.when(h < upper, F.lit(name)).otherwise(expr)
    return expr


def split_sql(splits: dict[str, int], doc_expr: str = "doc_id") -> str:
    """The DuckDB-executable mirror of :func:`split_expr` over a numeric
    doc-id expression."""
    if sum(splits.values()) != _SPACE:
        raise ValueError("split shares must sum to 1000")
    h = f"(({doc_expr}) * {_HASH_MULT}) % {_SPACE}"
    names = list(splits)
    cases = []
    edge = 0
    for name in names[:-1]:
        edge += splits[name]
        cases.append(f"WHEN {h} < {edge} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def with_split(
    df: DataFrame, splits: dict[str, int], doc_id_col: str = "doc_id"
) -> DataFrame:
    """Attach the deterministic ``split`` column."""
    return df.withColumn("split", split_expr(splits, doc_id_col))
