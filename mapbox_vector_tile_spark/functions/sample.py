"""Deterministic stratified sampling: per-source keep rates by hashed identity.

Corpus mixing for a training run is a *weighted subsample* — e.g. keep 30%
of crawl text but 100% of code — and, exactly like the train/val/test split
(:mod:`.split`), the membership decision must be a pure function of the
document id: stable across reruns, cluster sizes, and row order, never
``DataFrame.sample`` (seed- and partitioning-dependent). The keep decision
is a second multiplicative hash of the numeric doc id (the 32-bit
golden-ratio constant, distinct from the split hash so split and sample are
independent per-mille coordinates) compared against the per-source rate.

Pure Catalyst: one projection + filter, no shuffle, no Python. Any SQL
engine reproduces the exact membership — the property the DuckDB oracle
checks (reference parity anchor: the reference's deterministic
feature-predicate filtering, ``/root/reference/mapbox_vector_tile/encoder.py``
feature skip rules — same "drop rows by a pure row predicate" contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..engine.verify import doc_num_expr

_SAMPLE_MULT = 2654435769  # 2^32 / golden ratio (public constant)
_SPACE = 1000  # per-mille rate space


def sample_hash_expr(doc_id_col: str = "doc_id") -> Column:
    """Per-mille sampling coordinate of a doc — independent of the split
    hash (different multiplier)."""
    return (doc_num_expr(doc_id_col) * F.lit(_SAMPLE_MULT)) % F.lit(_SPACE)


def stratified_keep_expr(
    rates: dict[str, int],
    default_rate: int = _SPACE,
    source_col: str = "source",
    doc_id_col: str = "doc_id",
) -> Column:
    """Boolean keep predicate: ``hash(doc) < rate[source]``.

    ``rates`` maps source name -> per-mille keep rate (0..1000); sources
    not listed keep ``default_rate``."""
    for s, r in rates.items():
        if not 0 <= r <= _SPACE:
            raise ValueError(f"rate for {s!r} out of [0, {_SPACE}]: {r}")
    rate: Column = F.lit(default_rate)
    for s, r in rates.items():
        rate = F.when(F.col(source_col) == s, F.lit(r)).otherwise(rate)
    return sample_hash_expr(doc_id_col) < rate


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    default_rate: int = _SPACE,
    source_col: str = "source",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff its deterministic per-mille hash falls under its
    source's rate. Pure filter — pushes down to the scan like any other
    Catalyst predicate."""
    return df.filter(
        stratified_keep_expr(rates, default_rate, source_col, doc_id_col)
    )


def stratified_sample_pred_sql(
    rates: dict[str, int],
    default_rate: int = _SPACE,
    doc_expr: str = "doc_id",
) -> str:
    """DuckDB-executable mirror of :func:`stratified_keep_expr` over a
    numeric doc-id expression (source derived by the corpus formula)."""
    from .. import corpus as C

    cases = " ".join(f"WHEN '{s}' THEN {r}" for s, r in rates.items())
    rate = f"CASE {C.source_case_sql(doc_expr)} {cases} ELSE {default_rate} END"
    return f"((({doc_expr}) * {_SAMPLE_MULT}) % {_SPACE}) < ({rate})"
