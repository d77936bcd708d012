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


_UPSAMPLE_MULT = 16777619  # FNV-1a prime (public) — third independent hash


def upsample_hash_expr(doc_id_col: str = "doc_id") -> Column:
    """Per-mille upsampling coordinate — independent of both the split and
    the downsampling hashes (distinct multiplier), so mixing weights never
    correlate with split membership or subsample survival."""
    return (doc_num_expr(doc_id_col) * F.lit(_UPSAMPLE_MULT)) % F.lit(_SPACE)


def source_upsample(
    df: DataFrame,
    weights: dict[str, int],
    default_weight: int = _SPACE,
    source_col: str = "source",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fractional upsampling: repeat each doc per its source's
    per-mille weight (2500 = 2.5x: two copies always, a third iff the doc's
    hash falls under the fractional 500).

    The other half of corpus mixing (:func:`stratified_sample` cuts,
    this repeats — e.g. books x2.5, wiki x4 in most published LLM data
    recipes). ``rep`` numbers the copies 1..reps so downstream epoch
    shuffling can key on ``(doc_id, rep)`` and spread the copies apart.

    Pure Catalyst: one projection computing ``reps`` from the hash, one
    ``explode(sequence(1, reps))`` — rows fan out map-side with no shuffle
    and docs with ``reps = 0`` (weight 0 sources' unlucky draws) vanish via
    the empty-array explode, never a separate filter pass.
    """
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0: {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0: {default_weight}")
    w: Column = F.lit(default_weight)
    for s, r in weights.items():
        w = F.when(F.col(source_col) == s, F.lit(r)).otherwise(w)
    reps = (w / F.lit(_SPACE)).cast("int") + (
        upsample_hash_expr(doc_id_col) < w % F.lit(_SPACE)
    ).cast("int")
    seq = F.when(reps >= 1, F.sequence(F.lit(1), reps)).otherwise(
        F.array().cast("array<int>")
    )  # guard: sequence(1, 0) would count DOWN, not produce empty
    return df.withColumn("rep", F.explode(seq))


def source_upsample_rollup_sql(
    weights: dict[str, int],
    default_weight: int = _SPACE,
    doc_source: str = "documents",
) -> str:
    """DuckDB mirror of :func:`source_upsample` aggregated per source:
    ``(source, n_docs, n_rows, rep_sum, sum_tokens)``. ``rep_sum`` is
    ``sum(reps*(reps+1)/2)`` — it only matches if the engine really
    enumerates copies ``1..reps``, not merely the right count."""
    from .. import corpus as C
    from ..corpus import params_cte_sql

    cases = " ".join(f"WHEN '{s}' THEN {w}" for s, w in weights.items())
    w = f"CASE {C.source_case_sql('doc_id')} {cases} ELSE {default_weight} END"
    reps = (
        f"(({w}) // {_SPACE}) + CASE WHEN ((doc_id * {_UPSAMPLE_MULT})"
        f" % {_SPACE}) < (({w}) % {_SPACE}) THEN 1 ELSE 0 END"
    )
    return f"""
WITH{params_cte_sql(doc_source)},
  r AS (
    SELECT {C.source_case_sql('doc_id')} AS source, n_tok, {reps} AS reps
    FROM p
  )
SELECT source,
       CAST(COUNT(*) FILTER (WHERE reps > 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(reps), 0) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(reps * (reps + 1) // 2), 0) AS BIGINT) AS rep_sum,
       CAST(COALESCE(SUM(n_tok * reps), 0) AS BIGINT) AS sum_tokens
FROM r
GROUP BY source
HAVING SUM(reps) > 0
ORDER BY source
"""


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


# ---------------------------------------------------------------------------
# fixed-quota group sampling: exactly k docs per source, deterministic
# ---------------------------------------------------------------------------

_QUOTA_MULT = 2246822519  # xxhash32 PRIME32_3 (public) — fifth independent hash
_QUOTA_SPACE = 1 << 32  # full 32-bit key space: rank ties only at identity


def quota_sample(docs, k: int = 20):
    """Exactly ``min(k, group size)`` documents per source, chosen by rank
    of an identity hash — the fixed-BUDGET counterpart of the per-mille
    `stratified_sample` (eval-set construction wants "200 docs per
    source", not "0.3% of each source").

    Deterministic: the rank key is a fifth independent multiplicative
    hash of the doc number, so quota membership never correlates with
    split/sample/upsample/mixture/shuffle decisions. The rank-then-filter
    compiles to ``WindowGroupLimit`` — a k-row heap per group during the
    shuffle read, no group ever fully sorted (same plan property as
    grouped top-k). Returns ``(doc_id, source, pick_rank)``.
    """
    from pyspark.sql import Window

    from ..engine.verify import doc_num_expr

    key = F.pmod(doc_num_expr() * F.lit(_QUOTA_MULT), F.lit(_QUOTA_SPACE))
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source")
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= k)
        .orderBy("source", "pick_rank")
    )


def quota_sample_sql(k: int = 20) -> str:
    from ..corpus import source_case_sql

    return f"""
WITH d AS (
  SELECT printf('doc-%08d', doc_id) AS doc_id,
         {source_case_sql('doc_id')} AS source,
         (doc_id * {_QUOTA_MULT}) % {_QUOTA_SPACE} AS key
  FROM documents),
r AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY key ASC, doc_id ASC) AS BIGINT) AS pick_rank
  FROM d)
SELECT doc_id, source, pick_rank FROM r WHERE pick_rank <= {k}
ORDER BY source, pick_rank
"""
