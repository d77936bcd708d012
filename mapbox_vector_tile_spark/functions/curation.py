"""The composed curation pipeline — filter -> dedup -> redact -> split
in ONE Catalyst plan.

This is the end-to-end shape a training-data team actually runs: exact
dedup (hash keep-list), language + quality gates, PII redaction of the
survivors, deterministic split assignment, and a per-(split, source)
audit rollup — declared as a single DataFrame expression so Catalyst
sees the whole pipeline at once (gate predicates prune before the
redaction projection; the only shuffles are the dedup keep-list groupBy,
the survivor join, and the final tiny rollup).

Gates run on the ORIGINAL text (injected synthetic PII must not change
language/quality verdicts); redaction runs on the PII-injected text so
the masking is exercised for real. Every stage reuses the SQL mirror of
its standalone operator, so the composed oracle is assembled from
already-proven parts.

Reference parity: beyond-reference LLM-pipeline layer (SURVEY.md
addendum); composes `functions/text.py`, `functions/pii.py`,
`functions/split.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .pii import pii_redact, with_synthetic_pii
from .split import split_expr_from_num
from .text import lang_id, quality_scores

MASK_RE = r"<(EMAIL|IP|PHONE|CARD)>"
DEFAULT_SPLITS = {"train": 900, "val": 50, "test": 50}


def curation_pipeline_rollup(
    docs: DataFrame,
    splits: dict[str, int] | None = None,
    min_words: int = 40,
    min_uniq_pct: int = 40,
    keep_lang: str = "en",
) -> DataFrame:
    """Per-(split, source) audit of the fully-curated corpus: documents
    that survive exact dedup + language + quality gates, PII-redacted
    and split-assigned. Columns: ``n_docs``, ``masked_docs`` (docs where
    redaction fired), ``sum_masks`` (mask tokens inserted),
    ``sum_chars`` (redacted length)."""
    splits = splits or DEFAULT_SPLITS
    keep_ids = docs.groupBy(F.md5("text").alias("k")).agg(
        F.min("doc_id").alias("keep_id")
    )
    lang_pred = lang_id(docs).select("doc_id", "pred_lang")
    q = quality_scores(docs).select("doc_id", "n_words", "uniq_pct")
    survivors = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.md5("text").alias("k"),
        )
        .join(keep_ids, "k")
        .join(lang_pred, "doc_id")
        .join(q, "doc_id")
        .filter(
            (F.col("doc_id") == F.col("keep_id"))
            & (F.col("pred_lang") == keep_lang)
            & (F.col("n_words") >= min_words)
            & (F.col("uniq_pct") >= min_uniq_pct)
        )
        .select("doc_id")
    )
    redacted = pii_redact(with_synthetic_pii(docs)).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    n_masks = F.size(
        F.regexp_extract_all(F.col("redacted"), F.lit(MASK_RE), F.lit(0))
    ).cast("long")
    return (
        redacted.join(survivors, "doc_id")
        .withColumn("split", split_expr_from_num(splits, F.col("doc_id")))
        .select(
            "split", "source", n_masks.alias("n_masks"),
            F.length("redacted").cast("long").alias("n_chars"),
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_masks") > 0).cast("long")).alias("masked_docs"),
            F.sum("n_masks").alias("sum_masks"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "source")
    )


def curation_pipeline_rollup_sql(
    splits: dict[str, int] | None = None,
    min_words: int = 40,
    min_uniq_pct: int = 40,
    keep_lang: str = "en",
) -> str:
    """DuckDB oracle assembled from the standalone operators' mirrors."""
    from .pii import redact_sql_expr, with_synthetic_pii_sql_expr
    from .split import split_sql
    from .text import lang_id_sql

    splits = splits or DEFAULT_SPLITS
    lang_cte = lang_id_sql().strip()
    lang_cte = lang_cte[: lang_cte.rindex("ORDER BY")]
    red = redact_sql_expr(with_synthetic_pii_sql_expr("d.text", "d.doc_id"))
    return f"""
WITH lp AS ({lang_cte}),
k AS (
  SELECT md5(text) AS k, CAST(MIN(doc_id) AS BIGINT) AS keep_id
  FROM documents GROUP BY 1),
q AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         len(string_split(text,' ')) AS n_words,
         len(list_distinct(string_split(text,' '))) * 100
              // len(string_split(text,' ')) AS uniq_pct
  FROM documents),
surv AS (
  SELECT CAST(d.doc_id AS BIGINT) AS doc_id
  FROM documents d
  JOIN k ON md5(d.text) = k.k
  JOIN lp ON lp.doc_id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id
  WHERE CAST(d.doc_id AS BIGINT) = k.keep_id
    AND lp.pred_lang = '{keep_lang}'
    AND q.n_words >= {min_words} AND q.uniq_pct >= {min_uniq_pct}),
red AS (
  SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source,
         {red} AS redacted
  FROM documents d),
m AS (
  SELECT {split_sql(splits, "r.doc_id")} AS split, r.source,
         len(regexp_extract_all(r.redacted, '{MASK_RE}')) AS n_masks,
         length(r.redacted) AS n_chars
  FROM red r JOIN surv s ON s.doc_id = r.doc_id)
SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_masks > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS masked_docs,
       CAST(SUM(n_masks) AS BIGINT) AS sum_masks,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM m GROUP BY split, source ORDER BY split, source
"""
