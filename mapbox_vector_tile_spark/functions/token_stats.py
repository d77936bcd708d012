"""Per-group token-distribution stats via ``groupBy().applyInPandas``.

The codec selector's stats sampler (cardinality / run / width features,
north rule) expressed as a *grouped* Arrow-batched pandas UDF — the
``applyInPandas`` surface of the engine (encode/decode use ``mapInArrow``;
this is the grouped form for per-key distribution profiling, e.g. "which
sources are RLE-friendly?"). All outputs integer so the DuckDB oracle can
match exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import corpus as C

MOD = C.MOD

STATS_SCHEMA = (
    "source string, n_docs long, sum_n_tok long, max_zz_width long, tok_cks long"
)


def token_stats_by_source(tokens_df: DataFrame) -> DataFrame:
    """(source) -> docs, token count, max zigzag bit-width, pmod checksum."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        arrays = [np.asarray(t, dtype=np.int64) for t in pdf["tokens"]]
        nonempty = [a for a in arrays if a.size]
        if nonempty:
            v = np.concatenate(nonempty)
            zz = (v << 1) ^ (v >> 63)  # int32 zigzag computed in int64
            mzz = int(zz.max())
            width = mzz.bit_length()
            cks = int(v.sum() % MOD)
        else:
            width = 0
            cks = 0
        return pd.DataFrame(
            [
                {
                    "source": pdf["source"].iloc[0],
                    "n_docs": len(pdf),
                    "sum_n_tok": int(sum(a.size for a in arrays)),
                    "max_zz_width": width,
                    "tok_cks": cks,
                }
            ]
        )

    return (
        tokens_df.select("source", "tokens")
        .groupBy("source")
        .applyInPandas(agg, STATS_SCHEMA)
        .orderBy("source")
    )


def token_stats_by_source_sql(doc_source: str = "documents") -> str:
    """DuckDB oracle: same stats straight from the corpus formula."""
    return f"""
WITH{C.params_cte_sql(doc_source)},{C.tokens_cte_sql()},
  s AS (
    SELECT t.doc_id, {C.source_case_sql('t.doc_id')} AS source,
           t.n_tok, t.j, t.tok,
           CASE WHEN t.tok IS NULL THEN NULL
                ELSE xor(t.tok * 2, t.tok >> 63) END AS zz
    FROM t)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN tok IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS sum_n_tok,
       CAST(CASE WHEN MAX(zz) IS NULL OR MAX(zz) = 0 THEN 0
                 ELSE LENGTH(BIN(MAX(zz))) END AS BIGINT) AS max_zz_width,
       CAST(((COALESCE(SUM(tok), 0) % {MOD}) + {MOD}) % {MOD} AS BIGINT) AS tok_cks
FROM s
GROUP BY source
ORDER BY source
"""
