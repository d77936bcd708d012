"""Raw text -> token arrays: the ingest bridge into the encode pipeline.

Completes the ``documents`` story: a corpus arrives as text, becomes the
engine's canonical ``(doc_id, tokens, n_tok)`` shape, and flows into
``encode_dataframe`` — text to compressed blocks end-to-end. The
tokenizer here is a deterministic word-hash scheme (whitespace split,
token id = 48-bit md5 of the word mod vocab_size), which is exactly the
portable construction the dedup/minhash family already uses
(:func:`.text.h48` / :func:`.text.h48_sql`) — a real subword BPE drops
into the same per-word slot, but a hash tokenizer is the one an
engine-independent SQL oracle can replay bit-exactly.

Pure Catalyst: ``split`` + ``transform(md5 ...)`` are JVM higher-order
expressions — no Python touches the text, no shuffle is introduced (one
projection). Reference analog: the encoder's ingest normalization of
foreign geometries into its canonical command stream
(/root/reference/mapbox_vector_tile/geom_encoder.py ingest path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import h48, h48_sql

DEFAULT_VOCAB = 50_257  # GPT-2-sized id space; any < 2^31 works


def tokenize_documents(
    docs: DataFrame, vocab_size: int = DEFAULT_VOCAB
) -> DataFrame:
    """``documents(doc_id, text, ...)`` -> ``(doc_id, tokens, n_tok)`` in
    the engine's canonical shape (string doc ids, int32 token arrays)."""
    words = F.split(F.col("text"), " ")
    tokens = F.transform(
        words, lambda w: (h48(w) % F.lit(int(vocab_size))).cast("int")
    )
    return docs.select(
        F.format_string("doc-%08d", F.col("doc_id").cast("long")).alias(
            "doc_id"
        ),
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
    )


def tokenize_checksum_sql(
    vocab_size: int = DEFAULT_VOCAB,
    mod: int = 1_000_000_007,
    doc_source: str = "documents",
) -> str:
    """DuckDB oracle: per-doc order-sensitive checksums of the hash-token
    stream, replayed straight from the text column (1-based word index
    ``j`` mirrors the engine's ``(0-based j) + 1`` weighting)."""
    tok = f"{h48_sql('ws[u.j]')} % {int(vocab_size)}"
    return f"""
WITH s AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM {doc_source}
  ),
  w AS (
    SELECT doc_id, u.j, {tok} AS tok
    FROM s, LATERAL unnest(range(1, len(ws) + 1)) u(j)
  )
SELECT printf('doc-%08d', doc_id) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(((SUM(tok) % {mod}) + {mod}) % {mod} AS BIGINT) AS tok_cks,
       CAST(((SUM(j * tok) % {mod}) + {mod}) % {mod} AS BIGINT) AS tok_wcks,
       CAST(MIN(tok) AS BIGINT) AS tok_min,
       CAST(MAX(tok) AS BIGINT) AS tok_max
FROM w
GROUP BY doc_id
ORDER BY doc_id
"""
