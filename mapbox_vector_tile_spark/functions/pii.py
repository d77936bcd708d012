"""PII detection and redaction over the documents table — pure Catalyst.

The standard training-data hygiene pass (C4/Dolma/FineWeb-style): find
and mask emails, IPv4 addresses, phone numbers, and Luhn-validated
card numbers before a corpus ships
to training. Everything here is built-in JVM regex expressions
(``regexp_extract_all`` / ``regexp_replace``) — no UDFs, no shuffle on
the redaction path (projection-only narrow transformation), and the
screen rollup shuffles only the per-source aggregate. At 100 TB this is
the ideal shape: whole-stage-codegen regex over string columns,
embarrassingly parallel, output co-partitioned with input.

The synthetic corpus has no PII, so :func:`with_synthetic_pii` injects
deterministic closed-form PII (pure string formulas of ``doc_id``) that
the DuckDB oracle regenerates exactly — making both the counts and the
full redacted text hash-gateable.

Patterns are deliberately restricted to syntax with identical semantics
in Java regex (Spark) and RE2 (DuckDB): character classes, ``\\b``,
bounded repetition; no lookaround, no backreferences.

Reference parity: the reference has no text-hygiene surface (geometry
library); this is part of the beyond-reference LLM-pipeline layer
(SURVEY.md addendum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
CARD_RE = r"\b\d{13,16}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"
CARD_TOKEN = "<CARD>"

# Card-number semantics (the standard precision/recall split): the
# SCREEN counts only candidates that pass the Luhn mod-10 check
# (precision — a random 13-16-digit run is not a card), while REDACTION
# masks every candidate run (recall — never ship a possible card).


def _luhn_mod10_col(c: Column, offset: int = 0) -> Column:
    """Luhn weighted digit sum mod 10 of digit-string column ``c``,
    positions counted from the right starting at ``1 + offset`` —
    pure Catalyst higher-order functions, no UDF."""

    def weighted(i: Column) -> Column:
        d = F.substring(c, F.length(c) - i + 1, F.lit(1)).cast("int")
        return F.when(
            ((i + F.lit(offset)) % 2) == 0,
            F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2),
        ).otherwise(d)

    arr = F.transform(F.sequence(F.lit(1), F.length(c)), weighted)
    return F.aggregate(arr, F.lit(0), lambda a, x: a + x) % 10


def _luhn_mod10_sql(s: str, offset: int = 0) -> str:
    """DuckDB mirror of :func:`_luhn_mod10_col` over expression ``s``."""
    d = f"CAST(substr({s}, length({s})-i+1, 1) AS INT)"
    wd = (f"CASE WHEN (i + {offset}) % 2 = 0 THEN "
          f"CASE WHEN 2*{d} > 9 THEN 2*{d} - 9 ELSE 2*{d} END "
          f"ELSE {d} END")
    return (f"(list_sum(list_transform(range(1, length({s})+1), i -> {wd}))"
            f" % 10)")


def with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Append deterministic PII to ``text`` as closed-form functions of
    ``doc_id``: one email on ``doc_id % 3 == 0`` (a second on ``% 9``),
    an IPv4 on ``% 4 == 0``, a phone on ``% 5 == 0``. Mirrored verbatim
    by :func:`with_synthetic_pii_sql_expr`."""
    d = F.col("doc_id")
    s = d.cast("string")
    piece = [
        F.when(d % 3 == 0,
               F.concat(F.lit(" contact user"), s,
                        F.lit("@example.com now"))).otherwise(F.lit("")),
        F.when(d % 9 == 0,
               F.concat(F.lit(" cc admin"), s,
                        F.lit("@mail.test.org"))).otherwise(F.lit("")),
        F.when(d % 4 == 0,
               F.concat(F.lit(" from 10."), (d % 256).cast("string"),
                        F.lit("."), ((d * 7) % 256).cast("string"),
                        F.lit("."), (d % 100).cast("string"))
               ).otherwise(F.lit("")),
        F.when(d % 5 == 0,
               F.concat(F.lit(" call 555-"), (d % 900 + 100).cast("string"),
                        F.lit("-"), (d % 9000 + 1000).cast("string"))
               ).otherwise(F.lit("")),
    ]
    b1 = F.lpad(((d * 2654435761) % F.lit(10 ** 15)).cast("string"), 15, "0")
    b2 = F.lpad(((d * 40503) % F.lit(10 ** 15)).cast("string"), 15, "0")
    chk1 = ((F.lit(10) - _luhn_mod10_col(b1, 1)) % 10).cast("string")
    chk2 = (((F.lit(10) - _luhn_mod10_col(b2, 1)) % 10 + 1) % 10).cast(
        "string"
    )
    piece += [
        # a Luhn-VALID 16-digit card on % 6, a Luhn-INVALID one on % 8
        # (redacted but not screen-counted)
        F.when(d % 6 == 0,
               F.concat(F.lit(" card "), b1, chk1)).otherwise(F.lit("")),
        F.when(d % 8 == 0,
               F.concat(F.lit(" ref "), b2, chk2)).otherwise(F.lit("")),
    ]
    return docs.withColumn("text", F.concat(F.col("text"), *piece))


def with_synthetic_pii_sql_expr(text: str = "text",
                                doc_id: str = "doc_id") -> str:
    """DuckDB expression mirroring :func:`with_synthetic_pii`."""
    d = doc_id
    b1 = (f"lpad(CAST(({d} * 2654435761) % 1000000000000000 AS VARCHAR),"
          f" 15, '0')")
    b2 = f"lpad(CAST(({d} * 40503) % 1000000000000000 AS VARCHAR), 15, '0')"
    return (
        f"{text}"
        f" || CASE WHEN {d} % 3 = 0 THEN ' contact user' || {d} ||"
        f" '@example.com now' ELSE '' END"
        f" || CASE WHEN {d} % 9 = 0 THEN ' cc admin' || {d} ||"
        f" '@mail.test.org' ELSE '' END"
        f" || CASE WHEN {d} % 4 = 0 THEN ' from 10.' || ({d} % 256) ||"
        f" '.' || (({d} * 7) % 256) || '.' || ({d} % 100) ELSE '' END"
        f" || CASE WHEN {d} % 5 = 0 THEN ' call 555-' || ({d} % 900 + 100)"
        f" || '-' || ({d} % 9000 + 1000) ELSE '' END"
        f" || CASE WHEN {d} % 6 = 0 THEN ' card ' || {b1} ||"
        f" CAST((10 - {_luhn_mod10_sql(b1, 1)}) % 10 AS VARCHAR)"
        f" ELSE '' END"
        f" || CASE WHEN {d} % 8 = 0 THEN ' ref ' || {b2} ||"
        f" CAST(((10 - {_luhn_mod10_sql(b2, 1)}) % 10 + 1) % 10 AS VARCHAR)"
        f" ELSE '' END"
    )


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_screen(docs: DataFrame) -> DataFrame:
    """Per-document PII counts + flag. Narrow (no shuffle): four
    codegen'd regex scans over the text column; the card count keeps
    only Luhn-valid candidates (higher-order Catalyst expressions, no
    UDF)."""
    t = F.col("text")
    card_cands = F.regexp_extract_all(t, F.lit(CARD_RE), F.lit(0))
    n_ccard = F.size(
        F.filter(card_cands, lambda c: _luhn_mod10_col(c) == 0)
    )
    out = docs.select(
        "doc_id", "source",
        _count(t, EMAIL_RE).cast("long").alias("n_email"),
        _count(t, IPV4_RE).cast("long").alias("n_ipv4"),
        _count(t, PHONE_RE).cast("long").alias("n_phone"),
        n_ccard.cast("long").alias("n_ccard"),
    )
    return out.withColumn(
        "pii_total",
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")
         + F.col("n_ccard")),
    ).withColumn("flagged", F.col("pii_total") > 0)


def pii_screen_by_source(docs: DataFrame) -> DataFrame:
    """Corpus-hygiene rollup: per source, docs screened / flagged and
    per-class totals. One tiny aggregate shuffle (|sources| rows)."""
    return (
        pii_screen(docs)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("flagged").cast("long")).alias("docs_flagged"),
            F.sum("n_email").alias("n_email"),
            F.sum("n_ipv4").alias("n_ipv4"),
            F.sum("n_phone").alias("n_phone"),
            F.sum("n_ccard").alias("n_ccard"),
        )
        .orderBy("source")
    )


def pii_redact(docs: DataFrame) -> DataFrame:
    """Masked copy of the corpus: each PII class replaced by its typed
    placeholder (email first — after that pass the placeholder contains
    no digits, so the later numeric patterns can't re-match inside it).
    Projection-only; output stays co-partitioned with input."""
    red = F.regexp_replace(F.col("text"), EMAIL_RE, EMAIL_TOKEN)
    red = F.regexp_replace(red, CARD_RE, CARD_TOKEN)
    red = F.regexp_replace(red, IPV4_RE, IPV4_TOKEN)
    red = F.regexp_replace(red, PHONE_RE, PHONE_TOKEN)
    return docs.select("doc_id", "source", red.alias("redacted"))


def pii_screen_by_source_sql() -> str:
    """DuckDB oracle for ``pii_screen_by_source(with_synthetic_pii(documents))``."""
    txt = with_synthetic_pii_sql_expr()
    return f"""
WITH pii AS (
  SELECT doc_id, source,
         len(regexp_extract_all({txt}, '{EMAIL_RE}')) AS n_email,
         len(regexp_extract_all({txt}, '{IPV4_RE}')) AS n_ipv4,
         len(regexp_extract_all({txt}, '{PHONE_RE}')) AS n_phone,
         len(list_filter(regexp_extract_all({txt}, '{CARD_RE}'),
             c -> {_luhn_mod10_sql('c')} = 0)) AS n_ccard
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_email + n_ipv4 + n_phone + n_ccard > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
       CAST(SUM(n_email) AS BIGINT) AS n_email,
       CAST(SUM(n_ipv4) AS BIGINT) AS n_ipv4,
       CAST(SUM(n_phone) AS BIGINT) AS n_phone,
       CAST(SUM(n_ccard) AS BIGINT) AS n_ccard
FROM pii GROUP BY source ORDER BY source
"""


def redact_sql_expr(txt: str) -> str:
    """DuckDB expression mirroring :func:`pii_redact` over ``txt``
    (same pass order: email, card, ipv4, phone)."""
    return (
        f"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"{txt}, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'), "
        f"'{CARD_RE}', '{CARD_TOKEN}', 'g'), "
        f"'{IPV4_RE}', '{IPV4_TOKEN}', 'g'), "
        f"'{PHONE_RE}', '{PHONE_TOKEN}', 'g')"
    )


def pii_redaction_sql() -> str:
    """DuckDB oracle for ``pii_redact(with_synthetic_pii(documents))``:
    the full redacted text compares hash-exact, proving both engines'
    regex passes found and masked identical spans."""
    red = redact_sql_expr(with_synthetic_pii_sql_expr())
    return f"""
SELECT doc_id, source, {red} AS redacted
FROM documents ORDER BY doc_id
"""
