"""Text-analysis + deduplication operators for training-data pipelines.

Every operator comes in two synchronized forms:

- a Spark DataFrame builder (JVM-side ``pyspark.sql.functions`` expressions —
  no Python in the hot path), and
- a DuckDB oracle SQL string computing the identical result, so the driver's
  value-hash gate covers these operators too.

Cross-engine determinism rules used throughout:
- hashes: ``h48(s)`` = first 48 bits of md5, exact in both engines;
- all scores/ratios are *integer* arithmetic (or exact fixed-point) — never
  floats — so value hashes can't drift;
- every argmax/tie is broken by an explicit deterministic order.

These generalize the reference's dictionary/dedup machinery
(/root/reference/mapbox_vector_tile/encoder.py:241-266 deduplicates repeated
attribute values; /root/reference/mapbox_vector_tile/optimise.py:20-57 counts
usage frequencies) from per-tile attribute tables to corpus-level document
deduplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

P31 = 2_147_483_647  # Mersenne prime 2^31-1: minhash permutation modulus
N_MINHASH = 8
# deterministic permutation params (a_k odd, b_k) — fixed, shared with SQL
MINHASH_A = [769, 1543, 3079, 6151, 12289, 24593, 49157, 98317]
MINHASH_B = [12345, 23456, 34567, 45678, 56789, 67890, 78901, 89012]

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "un"],
    "es": ["el", "los", "de", "y", "una"],
    "zh": ["de", "shi", "le", "zai", "he"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # argmax tie-break priority


# ---------------------------------------------------------------------------
# portable 48-bit hash
# ---------------------------------------------------------------------------

def h48(col) -> F.Column:
    """First 48 bits of md5 as a non-negative long (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def h48_sql(expr: str) -> str:
    """DuckDB-side equivalent of :func:`h48`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 12) AS BIGINT)"


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame) -> DataFrame:
    """Group documents by exact content hash; one row per distinct text."""
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .orderBy("text_md5")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_md5,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM documents GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# minhash signatures over word 3-gram shingles
# ---------------------------------------------------------------------------

def _words() -> F.Column:
    return F.split(F.col("text"), " ")


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, n_shingles, m0..m7): k-minhash over word 3-gram shingles.

    Docs with <3 words have no shingles -> NULL signature components.
    """
    # let-bind the split word array (one-element transform) so the split
    # runs once per row, not once per element_at inside the shingle lambda
    shingles = F.transform(
        F.array(_words()),
        lambda w: F.when(
            F.size(w) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(w, i + 1),
                    F.element_at(w, i + 2),
                    F.element_at(w, i + 3),
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]
    out = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        shingles.alias("_sh"),
    ).withColumn("n_shingles", F.size("_sh").cast("long"))
    def _perm(a: int, b: int):
        return lambda s: (F.lit(a) * (h48(s) % P31) + F.lit(b)) % P31

    for k in range(N_MINHASH):
        out = out.withColumn(
            f"m{k}",
            F.array_min(F.transform(F.col("_sh"), _perm(MINHASH_A[k], MINHASH_B[k]))),
        )
    return out.drop("_sh").orderBy("doc_id")


def minhash_signatures_sql() -> str:
    sh = (
        "CASE WHEN len(string_split(text,' ')) >= 3 THEN "
        "list_transform(range(len(string_split(text,' ')) - 2), "
        "i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]"
        " || ' ' || string_split(text,' ')[i+3]) "
        "ELSE [] END"
    )
    cols = ", ".join(
        f"list_min(list_transform(sh, s -> ({MINHASH_A[k]} * ({h48_sql('s')} % {P31})"
        f" + {MINHASH_B[k]}) % {P31})) AS m{k}"
        for k in range(N_MINHASH)
    )
    return f"""
WITH s AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, {sh} AS sh FROM documents)
SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, {cols}
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# minhash-LSH candidate pairs (band -> bucket -> self-join)
# ---------------------------------------------------------------------------

N_BANDS = 4  # bands of 2 rows each: band_hash = m(2i)*P31 + m(2i+1)


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Near-dup candidates: pairs sharing >=1 LSH band bucket."""
    sig = minhash_signatures(docs).filter(F.col("n_shingles") > 0)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("band"),
                        (F.col(f"m{2*i}") * P31 + F.col(f"m{2*i+1}")).alias("bh"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def lsh_candidate_pairs_sql() -> str:
    sig = minhash_signatures_sql().replace("ORDER BY doc_id", "")
    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band, m{2*i} * {P31} + m{2*i+1} AS bh "
        f"FROM sig WHERE n_shingles > 0"
        for i in range(N_BANDS)
    )
    return f"""
WITH sig AS ({sig}), bands AS ({bands_union})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
WHERE a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact, integer num/den), over LSH candidates
# ---------------------------------------------------------------------------

def near_dup_jaccard(docs: DataFrame, min_pct: int = 0) -> DataFrame:
    """Exact word-set Jaccard computed ONLY over the LSH candidate pairs.

    The pair space is bounded by the banded minhash buckets (O(n²/2^bits)
    per band, not O(n²)): every join in the plan carries a band/bucket key
    or a doc-id key — no all-pairs blocking anywhere, which is the property
    that survives a 100 TB corpus. ``min_pct=0`` keeps every candidate with
    its exact score (the verify-then-threshold shape of production dedup);
    raise it to emit only confirmed near-dups.
    """
    cands = lsh_candidate_pairs(docs)
    sets = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_sort(F.array_distinct(_words())).alias("ws"),
    )
    j = (
        cands.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("ws_a")),
            "doc_a",
        ).join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("ws_b")),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b"))).cast("long")
    union = F.size(F.array_union(F.col("ws_a"), F.col("ws_b"))).cast("long")
    return (
        j.select(
            "doc_a",
            "doc_b",
            inter.alias("jac_num"),
            union.alias("jac_den"),
        )
        .filter(F.col("jac_num") * 100 >= F.lit(min_pct) * F.col("jac_den"))
        .orderBy("doc_a", "doc_b")
    )


def near_dup_jaccard_sql(min_pct: int = 0) -> str:
    cands = lsh_candidate_pairs_sql().replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH cand AS ({cands}),
s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_sort(list_distinct(string_split(text,' '))) AS ws
  FROM documents)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS jac_num,
       CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS BIGINT) AS jac_den
FROM cand c JOIN s a ON c.doc_a = a.doc_id JOIN s b ON c.doc_b = b.doc_id
WHERE len(list_intersect(a.ws, b.ws)) * 100
      >= {min_pct} * len(list_distinct(list_concat(a.ws, b.ws)))
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# simhash (32-bit, word-level)
# ---------------------------------------------------------------------------

def simhash32(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit simhash of word hashes.

    Implemented as explode + one shuffle with 32 conditional-sum aggregates
    (all JVM-side). At 100 TB scale the same math runs in a pandas UDF per
    partition; this form is the oracle-checkable one.
    """
    w = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(_words()).alias("word"),
    ).withColumn("h", h48(F.col("word")))
    votes = w.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(32)
        ]
    )
    bits = None
    for i in range(32):
        term = F.when(F.col(f"v{i}") > 0, F.lit(2**i).cast("long")).otherwise(0)
        bits = term if bits is None else bits + term
    return votes.select("doc_id", bits.alias("simhash")).orderBy("doc_id")


def simhash32_sql() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(32)
    )
    bits = " + ".join(
        f"CASE WHEN v{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END"
        for i in range(32)
    )
    return f"""
WITH w AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {h48_sql('u.word')} AS h
  FROM documents, LATERAL unnest(string_split(text,' ')) u(word)),
v AS (SELECT doc_id, {votes} FROM w GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM v ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# language-ID (stopword heuristic)
# ---------------------------------------------------------------------------

def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, pred_lang, s_<lang>...) deterministic stopword votes."""
    w = _words()
    out = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "lang", w.alias("_w"))
    def _in_stoplist(arr):
        return lambda x: F.array_contains(arr, x)

    for lg in LANG_ORDER:
        arr = F.array(*[F.lit(s) for s in STOPWORDS[lg]])
        out = out.withColumn(
            f"s_{lg}",
            F.size(F.filter(F.col("_w"), _in_stoplist(arr))).cast("long"),
        )
    pred = None
    for lg in reversed(LANG_ORDER):
        cond = None
        for other in LANG_ORDER:
            if other == lg:
                continue
            c = F.col(f"s_{lg}") >= F.col(f"s_{other}")
            cond = c if cond is None else cond & c
        pred = F.when(cond, F.lit(lg)) if pred is None else F.when(cond, F.lit(lg)).otherwise(pred)
    # reversed build order means earlier langs in LANG_ORDER win ties
    return out.drop("_w").withColumn("pred_lang", pred).orderBy("doc_id")


def lang_id_sql() -> str:
    score_cols = ", ".join(
        "CAST(len(list_filter(string_split(text,' '), w -> w IN ("
        + ", ".join(f"'{s}'" for s in STOPWORDS[lg])
        + f"))) AS BIGINT) AS s_{lg}"
        for lg in LANG_ORDER
    )
    pred = "CASE "
    for lg in LANG_ORDER:
        conds = " AND ".join(
            f"s_{lg} >= s_{other}" for other in LANG_ORDER if other != lg
        )
        pred += f"WHEN {conds} THEN '{lg}' "
    pred += "END"
    return f"""
WITH s AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, {score_cols} FROM documents)
SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh, {pred} AS pred_lang
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# quality scoring + token counting (integer features)
# ---------------------------------------------------------------------------

def quality_scores(docs: DataFrame) -> DataFrame:
    w = _words()
    n_words = F.size(w).cast("long")
    n_distinct = F.size(F.array_distinct(w)).cast("long")
    n_chars = F.length("text").cast("long")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        (n_distinct * 100 / n_words).cast("long").alias("uniq_pct"),
        ((n_chars - (n_words - 1)) * 100 / n_words).cast("long").alias("avg_word_len_x100"),
    ).orderBy("doc_id")


# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation —
# the GPT-2-style split shape, restricted to constructs Java regex and RE2
# (DuckDB) evaluate identically (character classes + alternation only).
BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """Per-doc token counts: whitespace words vs BPE-ish regex segments —
    the size estimate a training pipeline runs before paying for real
    tokenization. Pure Catalyst (`regexp_extract_all`), no Python."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(_words()).cast("long").alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


def token_count_bpe_sql() -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


QUALITY_SQL = """
WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
         CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct_words
  FROM documents)
SELECT doc_id, n_chars, n_words, n_distinct_words,
       CAST(n_distinct_words * 100 // n_words AS BIGINT) AS uniq_pct,
       CAST((n_chars - (n_words - 1)) * 100 // n_words AS BIGINT) AS avg_word_len_x100
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# document fingerprint (min-hash of char 8-grams, winnowing-style)
# ---------------------------------------------------------------------------

def doc_fingerprint(docs: DataFrame) -> DataFrame:
    # note: Spark sequence(1, 0) is DESCENDING [1, 0], so short texts need an
    # explicit guard to mirror DuckDB's empty range(0)
    grams = F.expr(
        "CASE WHEN length(text) >= 8 THEN "
        "transform(sequence(1, length(text) - 7), i -> substring(text, i, 8)) "
        "ELSE array() END"
    )
    out = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), grams.alias("_g")
    )
    return out.select(
        "doc_id",
        F.array_min(F.transform(F.col("_g"), h48)).alias("fingerprint"),
        F.size(F.array_distinct(F.col("_g"))).cast("long").alias("n_distinct_grams"),
    ).orderBy("doc_id")


def doc_fingerprint_sql() -> str:
    return f"""
WITH g AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_transform(range(greatest(length(text) - 7, 0)),
                        i -> substr(text, i + 1, 8)) AS grams
  FROM documents)
SELECT doc_id,
       list_min(list_transform(grams, s -> {h48_sql('s')})) AS fingerprint,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams
FROM g ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# composed corpus filter: the end-to-end cleaning pass a training pipeline
# runs — exact-dedup keep-first, language gate, quality gate — attributed
# with deterministic precedence so every drop is auditable
# ---------------------------------------------------------------------------

def corpus_filter_pipeline(
    docs: DataFrame, min_words: int = 40, min_uniq_pct: int = 40,
    keep_lang: str = "en",
) -> DataFrame:
    """One pass composing the cleaning operators: exact dedup (keep the
    lowest doc_id per identical text), stopword-vote language gate, and
    integer quality gates. Drop reasons use fixed precedence
    (dup > lang > quality) so each document lands in exactly one category;
    the output is a per-source audit rollup.

    Scale shape: the dedup keep-list is a hash groupBy (no window over the
    corpus); the gates are per-row Catalyst expressions; the rollup is a
    tiny aggregate."""
    keep_ids = docs.groupBy(F.md5("text").alias("k")).agg(
        F.min("doc_id").alias("keep_id")
    )
    lang_pred = lang_id(docs).select("doc_id", "pred_lang")
    q = quality_scores(docs).select("doc_id", "n_words", "uniq_pct")
    base = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "source",
                    F.md5("text").alias("k"))
        .join(keep_ids, "k")
        .join(lang_pred, "doc_id")
        .join(q, "doc_id")
    )
    verdict = (
        F.when(F.col("doc_id") != F.col("keep_id"), F.lit("drop_dup"))
        .when(F.col("pred_lang") != keep_lang, F.lit("drop_lang"))
        .when(
            (F.col("n_words") < min_words)
            | (F.col("uniq_pct") < min_uniq_pct),
            F.lit("drop_quality"),
        )
        .otherwise(F.lit("keep"))
    )
    return (
        base.withColumn("verdict", verdict)
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("sum_words"),
        )
        .orderBy("source", "verdict")
    )


def corpus_filter_pipeline_sql(
    min_words: int = 40, min_uniq_pct: int = 40, keep_lang: str = "en"
) -> str:
    lang_cte = lang_id_sql().strip().rstrip()
    # reuse the published per-op SQL as CTE bodies (strip trailing ORDER BY)
    lang_cte = lang_cte[: lang_cte.rindex("ORDER BY")]
    return f"""
WITH lp AS ({lang_cte}),
k AS (
  SELECT md5(text) AS k, CAST(MIN(doc_id) AS BIGINT) AS keep_id
  FROM documents GROUP BY 1),
q AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
         CAST(len(list_distinct(string_split(text,' '))) * 100
              // len(string_split(text,' ')) AS BIGINT) AS uniq_pct
  FROM documents),
base AS (
  SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source,
         k.keep_id, lp.pred_lang, q.n_words, q.uniq_pct
  FROM documents d
  JOIN k ON md5(d.text) = k.k
  JOIN lp ON lp.doc_id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id),
v AS (
  SELECT source,
         CASE WHEN doc_id != keep_id THEN 'drop_dup'
              WHEN pred_lang != '{keep_lang}' THEN 'drop_lang'
              WHEN n_words < {min_words} OR uniq_pct < {min_uniq_pct}
                THEN 'drop_quality'
              ELSE 'keep' END AS verdict,
         n_words
  FROM base)
SELECT source, verdict, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS sum_words
FROM v GROUP BY source, verdict ORDER BY source, verdict
"""


# ---------------------------------------------------------------------------
# near-dup cluster assignment: connected components over confirmed pairs
# ---------------------------------------------------------------------------

def dedup_clusters(
    docs: DataFrame, min_pct: int = 50, max_iters: int = 12
) -> DataFrame:
    """Group near-duplicate documents into clusters and pick one canonical
    representative per cluster: connected components over the confirmed
    near-dup pair graph (:func:`near_dup_jaccard` at ``min_pct``), labels
    propagated to the component's minimum doc_id.

    Production dedup keeps ONE member per duplicate *cluster*, not per
    pair — pairwise keep-first drops both of ``(b,c)`` when ``(a,b)`` and
    ``(b,c)`` are dups but keeps neither cluster head consistently. This is
    the multi-document generalization of the reference merging duplicate
    attribute/geometry entries into one stored instance per tile
    (/root/reference/mapbox_vector_tile/encoder.py:241-266).

    Scale shape: min-label propagation — each iteration is one
    edge-to-label equi-join + a groupBy-min, both keyed on doc ids (no
    all-pairs step; the edge list itself is LSH-bounded). Iterations needed
    = graph diameter; near-dup components are near-cliques (diameter 2-3),
    so the loop converges in 2-4 rounds — checked with a per-round
    changed-count action, fail-fast if ``max_iters`` is hit (at that point
    the graph is NOT near-dup-shaped and a large-star/small-star variant
    belongs in the loop instead).

    Returns ``(doc_id, cluster_id, cluster_size, is_canonical)`` for every
    document (singletons are their own cluster of size 1), ordered by
    ``doc_id``.
    """
    from .components import min_label_components

    pairs = near_dup_jaccard(docs, min_pct).select("doc_a", "doc_b")
    labels = min_label_components(
        docs.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b", max_iters
    )
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        labels.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


def dedup_clusters_sql(min_pct: int = 50) -> str:
    """DuckDB oracle: transitive closure by recursive CTE (UNION dedups the
    frontier), component label = min reachable doc_id — exact same
    fixpoint the Spark propagation loop reaches."""
    pairs = near_dup_jaccard_sql(min_pct).replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH RECURSIVE p AS ({pairs}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach(n, m) AS (
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
labels AS (SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n),
sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM labels GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id, s.cluster_size,
       l.doc_id = l.cluster_id AS is_canonical
FROM labels l JOIN sizes s USING (cluster_id)
ORDER BY l.doc_id
"""
