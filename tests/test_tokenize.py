"""Text -> tokens ingest bridge: portable hash tokenizer, pure Catalyst."""

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions.tokenize import (
    DEFAULT_VOCAB,
    tokenize_documents,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "key agg row key"),
            (1, "a"),
            (2, "join small line"),
        ],
        "doc_id long, text string",
    )


def test_tokens_canonical_shape_and_domain(spark):
    out = tokenize_documents(_docs(spark)).collect()
    rows = {r.doc_id: r for r in out}
    assert set(rows) == {"doc-00000000", "doc-00000001", "doc-00000002"}
    r0 = rows["doc-00000000"]
    assert r0.n_tok == len(r0.tokens) == 4
    assert all(0 <= t < DEFAULT_VOCAB for t in r0.tokens)
    # same word -> same id, deterministic
    assert r0.tokens[0] == r0.tokens[3]
    assert rows["doc-00000001"].n_tok == 1


def test_tokenizer_matches_duckdb_replay(spark):
    import duckdb

    from mapbox_vector_tile_spark.functions.tokenize import (
        tokenize_checksum_sql,
    )
    from mapbox_vector_tile_spark.engine.verify import with_doc_checksums

    docs = _docs(spark)
    got = [
        (r.doc_id, r.n_tok, r.tok_cks, r.tok_wcks)
        for r in with_doc_checksums(
            tokenize_documents(docs).withColumn(
                "n_tok", F.col("n_tok").cast("long")
            )
        )
        .select("doc_id", "n_tok", "tok_cks", "tok_wcks")
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(0, 'key agg row key'), (1, 'a'), (2, 'join small line')"
        ") AS t(doc_id, text)"
    )
    want = [
        (d, n, c, w)
        for d, n, c, w, _mn, _mx in con.sql(
            tokenize_checksum_sql()
        ).fetchall()
    ]
    assert got == want


def test_tokenizer_is_pure_catalyst(spark):
    plan = (
        tokenize_documents(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "Exchange" not in plan
