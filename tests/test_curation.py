"""Composed curation pipeline (functions/curation.py) — end-to-end
verdict vs a driver-side brute force, plus stage-composition invariants."""

from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions import pii as P
from mapbox_vector_tile_spark.functions.curation import (
    curation_pipeline_rollup,
)
from mapbox_vector_tile_spark.functions.split import split_expr_from_num
from mapbox_vector_tile_spark.functions.text import lang_id, quality_scores

_STOP = ("the and is in to of a for on with as by at from or an be this "
         "that it are was").split()


def _mk_docs(spark, n=120):
    rows = []
    for i in range(n):
        if i % 10 == 3:
            words = [f"w{j}" for j in range(50)]        # non-en -> drop
        elif i % 10 == 7:
            words = ["the", "and", "is"] * 4            # too short -> drop
        elif i % 10 == 9:
            words = ["the"] * 60                        # low uniq -> drop
        else:
            words = [_STOP[j % len(_STOP)] if j % 3 == 0 else f"t{i}w{j}"
                     for j in range(60)]
        if i % 11 == 5 and i > 11:
            text = None  # duplicate of doc (i - 11)'s text, filled below
        else:
            text = " ".join(words)
        rows.append([i, text, f"s{i % 3}", "en"])
    by_id = {r[0]: r for r in rows}
    for r in rows:
        if r[1] is None:
            r[1] = by_id[r[0] - 11][1]
    return rows, spark.createDataFrame(
        [tuple(r) for r in rows], "doc_id long, text string, source string, lang string"
    )


def test_rollup_matches_brute_force(spark):
    rows, docs = _mk_docs(spark)
    out = {(r["split"], r["source"]): r
           for r in curation_pipeline_rollup(docs).collect()}

    # driver-side brute force using the per-stage operators' own outputs
    lang = {r["doc_id"]: r["pred_lang"]
            for r in lang_id(docs).collect()}
    qual = {r["doc_id"]: (r["n_words"], r["uniq_pct"])
            for r in quality_scores(docs).collect()}
    red = {r["doc_id"]: r["redacted"]
           for r in P.pii_redact(P.with_synthetic_pii(docs)).collect()}
    first_by_text = {}
    for i, text, _src, _lg in rows:
        first_by_text.setdefault(text, i)
    split_of = {r["doc_id"]: r["sp"] for r in docs.select(
        "doc_id",
        split_expr_from_num(
            {"train": 900, "val": 50, "test": 50}, F.col("doc_id")
        ).alias("sp"),
    ).collect()}

    want = {}
    for i, text, src, _lg in rows:
        nw, uq = qual[i]
        if (first_by_text[text] != i or lang[i] != "en"
                or nw < 40 or uq < 40):
            continue
        r = red[i]
        masks = sum(r.count(t) for t in
                    ("<EMAIL>", "<IP>", "<PHONE>", "<CARD>"))
        key = (split_of[i], src)
        agg = want.setdefault(key, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += 1 if masks else 0
        agg[2] += masks
        agg[3] += len(r)
    assert set(out) == set(want)
    for key, (nd, md, sm, sc) in want.items():
        r = out[key]
        assert (r["n_docs"], r["masked_docs"], r["sum_masks"],
                r["sum_chars"]) == (nd, md, sm, sc), key
    # the fixture exercised every drop reason and masking
    assert sum(v[0] for v in want.values()) < len(rows)
    assert sum(v[2] for v in want.values()) > 0


def test_duplicates_keep_lowest_id_only(spark):
    docs = spark.createDataFrame(
        [(1, "good unique text " + " ".join(
            f"{_STOP[j % len(_STOP)]} x{j}" for j in range(40)), "a", "en"),
         (2, "good unique text " + " ".join(
             f"{_STOP[j % len(_STOP)]} x{j}" for j in range(40)), "a", "en")],
        "doc_id long, text string, source string, lang string",
    )
    total = (curation_pipeline_rollup(docs)
             .agg(F.sum("n_docs")).first()[0])
    assert total == 1


def test_split_expr_from_num_matches_string_form(spark):
    from mapbox_vector_tile_spark.functions.split import split_expr

    splits = {"train": 800, "val": 100, "test": 100}
    df = spark.range(200).select(
        F.col("id").alias("num"),
        F.format_string("doc-%08d", F.col("id")).alias("doc_id"),
    )
    got = df.select(
        split_expr(splits, "doc_id").alias("a"),
        split_expr_from_num(splits, F.col("num")).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in got)
