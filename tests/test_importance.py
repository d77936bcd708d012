"""DSIR-style importance scores: target docs outscore, edge cases, plan."""

import pandas as pd
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions import importance as IMP


def _docs(spark):
    rows = []
    # target-domain docs share a distinctive bigram vocabulary
    for i in range(8):
        rows.append((i, "books", "royal library ancient tome " * 4))
    for i in range(8, 16):
        rows.append((i, "web", "click here buy now deal " * 4))
    # a web doc that borrows target phrasing lands between the camps
    rows.append((16, "web", "royal library click here"))
    rows.append((17, "web", "x"))      # single word: no bigrams
    rows.append((18, "web", ""))       # empty text
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]),
        "doc_id long, source string, text string",
    )


def test_importance_scores_semantics(spark):
    res = {r.doc_id: r for r in IMP.importance_scores(_docs(spark), "books").collect()}
    assert len(res) == 19  # every candidate kept, incl. gram-less docs
    books = [res[i].score_per_gram for i in range(8)]
    web = [res[i].score_per_gram for i in range(8, 16)]
    assert min(books) > max(web)  # target-like docs outscore
    mixed = res[16].score_per_gram
    assert max(web) < mixed < min(books)
    # gram-less docs: zeros with NULL per-gram score
    for i in (17, 18):
        assert res[i].n_grams == 0 and res[i].score == 0
        assert res[i].score_per_gram is None


def test_importance_broadcast_plan(spark):
    plan = IMP.importance_scores(
        _docs(spark), "books"
    )._jdf.queryExecution().executedPlan().toString()
    # the bucket-ratio side joins broadcast (it is <= NUM_BUCKETS rows)
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "EvalPython" not in plan
