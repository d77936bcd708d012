"""PII screen/redaction (functions/pii.py) — pattern behavior, the
Spark/SQL injection mirror, and the zero-shuffle/zero-Python plan."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_spark.functions import pii as P


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "src%d" % (i % 2)) for i, t in enumerate(rows)],
        "doc_id long, text string, source string",
    )


def test_screen_counts_each_class(spark):
    rows = [
        "plain text with no pii at all",
        "mail me at a.b+c%d@sub.example.co or x@y.io thanks",
        "server 192.168.0.1 and 10.0.0.255 up",
        "call 555-123-4567 maybe",
        "mix bob@corp.net from 8.8.8.8 dial 800-555-1212",
    ]
    got = {r["doc_id"]: r for r in P.pii_screen(_docs(spark, rows)).collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_phone"]) == (0, 0, 0)
    assert not got[0]["flagged"]
    assert got[1]["n_email"] == 2
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_phone"] == 1
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (1, 1, 1)
    assert got[4]["pii_total"] == 3 and got[4]["flagged"]


def test_card_luhn_screen_and_redact(spark):
    rows = [
        "pay 4532015112830366 now",          # Luhn-valid 16-digit
        "ref 4532015112830367 here",         # invalid (last digit off)
        "id 79927398713 ok",                 # Luhn-valid 11-digit: NOT 13-16
        "num 12345678901234567 long",        # 17 digits: no match at all
    ]
    got = P.pii_screen(_docs(spark, rows)).orderBy("doc_id").collect()
    assert [r["n_ccard"] for r in got] == [1, 0, 0, 0]
    assert got[0]["flagged"] and not got[1]["flagged"]
    red = [r["redacted"] for r in
           P.pii_redact(_docs(spark, rows)).orderBy("doc_id").collect()]
    # redaction masks BOTH valid and invalid candidates (recall), but
    # leaves non-candidate runs alone
    assert red[0] == "pay <CARD> now"
    assert red[1] == "ref <CARD> here"
    assert red[2] == "id 79927398713 ok"
    assert red[3] == "num 12345678901234567 long"


def test_injected_cards_validate(spark):
    docs = spark.createDataFrame(
        [(i, "t", "s") for i in range(0, 48)],
        "doc_id long, text string, source string",
    )
    scr = {r["doc_id"]: r for r in
           P.pii_screen(P.with_synthetic_pii(docs)).collect()}
    for i in range(48):
        want = 1 if i % 6 == 0 else 0  # %8 injection is Luhn-INVALID
        assert scr[i]["n_ccard"] == want, i


def test_redact_masks_and_preserves_rest(spark):
    rows = ["ask bob@corp.net from 10.1.2.3 dial 555-123-4567 end"]
    out = P.pii_redact(_docs(spark, rows)).first()["redacted"]
    assert out == "ask <EMAIL> from <IP> dial <PHONE> end"


def test_redact_no_cross_class_rematch(spark):
    # an email whose local part looks numeric must not leave a
    # phone/ip-matchable residue after masking
    rows = ["x 555-123-4567@example.com y", "10.1.2.3@mail.org"]
    outs = [r["redacted"] for r in
            P.pii_redact(_docs(spark, rows)).orderBy("doc_id").collect()]
    assert outs[0] == "x <EMAIL> y"
    assert outs[1] == "<EMAIL>"


def test_phone_and_ip_word_boundaries(spark):
    rows = [
        "v1.2.3.4.5 is a version not an ip",   # 5 dotted groups: \b..\b
        "id 1234-567-8901 not a phone (4-digit lead)",
    ]
    got = P.pii_screen(_docs(spark, rows)).orderBy("doc_id").collect()
    # 1.2.3.4 inside v1.2.3.4.5: leading 'v' kills \b on the left for the
    # first octet start; the match anchored later picks 2.3.4.5
    assert got[0]["n_ipv4"] == 1
    assert got[1]["n_phone"] == 0


def test_injection_mirror_spark_vs_duckdb(spark):
    base = [(i, f"doc {i} body", "s") for i in range(60)]
    docs = spark.createDataFrame(base, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["text"]
        for r in P.with_synthetic_pii(docs).collect()
    }
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", base)
    expr = P.with_synthetic_pii_sql_expr()
    want = dict(con.sql(
        f"SELECT doc_id, {expr} FROM documents ORDER BY doc_id"
    ).fetchall())
    assert got == want
    # every class actually occurs in the injected corpus
    scr = P.pii_screen(P.with_synthetic_pii(docs))
    tot = scr.agg(F.sum("n_email"), F.sum("n_ipv4"), F.sum("n_phone"),
                  F.sum("n_ccard")).first()
    assert all(v > 0 for v in tot)


def test_redaction_idempotent(spark):
    docs = P.with_synthetic_pii(
        _docs(spark, [f"body {i} text" for i in range(30)]).withColumn(
            "doc_id", F.col("doc_id")
        )
    )
    once = P.pii_redact(docs)
    twice = P.pii_redact(once.select("doc_id", "source",
                                     F.col("redacted").alias("text")))
    assert once.orderBy("doc_id").collect() == twice.orderBy("doc_id").collect()


def test_redact_plan_no_shuffle_no_python(spark):
    docs = _docs(spark, ["a", "b"])
    plan = (
        P.pii_redact(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
