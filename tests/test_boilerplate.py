"""PII redaction, repetition metrics, and boilerplate-line removal."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.functions.text import (
    dup_token_ratio,
    pii_count,
    redact_pii,
    tokens,
)
from service_alerts_connector_spark.operators.boilerplate import (
    frequent_lines,
    remove_frequent_lines,
)


def test_redact_pii_all_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.smith+x@corp.example.org today"),
            (2, "see https://a.example/path?q=1#frag now"),
            (3, "call +27 (21) 400-1234 please"),
            (4, "no pii here at all"),
            (5, "u@d.io and http://x.io/u@d.io"),  # email inside URL -> URL wins
        ],
        "id long, t string",
    )
    out = {
        r["id"]: (r["red"], r["n"])
        for r in df.select(
            "id",
            redact_pii(F.col("t")).alias("red"),
            pii_count(F.col("t")).alias("n"),
        ).collect()
    }
    assert out[1] == ("mail me at <EMAIL> today", 1)
    assert out[2] == ("see <URL> now", 1)
    assert out[3] == ("call <PHONE> please", 1)
    assert out[4] == ("no pii here at all", 0)
    assert out[5] == ("<EMAIL> and <URL>", 2)


def test_dup_token_ratio(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a a a a"), (3, "a b a b"), (4, "")],
        "id long, t string",
    )
    got = {
        r["id"]: r["r"]
        for r in df.select(
            "id", dup_token_ratio(tokens(F.col("t"))).alias("r")
        ).collect()
    }
    assert got == {1: 0.0, 2: 0.75, 3: 0.5, 4: 0.0}


def _mk_docs(spark):
    footer = "(c) FOOTER"
    rows = [(i, f"unique line {i}\n{footer}\nbody {i % 2}") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, body string"), footer


def test_frequent_lines_threshold(spark):
    docs, footer = _mk_docs(spark)
    freq = {
        r["line"]: r["n_docs"]
        for r in frequent_lines(docs, "doc_id", "body", min_doc_frac=0.2).collect()
    }
    # footer in 10/10 docs; "body 0"/"body 1" in 5/10 each (>= 20%);
    # unique lines fall below the 2-doc threshold
    assert freq == {footer: 10, "body 0": 5, "body 1": 5}


def test_remove_frequent_lines_keeps_order_and_rows(spark):
    docs, _ = _mk_docs(spark)
    out = {
        r["doc_id"]: r["cleaned"]
        for r in remove_frequent_lines(
            docs, "doc_id", "body", min_doc_frac=0.6
        ).collect()
    }
    assert len(out) == 10  # row count preserved
    assert out[3] == "unique line 3\nbody 1"  # only the 10/10 footer dropped


def test_remove_all_lines_yields_empty_string(spark):
    docs = spark.createDataFrame(
        [(i, "SAME") for i in range(4)], "doc_id long, body string"
    )
    out = remove_frequent_lines(docs, "doc_id", "body", min_doc_frac=0.5).collect()
    assert {r["cleaned"] for r in out} == {""}
    assert len(out) == 4
