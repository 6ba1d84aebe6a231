"""Document chunking, per-source quota, TF-IDF, inverted index."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.chunking import (
    chunk_documents,
    source_quota,
)
from service_alerts_connector_spark.operators.tfidf import (
    inverted_index,
    tfidf_top_terms,
)


def _txt(n: int) -> str:
    return " ".join(f"t{i}" for i in range(n))


def test_chunk_windows_cover_without_redundant_tail(spark):
    df = spark.createDataFrame(
        [(1, _txt(10)), (2, _txt(3)), (3, ""), (4, _txt(5))],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=5, overlap_tokens=2)
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in out.collect()
    }
    # doc 1: 10 tokens, step 3 -> chunks at 0,3,6 (last covers to the end)
    assert rows[(1, 0)] == ("t0 t1 t2 t3 t4", 5)
    assert rows[(1, 1)] == ("t3 t4 t5 t6 t7", 5)
    assert rows[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert (1, 3) not in rows
    # short doc -> single chunk; empty doc -> no chunks; exact fit -> one
    assert rows[(2, 0)] == ("t0 t1 t2", 3)
    assert not any(d == 3 for d, _ in rows)
    assert rows[(4, 0)] == ("t0 t1 t2 t3 t4", 5)
    assert (4, 1) not in rows


def test_chunk_overlap_reconstructs_document(spark):
    df = spark.createDataFrame([(7, _txt(100))], "doc_id long, text string")
    out = (
        chunk_documents(df, chunk_tokens=16, overlap_tokens=4)
        .orderBy("chunk_idx")
        .collect()
    )
    step = 12
    rebuilt: list[str] = []
    for r in out:
        toks = r["chunk_text"].split(" ")
        rebuilt.extend(toks if r["chunk_idx"] == 0 else toks[4:])
    # overlapping windows stitch back to the original token stream
    assert rebuilt == _txt(100).split(" ")
    assert out[0]["chunk_idx"] == 0 and len(out) == 1 + -(-(100 - 16) // step)


def test_source_quota_deterministic_cap(spark):
    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_quota(df, "source", "doc_id", quota=4)
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"s0": 4, "s1": 4, "s2": 4}
    # stable across runs (hash order, not partition order)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in source_quota(df, quota=4).collect())
    assert a == b
    assert out.where(F.col("quota_rank") > 4).count() == 0


def test_tfidf_ranks_distinctive_terms_first(spark):
    df = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common yak yak"),
            (3, "common plain"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # the corpus-wide 'common' term never outranks a doc-unique term
    assert top == {1: "zebra", 2: "yak", 3: "plain"}


def test_inverted_index_cap_and_df(spark):
    df = spark.createDataFrame(
        [(i, "shared unique%d" % i) for i in range(30)],
        "doc_id long, text string",
    )
    out = inverted_index(df, min_df=2, posting_cap=10).collect()
    assert len(out) == 1  # only 'shared' reaches min_df
    row = out[0]
    assert row["term"] == "shared" and row["df"] == 30
    assert row["posting_preview"] == ",".join(str(i) for i in range(10))
