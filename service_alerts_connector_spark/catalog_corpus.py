"""Catalog — corpus-preparation operators: document chunking, per-source
quota sampling, TF-IDF salient terms, and a capped inverted index.

Every query is DuckDB-oracled.  Determinism notes (catalog.py rules):
token arrays use the shared ``tokens()`` convention (trim/lower/split on
whitespace, empty → []); tf-idf keeps the idf factor in exact 64-bit
integer arithmetic (``div`` / ``//``) rather than a floating ``log`` whose
last-ulp behaviour differs per libm; posting lists are numeric-sorted,
capped, and comma-joined so the driver canonicalizer can hash them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _t
from service_alerts_connector_spark.operators.chunking import (
    chunk_documents,
    source_quota,
)
from service_alerts_connector_spark.operators.tfidf import (
    inverted_index,
    tfidf_top_terms,
)

# DuckDB rendering of functions/text.py tokens()
_TOKS = (
    "CASE WHEN trim(lower(text)) IS NULL OR trim(lower(text)) = '' "
    "THEN [] ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)


# ---------------------------------------------------------------------------
# Fixed-size overlapping token windows (tokenizer stride convention)
# ---------------------------------------------------------------------------
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", chunk_tokens=16, overlap_tokens=4
    )


SQL_CHUNKING = f"""
WITH sized AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
), counted AS (
  SELECT doc_id, toks,
         CASE WHEN n <= 0 THEN 0
              WHEN n <= 16 THEN 1
              ELSE 1 + CAST(ceil(CAST(n - 16 AS DOUBLE) / 12) AS INTEGER)
         END AS n_chunks
  FROM sized
), exploded AS (
  SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_idx FROM counted
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(toks, chunk_idx * 12 + 1, chunk_idx * 12 + 16),
                       ' ') AS chunk_text,
       CAST(len(list_slice(toks, chunk_idx * 12 + 1, chunk_idx * 12 + 16))
            AS INTEGER) AS n_chunk_tokens
FROM exploded
"""


# ---------------------------------------------------------------------------
# Per-source quota (deterministic hash-order subset)
# ---------------------------------------------------------------------------
def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return source_quota(docs, "source", "doc_id", quota=40)


SQL_SOURCE_QUOTA = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS quota_rank
  FROM documents
)
SELECT doc_id, source, CAST(quota_rank AS INTEGER) AS quota_rank
FROM ranked WHERE quota_rank <= 40
"""


# ---------------------------------------------------------------------------
# TF-IDF salient terms (integer-rational idf — engine-portable)
# ---------------------------------------------------------------------------
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, "doc_id", "text", k=3, min_df=1)
    return out.withColumnRenamed("rank", "term_rank")


SQL_TFIDF = f"""
WITH sized AS (
  SELECT doc_id AS doc, toks, len(toks) AS doc_len
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
), tf AS (
  SELECT doc, term, count(*) AS tf, max(doc_len) AS doc_len
  FROM (SELECT doc, doc_len, unnest(toks) AS term FROM sized)
  GROUP BY doc, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT t.doc, t.term, t.tf, d.df,
         (CAST(t.tf AS BIGINT) * 1000000 *
          (SELECT count(*) FROM documents))
         // (CAST(d.df AS BIGINT) * CAST(t.doc_len AS BIGINT)) AS score_micro
  FROM tf t JOIN dfreq d USING (term)
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc ORDER BY score_micro DESC, term ASC
  ) AS term_rank
  FROM scored
)
SELECT doc AS doc_id, CAST(term_rank AS INTEGER) AS term_rank,
       term, tf, df, score_micro
FROM ranked WHERE term_rank <= 3
"""


# ---------------------------------------------------------------------------
# Inverted index (df + capped numeric-sorted posting preview)
# ---------------------------------------------------------------------------
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return inverted_index(docs, "doc_id", "text", min_df=2, posting_cap=20)


SQL_INVERTED = f"""
WITH tf AS (
  SELECT doc, term, count(*) AS tf
  FROM (
    SELECT doc_id AS doc, unnest({_TOKS}) AS term FROM documents
  )
  GROUP BY doc, term
)
SELECT term, count(*) AS df,
       array_to_string(
         list_transform(list_slice(list_sort(list(doc)), 1, 20),
                        d -> CAST(d AS VARCHAR)),
         ',') AS posting_preview
FROM tf GROUP BY term HAVING count(*) >= 2
"""


CORPUS_QUERIES = {
    "doc_chunking": q_doc_chunking,
    "source_quota": q_source_quota,
    "tfidf_top_terms": q_tfidf_top_terms,
    "inverted_index": q_inverted_index,
}

CORPUS_ORACLES = {
    "doc_chunking": SQL_CHUNKING,
    "source_quota": SQL_SOURCE_QUOTA,
    "tfidf_top_terms": SQL_TFIDF,
    "inverted_index": SQL_INVERTED,
}
