"""TF-IDF term scoring and a capped inverted index over the corpus.

Classic corpus statistics a data-curation pipeline needs (salient-term
extraction for topic filtering, posting lists for term lookup), expressed
as explode + groupBy aggregations — every stage shuffles on a key
(``term`` or the doc id), never collects the corpus, so the plan is the
same at sf0.001 and 100 TB.

Determinism / engine portability: the idf factor is kept as *integer*
arithmetic — ``score_micro = (tf × 1_000_000 × n_docs) div (df × doc_len)``
— instead of a floating ``log``: Java's and DuckDB's ``ln`` may differ in
the last ulp and flip a rounding boundary, while 64-bit integer multiply /
floor-divide is bit-identical everywhere.  Rankings from the rational
score are the same as from ``tf/len × n/df`` (monotone transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from service_alerts_connector_spark.functions.text import tokens


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term, tf, doc_len) — one explode + one groupBy(doc, term).
    ``doc_len`` rides along via first() (constant within the group)."""
    toked = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks")
    ).withColumn("doc_len", F.size("_toks"))
    return (
        toked.select("doc", "doc_len", F.explode("_toks").alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("doc_len").alias("doc_len"))
    )


def document_frequencies(tf_df: DataFrame) -> DataFrame:
    """(term, df) from the term-frequency table — (doc, term) is already
    distinct there, so this is a plain count per term."""
    return tf_df.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` salient terms per document by the integer tf-idf score,
    ties broken by term text.  Scale: shuffles on (doc, term), term, doc —
    all high-cardinality keys; the per-doc top-k is a window row_number
    (streaming rank, no per-group array)."""
    n_docs = df.count()  # bounded: ONE scalar to the driver
    tf_df = term_frequencies(df, id_col, text_col)
    dfreq = document_frequencies(tf_df).where(F.col("df") >= min_df)
    scored = (
        tf_df.join(dfreq, "term")
        .withColumn(
            "_num",
            (F.col("tf") * F.lit(1_000_000) * F.lit(n_docs)).cast("bigint"),
        )
        .withColumn("_den", (F.col("df") * F.col("doc_len")).cast("bigint"))
        # `div` is Spark's exact 64-bit integer division (DuckDB: `//`) —
        # NOT floor(double/double), whose rounded quotient can cross an
        # integer boundary and disagree with the oracle by 1.
        .withColumn("score_micro", F.expr("_num div _den"))
    )
    w = Window.partitionBy("doc").orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col),
            "rank",
            "term",
            "tf",
            "df",
            "score_micro",
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    posting_cap: int = 20,
) -> DataFrame:
    """(term, df, posting_preview) — document frequency plus the first
    ``posting_cap`` doc ids (numeric order) as a comma-joined string.  The
    cap bounds the row size (the same degenerate-bucket discipline as the
    LSH pair expansion); ``df`` keeps the true count, so truncation is
    visible, never silent."""
    tf_df = term_frequencies(df, id_col, text_col)
    return (
        tf_df.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_set("doc")), 1, posting_cap),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("posting_preview"),
        )
        .where(F.col("df") >= min_df)
    )
