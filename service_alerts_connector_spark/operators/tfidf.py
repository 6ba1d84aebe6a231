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


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """BM25 document ranking for a fixed query-term set, in exact 64-bit
    integer arithmetic (k1=1.2, b=0.75) so the score is bit-identical
    across engines (same rationale as ``tfidf_top_terms``: no ``log`` /
    float whose last ulp differs per libm).

    The textbook log-idf is replaced by its argument — the Robertson odds
    ``(N - df + 0.5) / (df + 0.5)`` — which is a monotone transform, kept
    as the exact rational ``(2(N-df)+1) / (2df+1)`` and quantized to
    milli units; the tf saturation term is quantized to micro units.  The
    staged floor-divisions make the score a *defined* deterministic
    quantization of BM25 (each stage is exact integer math; bounds:
    N < 2^31 docs, doc_len < 10^7, tf < 4·10^6 keep every intermediate
    under 2^63 — re-scale idf to centi units beyond that).

    Scale shape: the term filter lands BEFORE any join (only
    ``len(query_terms)`` terms survive the tf explode), corpus length and
    doc count arrive via ONE scalar aggregate, and the final top-k is a
    TakeOrderedAndProject — no corpus-sized shuffle survives the filter.
    """
    toked = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks")
    ).select("doc", F.size("_toks").alias("doc_len"), "_toks")
    n_docs, total_len = toked.agg(
        F.count(F.lit(1)), F.sum("doc_len")
    ).first()  # bounded: TWO scalars to the driver
    avgdl_micro = (int(total_len) * 1_000_000) // int(n_docs)

    tf_df = term_frequencies(df, id_col, text_col)
    hits = tf_df.where(F.col("term").isin(list(query_terms)))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .withColumn(
            "idf_milli",
            F.expr(
                f"((2 * ({int(n_docs)} - df) + 1) * 1000) div (2 * df + 1)"
            ),
        )
        .withColumn(
            "sat_den_micro",
            F.expr(
                "tf * 1000000 + 300000 + "
                f"(doc_len * 900000000000 div {avgdl_micro})"
            ),
        )
        .withColumn(
            "sat_micro", F.expr("(tf * 2200000 * 1000000) div sat_den_micro")
        )
        .withColumn(
            "score_micro", F.expr("(idf_milli * sat_micro) div 1000")
        )
    )
    agg = scored.groupBy("doc").agg(
        F.sum("score_micro").alias("bm25_micro"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    return (
        agg.orderBy(F.desc("bm25_micro"), F.asc("doc"))
        .limit(k)
        .select(
            F.col("doc").alias(id_col),
            "bm25_micro",
            F.col("n_terms_hit").cast("int").alias("n_terms_hit"),
        )
    )


def pmi_top_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_top: int = 64,
    vocab_df_min: int = 5,
    min_pair_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k token pairs by document-level pointwise mutual information,
    with the vocabulary capped to the ``vocab_top`` most-frequent terms
    (df >= ``vocab_df_min``) — the standard restriction that keeps the
    per-document pair expansion bounded by |V ∩ doc|² instead of doc_len²
    at web scale.

    PMI's ``log`` is dropped (monotone); the odds ratio
    ``P(x,y)/(P(x)P(y)) = n_xy·N / (n_x·n_y)`` is quantized by staged
    integer division — ``((n_xy·10^6) div n_x · N) div n_y`` — each stage
    exact 64-bit math, deterministic across engines, safe for N < 9·10^12
    (n_xy ≤ n_x keeps the first stage ≤ 10^6).

    Scale shape: the vocab is a ≤``vocab_top``-row broadcast; the pair
    join is an equi-join on the doc id between two vocab-restricted
    postings (each ≤ vocab_top rows per doc); counts shuffle on the
    (t1, t2) pair key; final top-k is TakeOrderedAndProject.
    """
    tf_df = term_frequencies(df, id_col, text_col)
    posting = tf_df.select("doc", "term")  # already distinct per (doc,term)
    n_docs = df.count()  # bounded: ONE scalar
    vocab = (
        posting.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= vocab_df_min)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(vocab_top)
    )
    vp = posting.join(F.broadcast(vocab), "term").select("doc", "term", "df")
    left = vp.select(
        "doc", F.col("term").alias("t1"), F.col("df").alias("n_x")
    )
    right = vp.select(
        "doc", F.col("term").alias("t2"), F.col("df").alias("n_y")
    )
    pairs = (
        left.join(right, "doc")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count(F.lit(1)).alias("n_xy"),
            F.first("n_x").alias("n_x"),
            F.first("n_y").alias("n_y"),
        )
        .where(F.col("n_xy") >= min_pair_count)
        .withColumn(
            "pmi_micro",
            F.expr(f"((n_xy * 1000000) div n_x * {int(n_docs)}) div n_y"),
        )
    )
    return (
        pairs.orderBy(F.desc("pmi_micro"), F.asc("t1"), F.asc("t2"))
        .limit(k)
        .select("t1", "t2", "n_xy", "n_x", "n_y", "pmi_micro")
    )
