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

# DuckDB rendering of functions/text.py word_shingles_of(k=3) over a
# token-array column named ``t`` (shorter than k → one whole-text
# shingle).  The ONE shared shingle fragment: catalog_text composes it
# over its raw-split tokens, catalog_novelty over ``_TOKS`` — the
# tokenizations intentionally differ on empty/NULL text (raw split of
# '' is [''] → shingle ['']; _TOKS is [] → shingle [NULL], and DuckDB's
# array_to_string([]) is NULL, not ''), so only the SHINGLING is
# shared, never a merged tokenizer.
_SHINGLES_OF_T = (
    "CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')] "
    "ELSE list_transform(range(len(t) - 2), "
    "i -> array_to_string(t[i+1:i+3], ' ')) END"
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


# ---------------------------------------------------------------------------
# SCD2 history from the event changelog (runs of event_type per user)
# ---------------------------------------------------------------------------
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 validity intervals over each user's event_type runs.
    Timestamps surface as formatted strings (catalog determinism rules);
    the open current interval surfaces as the literal 'current'."""
    from service_alerts_connector_spark.operators.scd import scd2_from_changelog

    ev = _t(spark, sf_dir, "events")
    hist = scd2_from_changelog(
        ev, key_col="user_id", attr_col="event_type",
        ts_col="ts", tiebreak_col="event_id",
    )
    return hist.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("current")
        ).alias("valid_to"),
        "version",
    )


SQL_SCD2 = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(ts) OVER w AS prev_ts,
         lag(event_type) OVER w AS prev_attr
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), points AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered
  WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_attr
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S'),
                'current') AS valid_to,
       CAST(row_number() OVER w2 AS INTEGER) AS version
FROM points
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


# ---------------------------------------------------------------------------
# Embedding L2 normalization (unit-vector summary scalars)
# ---------------------------------------------------------------------------
def q_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm + summary scalars of the unit vector per embedding.  The unit
    vector itself is array-typed (driver canonicalizer cannot hash arrays —
    the a1 lesson), so the oracled surface is (norm, sum, min, max) of the
    normalized components, each a left-assoc fold rounded to 6 dp."""
    from service_alerts_connector_spark.functions.vectors import (
        normalize_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings")
    out = normalize_embeddings(emb)
    u = F.col("unit")
    return out.select(
        "vec_id",
        F.round("norm", 6).alias("norm6"),
        F.round(
            F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("sum_unit6"),
        F.round(F.array_min(u), 6).alias("min_unit6"),
        F.round(F.array_max(u), 6).alias("max_unit6"),
    )


SQL_EMB_NORM = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), normed AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM base
), unit AS (
  SELECT vec_id, norm,
         CASE WHEN norm = 0 THEN v
              ELSE list_transform(v, x -> x / norm) END AS u
  FROM normed
)
SELECT vec_id,
       round(norm, 6) AS norm6,
       round(list_aggregate(u, 'sum'), 6) AS sum_unit6,
       round(list_aggregate(u, 'min'), 6) AS min_unit6,
       round(list_aggregate(u, 'max'), 6) AS max_unit6
FROM unit
"""


# ---------------------------------------------------------------------------
# Dimension-wise corpus statistics (exact µ-scaled integer sums)
# ---------------------------------------------------------------------------
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from service_alerts_connector_spark.functions.vectors import dim_stats_micro

    emb = _t(spark, sf_dir, "embeddings")
    return dim_stats_micro(emb)


SQL_DIM_STATS = """
WITH cell AS (
  SELECT dim - 1 AS dim,
         CAST(round(x * 1000000) AS BIGINT) AS micro
  FROM (
    SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
           generate_subscripts(embedding, 1) AS dim
    FROM embeddings
  )
)
SELECT CAST(dim AS INTEGER) AS dim, count(*) AS n,
       CAST(sum(micro) AS BIGINT) AS sum_micro, min(micro) AS min_micro,
       max(micro) AS max_micro
FROM cell GROUP BY dim
"""


# ---------------------------------------------------------------------------
# Sequence packing — token-budget bin assignment per source shard
# ---------------------------------------------------------------------------
def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from service_alerts_connector_spark.operators.chunking import pack_bins
    from service_alerts_connector_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_bins(docs, "source", "doc_id", "n_tokens", capacity=256)


SQL_PACK = f"""
WITH sized AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS INTEGER) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM sized
)
SELECT doc_id, source, n_tokens,
       cum_before // 256 AS bin_idx,
       cum_before % 256 AS offset_in_bin
FROM cum
"""


# ---------------------------------------------------------------------------
# Count-min sketch — heavy-hitter estimates vs true counts
# ---------------------------------------------------------------------------
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point estimates for the 10 most frequent tokens, alongside the
    exact counts (est_n ≥ true_n is the sketch's one-sided guarantee,
    asserted in tests/test_batch_f.py).

    The global top-10 is ``orderBy(...).limit(10)`` — Catalyst plans
    TakeOrderedAndProject (each partition keeps 10 candidates, driver
    merges), NOT a single-partition row_number window: at web-corpus
    scale the vocabulary aggregate has 10⁸+ terms and an unpartitioned
    WindowExec would sort all of them in one task.  The DuckDB oracle
    keeps its row_number formulation (fine single-node).  Pinned by
    tests/test_plan_shapes.py::test_no_unpartitioned_window_in_catalog.
    """
    from service_alerts_connector_spark.functions.text import tokens
    from service_alerts_connector_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )
    from service_alerts_connector_spark.operators.topk import top_k

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    sketch = count_min_sketch(toks, "term", depth=3, width=256)
    true = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_n"))
    top = top_k(true, [F.desc("true_n"), F.asc("term")], 10)
    est = cms_estimate(sketch, top.select("term"), "term", depth=3, width=256)
    return top.join(est, "term").select("term", "true_n", "est_n")


SQL_CMS = f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS term FROM documents
), cells AS (
  SELECT j.row AS row,
         CAST(('0x' || substr(md5('cms' || CAST(j.row AS VARCHAR) || ':' || term), 1, 8))::BIGINT
              % 256 AS BIGINT) AS col,
         1::BIGINT AS w
  FROM toks, (SELECT unnest([0, 1, 2]) AS row) j
), sketch AS (
  SELECT row, col, CAST(sum(w) AS BIGINT) AS cnt FROM cells GROUP BY row, col
), true_counts AS (
  SELECT term, count(*) AS true_n FROM toks GROUP BY term
), top AS (
  SELECT term, true_n,
         row_number() OVER (ORDER BY true_n DESC, term ASC) AS rn
  FROM true_counts QUALIFY rn <= 10
), probe AS (
  SELECT t.term, j.row AS row,
         CAST(('0x' || substr(md5('cms' || CAST(j.row AS VARCHAR) || ':' || t.term), 1, 8))::BIGINT
              % 256 AS BIGINT) AS col
  FROM top t, (SELECT unnest([0, 1, 2]) AS row) j
)
SELECT p.term, t.true_n, min(coalesce(s.cnt, 0)) AS est_n
FROM probe p
JOIN top t ON t.term = p.term
LEFT JOIN sketch s ON s.row = p.row AND s.col = p.col
GROUP BY p.term, t.true_n
"""


# ---------------------------------------------------------------------------
# Source mixing — config-driven deterministic downsampling
# ---------------------------------------------------------------------------
def q_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rates derived from the source name (srcN keeps
    (N mod 10 + 1) × 6000 / 65536 ≈ 9%..92%) — the config is a broadcast
    table in Spark and a CTE in the oracle, same integer bounds."""
    from service_alerts_connector_spark.operators.sketches import source_mixing

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    config = (
        docs.select("source")
        .distinct()
        .withColumn(
            "keep_per_65536",
            (
                (F.substring("source", 4, 10).cast("int") % 10 + 1) * 6000
            ).cast("long"),
        )
    )
    return source_mixing(docs, config, "source", "doc_id", seed="mix-v1")


SQL_SOURCE_MIXING = """
WITH config AS (
  SELECT source,
         CAST(((CAST(substr(source, 4) AS INTEGER) % 10 + 1) * 6000) AS BIGINT)
           AS keep_per_65536
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT d.doc_id, d.source, c.keep_per_65536
FROM documents d JOIN config c USING (source)
WHERE ('0x' || substr(md5('mix-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
      < c.keep_per_65536
"""


# ---------------------------------------------------------------------------
# Quality deciles — curriculum binning per source (never a global window)
# ---------------------------------------------------------------------------
def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) over the quality score WITHIN each source — partitioned
    binning parallelizes across sources where a corpus-global ntile would
    be a single-partition sort (the scale rule pinned for pack_bins)."""
    from service_alerts_connector_spark.functions.text import quality_score
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    )
    w = Window.partitionBy("source").orderBy(F.asc("quality"), F.asc("doc_id"))
    return scored.withColumn("decile", F.ntile(10).over(w))


SQL_QUALITY_DECILES = r"""
WITH s AS (
  SELECT doc_id, source,
         CAST(CASE WHEN trim(lower(text)) = '' OR text IS NULL THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS DOUBLE) AS n_tokens,
         CAST(coalesce(length(text), 0) AS DOUBLE) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) AS n_punct
  FROM documents
), scored AS (
  SELECT doc_id, source,
         round((n_tokens * 5.0) / (n_chars + 1.0) - (n_punct / (n_chars + 1.0)), 6)
           AS quality
  FROM s
)
SELECT doc_id, source, quality,
       CAST(ntile(10) OVER (
         PARTITION BY source ORDER BY quality ASC, doc_id ASC
       ) AS INTEGER) AS decile
FROM scored
"""


# ---------------------------------------------------------------------------
# BPE-ish token counting (token-budget estimation without the tokenizer)
# ---------------------------------------------------------------------------
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge step as exact distributed dataflow: count
    adjacent token-pair frequencies over the corpus and emit the top-20
    merge candidates (the argmax row IS the next merge; iterating this
    step = BPE vocabulary induction).  Completes the iterative-training
    tier beside `kmeans_update` (assignment/update) and the PageRank
    recurrence — every "training" loop in the engine is a deterministic
    integer dataflow step.

    Scale shape: tokens are MATERIALIZED in a projection before the pair
    lambda (transform-captured expressions re-evaluate per element — the
    engine-wide rule), the pair explode is narrow O(tokens), and the only
    shuffle is the map-side-combined groupBy(a, b), bounded by the
    observed-bigram vocabulary; top-k is TakeOrderedAndProject.
    """
    from service_alerts_connector_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.col("text")).alias("t")).where(
        F.size("t") > 1
    )
    pairs = toks.select(
        F.expr(
            "explode(transform(slice(t, 2, size(t) - 1),"
            " (x, i) -> struct(t[i] AS a, x AS b)))"
        ).alias("p")
    )
    return (
        pairs.select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


SQL_BPE_MERGE_STEP = r"""
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents
  WHERE text IS NOT NULL AND trim(lower(text)) <> ''
), pairs AS (
  SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b
  FROM toks WHERE len(t) > 1
)
SELECT a, b, count(*) AS freq
FROM pairs GROUP BY a, b
ORDER BY freq DESC, a ASC, b ASC
LIMIT 20
"""


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from service_alerts_connector_spark.functions.text import (
        bpe_ish_token_count,
        token_count,
        tokens_per_word_micro,
    )

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        bpe_ish_token_count(t).alias("n_bpe"),
        token_count(t).alias("n_words"),
        tokens_per_word_micro(t).alias("fertility_micro"),
    )


SQL_BPE_TOKENS = r"""
WITH counted AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
              AS INTEGER) AS n_bpe,
         CASE WHEN trim(lower(text)) = '' OR text IS NULL THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\s+'))
         END AS n_words
  FROM documents
)
SELECT doc_id, n_bpe, CAST(n_words AS INTEGER) AS n_words,
       CASE WHEN n_words <= 0 THEN 0
            ELSE (CAST(n_bpe AS BIGINT) * 1000000) // CAST(n_words AS BIGINT)
       END AS fertility_micro
FROM counted
"""


# ---------------------------------------------------------------------------
# Length-outlier filter — per-source percentile bounds (p05..p95)
# ---------------------------------------------------------------------------
def q_length_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs whose token count sits inside their source's [p05, p95] band.
    Bounds come from a per-SOURCE exact percentile (each source's values
    aggregate independently — never one corpus-wide buffer) joined back by
    broadcast; a 100 TB deployment swaps ``percentile`` for
    ``approx_percentile`` with no plan change (documented trade: exact
    cross-engine bounds vs bounded memory)."""
    from service_alerts_connector_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    # sized (a regex-heavy token-count pass over every text) feeds BOTH
    # the per-source percentile bounds and the band-filter probe —
    # different first exchanges, so the pass ran twice unpinned; the
    # pinned frame is 3 narrow columns (r15, guide §1.2; same class as
    # the corpus_curation gate pin)
    sized = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    ).localCheckpoint(eager=False)
    bounds = sized.groupBy("source").agg(
        F.round(F.expr("percentile(n_tokens, 0.05)"), 4).alias("p05"),
        F.round(F.expr("percentile(n_tokens, 0.95)"), 4).alias("p95"),
    )
    return (
        sized.join(F.broadcast(bounds), "source")
        .where(
            (F.col("n_tokens") >= F.col("p05"))
            & (F.col("n_tokens") <= F.col("p95"))
        )
        .select("doc_id", "source", "n_tokens", "p05", "p95")
    )


SQL_LENGTH_OUTLIER = f"""
WITH sized AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS INTEGER) AS n_tokens
  FROM documents
), bounds AS (
  SELECT source,
         round(quantile_cont(n_tokens, 0.05), 4) AS p05,
         round(quantile_cont(n_tokens, 0.95), 4) AS p95
  FROM sized GROUP BY source
)
SELECT s.doc_id, s.source, s.n_tokens, b.p05, b.p95
FROM sized s JOIN bounds b USING (source)
WHERE s.n_tokens >= b.p05 AND s.n_tokens <= b.p95
"""


# ---------------------------------------------------------------------------
# Per-label embedding centering stats (exact integers, no division)
# ---------------------------------------------------------------------------
def q_embedding_center_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-centering summary per (label, dim), scaled by the group size so
    everything stays in exact bigints: ``centered×n = micro×n − Σmicro``.
    A floating per-row mean subtraction would hinge on engines' division
    rounding; min/max are order-independent, so one aggregation yields
    deterministic spread-around-mean bounds at any partitioning."""
    emb = _t(spark, sf_dir, "embeddings")
    cell = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    ).select(
        "label", "dim", F.round(F.col("x") * 1_000_000).cast("bigint").alias("micro")
    )
    agg = cell.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("micro").alias("sum_micro"),
        F.min("micro").alias("min_micro"),
        F.max("micro").alias("max_micro"),
    )
    return agg.select(
        "label",
        "dim",
        "n",
        (F.col("min_micro") * F.col("n") - F.col("sum_micro")).alias(
            "min_centered_xn"
        ),
        (F.col("max_micro") * F.col("n") - F.col("sum_micro")).alias(
            "max_centered_xn"
        ),
    )


SQL_EMB_CENTER = """
WITH cell AS (
  SELECT label, dim - 1 AS dim,
         CAST(round(x * 1000000) AS BIGINT) AS micro
  FROM (
    SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
           generate_subscripts(embedding, 1) AS dim
    FROM embeddings
  )
), agg AS (
  SELECT label, dim, count(*) AS n, CAST(sum(micro) AS BIGINT) AS sum_micro,
         min(micro) AS min_micro, max(micro) AS max_micro
  FROM cell GROUP BY label, dim
)
SELECT label, CAST(dim AS INTEGER) AS dim, n,
       min_micro * n - sum_micro AS min_centered_xn,
       max_micro * n - sum_micro AS max_centered_xn
FROM agg
"""


# ---------------------------------------------------------------------------
# Sequential id assignment — two-phase bucketed (no global window)
# ---------------------------------------------------------------------------
def q_assign_seq_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hash-order ids over documents.  The bucket is the first BYTE
    of md5(key), so the engine's (bucket, hash, key) order equals the
    oracle's plain (hash, key) order — one global row_number in DuckDB,
    256 small windows in Spark."""
    from service_alerts_connector_spark.operators.chunking import (
        assign_sequential_ids,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return assign_sequential_ids(docs, "doc_id")


SQL_ASSIGN_SEQ = """
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       ) - 1 AS BIGINT) AS seq_id
FROM documents
"""


# ---------------------------------------------------------------------------
# Log-bucket quantile sketch — bounded-state length percentiles per language
# ---------------------------------------------------------------------------
def q_length_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 doc-length estimates per language from the mergeable
    log₂-bucket histogram (≤64 cells per group however many documents —
    the bounded-shuffle alternative to exact per-group sorts; ≤2×
    overestimate by construction, asserted vs exact percentiles in
    tests/test_sketches.py)."""
    from service_alerts_connector_spark.operators.sketches import (
        histogram_quantiles,
    )

    docs = _t(spark, sf_dir, "documents")
    return histogram_quantiles(docs, "n_chars", ["lang"]).orderBy("lang")


def _sql_length_quantiles() -> str:
    from service_alerts_connector_spark.operators.sketches import (
        histogram_quantiles_sql,
    )

    return (
        histogram_quantiles_sql("documents", "n_chars", ["lang"])
        + " ORDER BY lang"
    )


# ---------------------------------------------------------------------------
# Passage-level dedup — sub-document first-occurrence-wins
# ---------------------------------------------------------------------------
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide passage dedup (8-token windows): every distinct passage
    survives exactly once — at its lowest (doc_id, chunk_idx) — and docs
    are reassembled from their surviving passages
    (`operators/textdedup.py passage_dedup`)."""
    from service_alerts_connector_spark.operators.textdedup import (
        passage_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    return passage_dedup(docs, passage_tokens=8)


SQL_PASSAGE_DEDUP = f"""
WITH sized AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
), counted AS (
  SELECT doc_id, toks,
         CASE WHEN n <= 0 THEN 0
              WHEN n <= 8 THEN 1
              ELSE 1 + CAST(ceil(CAST(n - 8 AS DOUBLE) / 8) AS INTEGER)
         END AS n_chunks
  FROM sized
), exploded AS (
  SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_idx FROM counted
), passages AS (
  SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         array_to_string(
           list_slice(toks, chunk_idx * 8 + 1, chunk_idx * 8 + 8), ' '
         ) AS chunk_text
  FROM exploded
), first_occ AS (
  SELECT doc_id, chunk_idx, chunk_text,
         row_number() OVER (
           PARTITION BY md5(chunk_text) ORDER BY doc_id, chunk_idx
         ) AS rn
  FROM passages
)
SELECT doc_id,
       string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text,
       CAST(count(*) AS BIGINT) AS n_passages_kept
FROM first_occ WHERE rn = 1
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Substring-level exact dedup — rolling k-token duplicate-span screen
# ---------------------------------------------------------------------------
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicate-substring audit (rolling 8-token shingles,
    corpus-wide first-occurrence-wins, interval-union span coverage) —
    `operators/textdedup.py duplicate_substring_spans`."""
    from service_alerts_connector_spark.operators.textdedup import (
        duplicate_substring_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    return duplicate_substring_spans(docs, k=8)


SQL_DEDUP_SUBSTRING_SPANS = f"""
WITH sized AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
), sh AS (
  SELECT doc_id, toks, unnest(range(n - 7)) AS pos
  FROM sized WHERE n >= 8
), hashed AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(toks, pos + 1, pos + 8), ' ')) AS h
  FROM sh
), ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM hashed
), dup AS (
  SELECT doc_id, pos FROM ranked WHERE rn > 1
), brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
              THEN 1 ELSE 0 END AS b
  FROM dup
), isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS i
  FROM brk
), cov AS (
  SELECT doc_id, i, max(pos) + 8 - min(pos) AS c, count(*) AS nd
  FROM isl GROUP BY doc_id, i
), per_doc AS (
  SELECT doc_id, sum(c) AS dup_tokens, sum(nd) AS dup_shingles
  FROM cov GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n AS BIGINT) AS n_tokens,
       CAST(greatest(s.n - 7, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(p.dup_shingles, 0) AS BIGINT) AS dup_shingles,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(CASE WHEN s.n <= 0 THEN 0
            ELSE (coalesce(p.dup_tokens, 0) * 1000000) // s.n END
            AS BIGINT) AS dup_ratio_ppm
FROM sized s LEFT JOIN per_doc p USING (doc_id)
ORDER BY s.doc_id
"""


# ---------------------------------------------------------------------------
# Substring-span removal — the strip half of Lee-et-al substring dedup
# ---------------------------------------------------------------------------
def q_dedup_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reassemble every document with its duplicated 8-token spans
    deleted (first corpus-wide occurrence survives intact; fully-covered
    docs vanish) — `operators/textdedup.py strip_duplicate_spans`, the
    removal companion of `dedup_substring_spans`' audit."""
    from service_alerts_connector_spark.operators.textdedup import (
        strip_duplicate_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    return strip_duplicate_spans(docs, k=8)


SQL_DEDUP_SUBSTRING_STRIP = f"""
WITH sized AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
), sh AS (
  SELECT doc_id, toks, unnest(range(n - 7)) AS pos
  FROM sized WHERE n >= 8
), hashed AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(toks, pos + 1, pos + 8), ' ')) AS h
  FROM sh
), ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM hashed
), covered AS (
  SELECT DISTINCT doc_id, pos + t.x AS tp
  FROM ranked, range(0, 8) t(x) WHERE rn > 1
), tokpos AS (
  SELECT doc_id, n,
         unnest(toks) AS tok,
         unnest(generate_series(1, len(toks))) - 1 AS tp
  FROM sized WHERE n > 0
), kept AS (
  SELECT t.doc_id, t.n, t.tok, t.tp
  FROM tokpos t LEFT JOIN covered c
    ON c.doc_id = t.doc_id AND c.tp = t.tp
  WHERE c.doc_id IS NULL
)
SELECT doc_id,
       string_agg(tok, ' ' ORDER BY tp) AS text,
       CAST(count(*) AS BIGINT) AS n_tokens_kept,
       CAST(max(n) - count(*) AS BIGINT) AS n_tokens_dropped
FROM kept
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Span-level decontamination — excise benchmark spans from train docs
# ---------------------------------------------------------------------------
def q_decontaminate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete every 8-token window shared with the held-out split
    (doc_id % 10 = 0, the `ngram_decontamination` convention) from each
    train doc and reassemble — span-level leakage excision instead of
    whole-doc dropping (`operators/textdedup.py
    strip_contaminated_spans`)."""
    from service_alerts_connector_spark.operators.textdedup import (
        strip_contaminated_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    return strip_contaminated_spans(train, bench, k=8)


SQL_DECONTAMINATE_STRIP = f"""
WITH sized AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
), sh AS (
  SELECT doc_id, toks, unnest(range(n - 7)) AS pos
  FROM sized WHERE n >= 8
), hashed AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(toks, pos + 1, pos + 8), ' ')) AS h
  FROM sh
), bench AS (
  SELECT DISTINCT h FROM hashed WHERE doc_id % 10 = 0
), hit AS (
  SELECT t.doc_id, t.pos
  FROM hashed t JOIN bench b USING (h) WHERE t.doc_id % 10 <> 0
), covered AS (
  SELECT DISTINCT doc_id, pos + t.x AS tp FROM hit, range(0, 8) t(x)
), tokpos AS (
  SELECT doc_id, n,
         unnest(toks) AS tok,
         unnest(generate_series(1, len(toks))) - 1 AS tp
  FROM sized WHERE n > 0 AND doc_id % 10 <> 0
), kept AS (
  SELECT t.doc_id, t.n, t.tok, t.tp
  FROM tokpos t LEFT JOIN covered c
    ON c.doc_id = t.doc_id AND c.tp = t.tp
  WHERE c.doc_id IS NULL
)
SELECT doc_id,
       string_agg(tok, ' ' ORDER BY tp) AS text,
       CAST(count(*) AS BIGINT) AS n_tokens_kept,
       CAST(max(n) - count(*) AS BIGINT) AS n_tokens_dropped
FROM kept
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Vocabulary coverage curve — "how big a vocab covers X% of occurrences?"
# ---------------------------------------------------------------------------
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-frequency coverage curve by log₂-frequency magnitude: for each
    bucket b = bitlength(token count), the number of vocabulary types in
    it, their occurrence mass, and the cumulative vocab size / coverage if
    the vocab were cut below that bucket (rarest-token-first OOV planning).

    No global window (catalog rule): the cumulative step is a ≤64-row
    bucket self-theta-join after the counts collapse to one row per
    magnitude — the corpus-sized shuffle is only the token groupBy.
    Bit-length via ``bin()`` string length, not float log2 (exact-power
    boundaries).  Coverage in floored per-mille integers."""
    docs = _t(spark, sf_dir, "documents")
    from service_alerts_connector_spark.functions.text import tokens

    tok = docs.select(F.explode(tokens(F.col("text"))).alias("t"))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    buckets = (
        counts.select(F.length(F.bin(F.col("c"))).cast("int").alias("bucket"), "c")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("c").cast("long").alias("n_occ"),
        )
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.bucket") >= F.col("a.bucket"))
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(
            F.sum("b.n_types").cast("long").alias("cum_types"),
            F.sum("b.n_occ").cast("long").alias("cum_occ"),
        )
    )
    total = tok.agg(F.count(F.lit(1)).cast("long").alias("total_occ"))
    return (
        buckets.join(cum, "bucket")
        .join(F.broadcast(total))
        .select(
            "bucket",
            F.col("n_types").cast("long").alias("n_types"),
            "n_occ",
            "cum_types",
            "cum_occ",
            F.floor(1000 * F.col("cum_occ") / F.col("total_occ"))
            .cast("long")
            .alias("coverage_pm"),
        )
    )


SQL_VOCAB_COVERAGE = f"""
WITH tok AS (
  SELECT unnest({_TOKS}) AS t FROM documents
), counts AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), buckets AS (
  SELECT length(bin(c)) AS bucket,
         count(*) AS n_types, sum(c) AS n_occ
  FROM counts GROUP BY length(bin(c))
), cum AS (
  SELECT a.bucket, sum(b.n_types) AS cum_types, sum(b.n_occ) AS cum_occ
  FROM buckets a JOIN buckets b ON b.bucket >= a.bucket
  GROUP BY a.bucket
), total AS (
  SELECT count(*) AS total_occ FROM tok
)
SELECT bk.bucket,
       CAST(bk.n_types AS BIGINT) AS n_types,
       CAST(bk.n_occ AS BIGINT) AS n_occ,
       CAST(c.cum_types AS BIGINT) AS cum_types,
       CAST(c.cum_occ AS BIGINT) AS cum_occ,
       CAST(floor((1000 * c.cum_occ) / t.total_occ) AS BIGINT) AS coverage_pm
FROM buckets bk JOIN cum c USING (bucket) CROSS JOIN total t
"""


# ---------------------------------------------------------------------------
# Label-centroid cosine similarity — exact-integer class geometry
# ---------------------------------------------------------------------------
def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids —
    the class-geometry audit (which labels are confusable?) run before
    training a classifier on the embedding table.

    Determinism (catalog float rules): elements quantize to milli-units
    (floor(v·1000) — one exactly-rounded multiply then floor), so centroid
    sums, dots, and norms are EXACT bigints (≤2^45 at any corpus size that
    fits the milli budget); cosine is then sqrt/mul/div on exact integers —
    all IEEE exactly-rounded, bit-identical cross-engine.  Cosine is
    scale-invariant, so centroid SUMS stand in for means (no count
    division).  Shuffle census: one (label, dim) aggregation — ≤
    |labels|·dims cells — then label-pair joins on dimension-sized frames.
    """
    emb = _t(spark, sf_dir, "embeddings")
    el = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "v"),
    )
    cent = el.groupBy("label", "d").agg(
        F.sum(F.floor(F.col("v") * 1000).cast("long")).alias("cv")
    )
    norms = cent.groupBy("label").agg(
        F.sum(F.col("cv") * F.col("cv")).alias("norm2")
    )
    a = cent.select(
        F.col("label").alias("label_a"), "d", F.col("cv").alias("cva")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "d", F.col("cv").alias("cvb")
    )
    dots = (
        a.join(b, "d")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("cva") * F.col("cvb")).alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("norm2").alias("na2"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("norm2").alias("nb2"))
    return (
        dots.join(na, "label_a")
        .join(nb, "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
                6,
            ).alias("cosine"),
        )
    )


SQL_CENTROID_SIM = """
WITH el AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), cent AS (
  SELECT label, d, sum(CAST(floor(v * 1000) AS BIGINT)) AS cv
  FROM el GROUP BY label, d
), norms AS (
  SELECT label, sum(cv * cv) AS norm2 FROM cent GROUP BY label
), dots AS (
  SELECT a.label AS label_a, b.label AS label_b, sum(a.cv * b.cv) AS dot
  FROM cent a JOIN cent b ON a.d = b.d AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT d.label_a, d.label_b,
       round(d.dot / (sqrt(CAST(na.norm2 AS DOUBLE)) *
                      sqrt(CAST(nb.norm2 AS DOUBLE))), 6) AS cosine
FROM dots d
JOIN norms na ON na.label = d.label_a
JOIN norms nb ON nb.label = d.label_b
"""


# ---------------------------------------------------------------------------
# BM25 ranking (exact integer-rational quantization — engine-portable)
# ---------------------------------------------------------------------------
_BM25_TERMS = ("hash", "merge", "vector", "window")


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-docs for a fixed query-term set via the staged-integer
    quantization in ``operators/tfidf.py bm25_rank`` (odds-idf in milli
    units, tf saturation in micro units, k1=1.2 / b=0.75 as exact
    rationals) — no float, no log, bit-identical across engines."""
    from service_alerts_connector_spark.operators.tfidf import bm25_rank

    docs = _t(spark, sf_dir, "documents")
    return bm25_rank(docs, list(_BM25_TERMS), "doc_id", "text", k=12)


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

SQL_BM25 = f"""
WITH sized AS (
  SELECT doc_id AS doc, toks, len(toks) AS doc_len
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
), stats AS (
  SELECT count(*) AS n_docs,
         CAST((sum(doc_len) * 1000000) // count(*) AS BIGINT) AS avgdl_micro
  FROM sized
), tf AS (
  SELECT doc, term, count(*) AS tf, max(doc_len) AS doc_len
  FROM (SELECT doc, doc_len, unnest(toks) AS term FROM sized)
  GROUP BY doc, term
), hits AS (
  SELECT * FROM tf WHERE term IN ({_BM25_TERMS_SQL})
), dfreq AS (
  SELECT term, count(*) AS df FROM hits GROUP BY term
), scored AS (
  SELECT h.doc,
         (((2 * (s.n_docs - d.df) + 1) * 1000) // (2 * d.df + 1) *
          ((h.tf * 2200000 * 1000000) //
           (h.tf * 1000000 + 300000 +
            (h.doc_len * 900000000000) // s.avgdl_micro))) // 1000
         AS score_micro
  FROM hits h JOIN dfreq d USING (term) CROSS JOIN stats s
)
SELECT doc AS doc_id, CAST(sum(score_micro) AS BIGINT) AS bm25_micro,
       CAST(count(*) AS INTEGER) AS n_terms_hit
FROM scored GROUP BY doc
ORDER BY bm25_micro DESC, doc ASC LIMIT 12
"""


# ---------------------------------------------------------------------------
# PMI co-occurrence pairs (vocab-capped, staged-integer odds ratio)
# ---------------------------------------------------------------------------
def q_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token pairs by document-level PMI odds (log dropped — monotone)
    over a ≤64-term df-capped vocabulary; see
    ``operators/tfidf.py pmi_top_pairs`` for the scale shape."""
    from service_alerts_connector_spark.operators.tfidf import pmi_top_pairs

    docs = _t(spark, sf_dir, "documents")
    return pmi_top_pairs(
        docs, "doc_id", "text",
        vocab_top=64, vocab_df_min=5, min_pair_count=5, k=20,
    )


SQL_PMI = f"""
WITH posting AS (
  SELECT DISTINCT doc_id AS doc, term
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
), vocab AS (
  SELECT term, count(*) AS df FROM posting GROUP BY term
  HAVING count(*) >= 5 ORDER BY df DESC, term ASC LIMIT 64
), vp AS (
  SELECT p.doc, p.term, v.df FROM posting p JOIN vocab v USING (term)
), pairs AS (
  SELECT a.term AS t1, b.term AS t2, count(*) AS n_xy,
         max(a.df) AS n_x, max(b.df) AS n_y
  FROM vp a JOIN vp b ON a.doc = b.doc AND a.term < b.term
  GROUP BY a.term, b.term HAVING count(*) >= 5
)
SELECT t1, t2, n_xy, n_x, n_y,
       ((n_xy * 1000000) // n_x *
        (SELECT count(*) FROM documents)) // n_y AS pmi_micro
FROM pairs
ORDER BY pmi_micro DESC, t1 ASC, t2 ASC LIMIT 20
"""



# ---------------------------------------------------------------------------
# Deterministic weighted sample — hash-priority bottom-k (A-ES style)
# ---------------------------------------------------------------------------
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional corpus sample, fully deterministic and exact
    cross-engine — the "sample 1 % of a 100 TB corpus, longer docs
    proportionally more often" primitive for training-mixture construction.

    A-ES weighted reservoir sampling keys each row by u^(1/w); the
    float-free integer analogue here is ``priority = (hash * 10^6) div
    weight`` (md5-prefix hash → non-negative 32-bit int, weight = n_chars
    + 1), then global bottom-k on (priority, doc_id).  Non-negative
    operands make Spark's truncating ``div`` and DuckDB's flooring ``//``
    identical; the doc_id tiebreak totalizes the order.  Expected
    selection probability rises with weight exactly as A-ES does, and the
    same seed (the hash) reproduces the sample on any engine or cluster
    size.

    Scale shape: narrow projection + ``orderBy().limit(k)`` →
    TakeOrderedAndProject (per-partition partial top-k, k rows to the
    driver) — no global sort, no window, no shuffle of the corpus.
    """
    docs = _t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (
        docs.select(
            "doc_id",
            (F.col("n_chars") + F.lit(1)).cast("long").alias("weight"),
            h.alias("_h"),
        )
        .withColumn("priority", F.expr("(_h * 1000000) div weight"))
        .select("doc_id", "weight", "priority")
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(100)
    )


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id,
       CAST(n_chars + 1 AS BIGINT) AS weight,
       (('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         * 1000000) // CAST(n_chars + 1 AS BIGINT) AS priority
FROM documents
ORDER BY priority ASC, doc_id ASC
LIMIT 100
"""



# ---------------------------------------------------------------------------
# Largest-remainder quota allocation — exact apportionment of a budget
# ---------------------------------------------------------------------------
def q_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apportion a fixed sampling budget (10 000 slots) across sources
    proportionally to their document counts with the largest-remainder
    (Hamilton) method — the exact-integer allocator behind "build a 10k
    training mix that mirrors the corpus" (floats would drop or invent
    slots; this allocation sums to the budget EXACTLY by construction).

    base_i = n_i·B div N floors every share; the R = B − Σbase leftover
    slots go to the R largest remainders (n_i·B mod N, source tiebreak).
    The top-R pick is ``orderBy().limit(R)`` on the source-sized table —
    TakeOrderedAndProject, no unpartitioned window even though the frame
    is tiny (R itself comes from a one-row aggregate, crossJoin-broadcast
    like every scalar anchor in this catalog).  A final ``bonus``
    semi-join flags winners.

    Scale shape: ONE corpus-sized groupBy; everything after runs on the
    ≤|sources| table.  Output: per source, count, base, bonus flag,
    final allocation — allocations sum to 10 000 (pinned in pytest).
    """
    B = 10000
    docs = _t(spark, sf_dir, "documents")
    # weight by total characters (doc counts are uniform per source in
    # the synthetic corpus — char mass actually exercises the remainders)
    counts = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("n")
    )
    # "ntot", not "N": Spark resolves identifiers case-insensitively, so
    # a column named N collides with n
    total = counts.agg(F.sum("n").alias("ntot"))
    staged = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n",
        F.expr(f"(n * {B}) div ntot").alias("base"),
        F.expr(f"(n * {B}) % ntot").alias("rem"),
    )
    pool = staged.agg((F.lit(B) - F.sum("base")).cast("int").alias("R"))
    r = pool.collect()[0]["R"]
    winners = (
        staged.orderBy(F.desc("rem"), F.asc("source"))
        .limit(int(r))
        .select(F.col("source").alias("_ws"))
    )
    return (
        staged.join(
            winners, staged["source"] == winners["_ws"], "left"
        )
        .select(
            "source",
            "n",
            "base",
            F.col("_ws").isNotNull().alias("got_bonus"),
            (
                F.col("base")
                + F.when(F.col("_ws").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("allocation"),
        )
        .orderBy("source")
    )


SQL_QUOTA_ALLOCATION = """
WITH counts AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS n FROM documents GROUP BY source
), tot AS (
  SELECT sum(n) AS N FROM counts
), staged AS (
  SELECT c.source, c.n,
         (c.n * 10000) // t.N AS base,
         (c.n * 10000) % t.N AS rem
  FROM counts c, tot t
), pool AS (
  SELECT 10000 - sum(base) AS R FROM staged
), winners AS (
  SELECT source FROM staged, pool
  ORDER BY rem DESC, source ASC
  LIMIT (SELECT R FROM pool)
)
SELECT s.source, s.n, CAST(s.base AS BIGINT) AS base,
       w.source IS NOT NULL AS got_bonus,
       CAST(s.base + CASE WHEN w.source IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS allocation
FROM staged s LEFT JOIN winners w ON w.source = s.source
ORDER BY s.source
"""



# ---------------------------------------------------------------------------
# Positional phrase search — adjacency join over a positional index
# ---------------------------------------------------------------------------
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("table hash") via a positional inverted
    index — the IR capability a bag-of-words index (`inverted_index`)
    cannot answer: both terms must appear at ADJACENT positions.

    The positional postings build is one posexplode projection; the
    phrase match is an equi-join on (doc, position+1) restricted to the
    two query terms BEFORE the join (term selectivity does the pruning,
    so the join sides are posting-list-sized, never corpus-sized — the
    standard positional-index evaluation order).  Longer phrases chain
    one join per extra term.

    Output: matching docs with occurrence counts and the first match
    position, ordered by doc.  Scale shape: narrow scan + two tiny
    filtered frames + one equi-join; the only corpus-sized work is the
    tokenizer projection feeding the filters.
    """
    from service_alerts_connector_spark.functions.text import tokens

    t1, t2 = "table", "hash"
    docs = _t(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos0", "term"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    a = pos.where(F.col("term") == t1).select("doc_id", "pos")
    b = pos.where(F.col("term") == t2).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    hits = a.join(b, ["doc_id", "pos"])
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("pos").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


SQL_PHRASE_SEARCH = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) IS NULL OR trim(lower(text)) = ''
              THEN [] ELSE string_split_regex(trim(lower(text)), '\\s+')
         END AS l
  FROM documents
), pos AS (
  SELECT doc_id, unnest(l) AS term,
         unnest(generate_series(1, len(l))) AS pos
  FROM toks
), a AS (
  SELECT doc_id, pos FROM pos WHERE term = 'table'
), b AS (
  SELECT doc_id, pos - 1 AS pos FROM pos WHERE term = 'hash'
)
SELECT a.doc_id,
       count(*) AS n_occurrences,
       CAST(min(a.pos) AS BIGINT) AS first_pos
FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos
GROUP BY a.doc_id
ORDER BY a.doc_id
"""



# ---------------------------------------------------------------------------
# Feature hashing — the hashing trick with a collision audit
# ---------------------------------------------------------------------------
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick categorical encoding: map each (lang, source) pair
    into a fixed 256-bucket feature space via the md5-prefix hash, and
    AUDIT the collisions — the question every hashed feature pipeline
    must answer before trading a vocabulary for a fixed width.

    One distinct + one bucket groupBy; the audit reports buckets used,
    colliding buckets, distinct values lost to collisions, and the max
    pile-up.  Per-bucket row mass joins back so the report also says how
    many ROWS ride on colliding features (what actually hurts training).

    Cross-engine: the bloom_semi_join md5→int idiom; all counts exact.
    """
    docs = _t(spark, sf_dir, "documents")
    feat = docs.select(
        F.concat_ws("|", "lang", "source").alias("value")
    )
    hashed = feat.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fh:"), F.col("value"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 256,
    )
    per_bucket = hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )
    return per_bucket.agg(
        F.count(F.lit(1)).cast("long").alias("buckets_used"),
        F.sum(F.when(F.col("n_values") > 1, 1).otherwise(0))
        .cast("long")
        .alias("buckets_colliding"),
        F.sum(F.when(F.col("n_values") > 1, F.col("n_values") - 1).otherwise(0))
        .cast("long")
        .alias("values_lost"),
        F.max("n_values").cast("long").alias("max_pileup"),
        F.sum(F.when(F.col("n_values") > 1, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_on_collisions"),
        F.sum("n_rows").cast("long").alias("rows_total"),
    )


SQL_FEATURE_HASHING = """
WITH vals AS (
  SELECT concat_ws('|', lang, source) AS value, count(*) AS n_rows
  FROM documents GROUP BY value
), hashed AS (
  SELECT value, n_rows,
         ('0x' || substr(md5('fh:' || value), 1, 8))::BIGINT % 256 AS bucket
  FROM vals
), per_bucket AS (
  SELECT bucket, count(*) AS n_values, sum(n_rows) AS n_rows
  FROM hashed GROUP BY bucket
)
SELECT count(*) AS buckets_used,
       CAST(sum(CASE WHEN n_values > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS buckets_colliding,
       CAST(sum(CASE WHEN n_values > 1 THEN n_values - 1 ELSE 0 END)
            AS BIGINT) AS values_lost,
       CAST(max(n_values) AS BIGINT) AS max_pileup,
       CAST(sum(CASE WHEN n_values > 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_on_collisions,
       CAST(sum(n_rows) AS BIGINT) AS rows_total
FROM per_bucket
"""



# ---------------------------------------------------------------------------
# Language-mix pivot — corpus composition by source × language
# ---------------------------------------------------------------------------
def q_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition pivot: per source, document counts by language
    column plus each source's dominant language share in exact ppm —
    the one-glance mix report a multilingual training set is curated
    against.  Native ``pivot`` over the bounded language dimension (the
    values are pinned, so the plan never scans to discover columns).
    """
    docs = _t(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    pivoted = (
        counts.groupBy("source")
        .pivot("lang", langs)
        .sum("n")
        .na.fill(0)
    )
    totals = counts.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.max("n").alias("max_lang_n"),
    )
    return (
        pivoted.join(totals, "source")
        .select(
            "source",
            *[F.col(lang).cast("long").alias(f"n_{lang}") for lang in langs],
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr("(max_lang_n * 1000000) div n_docs").alias(
                "dominant_share_ppm"
            ),
        )
        .orderBy("source")
    )


SQL_LANGUAGE_MIX = """
WITH counts AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
), totals AS (
  SELECT source, sum(n) AS n_docs, max(n) AS max_lang_n
  FROM counts GROUP BY source
)
SELECT t.source,
       CAST(coalesce(sum(CASE WHEN lang = 'de' THEN n END), 0) AS BIGINT)
         AS n_de,
       CAST(coalesce(sum(CASE WHEN lang = 'en' THEN n END), 0) AS BIGINT)
         AS n_en,
       CAST(coalesce(sum(CASE WHEN lang = 'es' THEN n END), 0) AS BIGINT)
         AS n_es,
       CAST(coalesce(sum(CASE WHEN lang = 'fr' THEN n END), 0) AS BIGINT)
         AS n_fr,
       CAST(coalesce(sum(CASE WHEN lang = 'zh' THEN n END), 0) AS BIGINT)
         AS n_zh,
       CAST(max(t.n_docs) AS BIGINT) AS n_docs,
       CAST((max(t.max_lang_n) * 1000000) // max(t.n_docs) AS BIGINT) AS dominant_share_ppm
FROM counts c JOIN totals t ON t.source = c.source
GROUP BY t.source
ORDER BY t.source
"""


CORPUS_QUERIES = {
    "doc_chunking": q_doc_chunking,
    "source_quota": q_source_quota,
    "tfidf_top_terms": q_tfidf_top_terms,
    "inverted_index": q_inverted_index,
    "scd2_history": q_scd2_history,
    "embedding_normalize": q_embedding_normalize,
    "embedding_dim_stats": q_embedding_dim_stats,
    "pack_bins": q_pack_bins,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "source_mixing": q_source_mixing,
    "quality_deciles": q_quality_deciles,
    "text_bpe_tokens": q_text_bpe_tokens,
    "bpe_merge_step": q_bpe_merge_step,
    "length_outlier_filter": q_length_outlier_filter,
    "embedding_center_stats": q_embedding_center_stats,
    "assign_seq_ids": q_assign_seq_ids,
    "length_quantile_sketch": q_length_quantile_sketch,
    "passage_dedup": q_passage_dedup,
    "dedup_substring_spans": q_dedup_substring_spans,
    "dedup_substring_strip": q_dedup_substring_strip,
    "decontaminate_strip": q_decontaminate_strip,
    "vocab_coverage": q_vocab_coverage,
    "label_centroid_similarity": q_label_centroid_similarity,
    "bm25_rank": q_bm25_rank,
    "pmi_top_pairs": q_pmi_top_pairs,
    "weighted_sample": q_weighted_sample,
    "quota_allocation": q_quota_allocation,
    "phrase_search": q_phrase_search,
    "feature_hashing": q_feature_hashing,
    "language_mix": q_language_mix,
}

CORPUS_ORACLES = {
    "doc_chunking": SQL_CHUNKING,
    "source_quota": SQL_SOURCE_QUOTA,
    "tfidf_top_terms": SQL_TFIDF,
    "inverted_index": SQL_INVERTED,
    "scd2_history": SQL_SCD2,
    "embedding_normalize": SQL_EMB_NORM,
    "embedding_dim_stats": SQL_DIM_STATS,
    "pack_bins": SQL_PACK,
    "cms_heavy_hitters": SQL_CMS,
    "source_mixing": SQL_SOURCE_MIXING,
    "quality_deciles": SQL_QUALITY_DECILES,
    "text_bpe_tokens": SQL_BPE_TOKENS,
    "bpe_merge_step": SQL_BPE_MERGE_STEP,
    "length_outlier_filter": SQL_LENGTH_OUTLIER,
    "embedding_center_stats": SQL_EMB_CENTER,
    "assign_seq_ids": SQL_ASSIGN_SEQ,
    "length_quantile_sketch": _sql_length_quantiles(),
    "passage_dedup": SQL_PASSAGE_DEDUP,
    "dedup_substring_spans": SQL_DEDUP_SUBSTRING_SPANS,
    "dedup_substring_strip": SQL_DEDUP_SUBSTRING_STRIP,
    "decontaminate_strip": SQL_DECONTAMINATE_STRIP,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "label_centroid_similarity": SQL_CENTROID_SIM,
    "bm25_rank": SQL_BM25,
    "pmi_top_pairs": SQL_PMI,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "quota_allocation": SQL_QUOTA_ALLOCATION,
    "phrase_search": SQL_PHRASE_SEARCH,
    "feature_hashing": SQL_FEATURE_HASHING,
    "language_mix": SQL_LANGUAGE_MIX,
}
