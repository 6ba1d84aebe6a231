"""Query catalog — training-data pipeline operators (dedup, similarity
search, text analysis) over the ``documents`` and ``embeddings`` tables,
each with a DuckDB oracle.  See catalog.py for the determinism rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog_corpus import _SHINGLES_OF_T
from service_alerts_connector_spark.functions import text as TX
from service_alerts_connector_spark.operators.similarity import (
    bucketed_cosine_topk,
    cosine_topk,
    seeded_hyperplanes,
)
from service_alerts_connector_spark.operators.textdedup import (
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash32,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # oracle tz parity
    from service_alerts_connector_spark.catalog import _READER_CACHE
    from service_alerts_connector_spark.shipping import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(spark)
    # shared reader-plan cache (see catalog._READER_CACHE): metadata reuse
    # only — executions always compute from the parquet on disk
    key = (spark.sparkContext.applicationId, f"{sf_dir}/{name}.parquet")
    df = _READER_CACHE.get(key)
    if df is None:
        _READER_CACHE[key] = df = spark.read.parquet(
            f"{sf_dir}/{name}.parquet"
        )
    return df


# Shared DuckDB CTE: tokenization + 3-word shingles, mirroring
# functions/text.py exactly (trim→lower→split on \s+; slice windows of
# 3).  The shingle expression is the ONE shared fragment from
# catalog_corpus (also composed by catalog_novelty over _TOKS); the
# raw-split tokenization here is this tier's own, deliberately — see
# the fragment's note on the empty-text divergence.
_SQL_SHINGLES = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
), sh AS (
  SELECT doc_id, {_SHINGLES_OF_T} AS shingles
  FROM toks
)
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        F.col("doc_id").alias("id"),
        TX.token_count(t).alias("n_tokens"),
        TX.char_count(t).alias("n_chars_calc"),
        TX.punct_count(t).alias("n_punct"),
        TX.stopword_count(t).alias("n_stop"),
    )


SQL_TEXT_STATS = r"""
SELECT doc_id AS id,
       CASE WHEN trim(lower(text)) = '' OR text IS NULL THEN 0
            ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS n_tokens,
       coalesce(length(text), 0) AS n_chars_calc,
       length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS n_punct,
       len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) AS n_stop
FROM documents
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("labeled_lang"),
        TX.lang_guess(F.col("text")).alias("lang_guess"),
    )


SQL_LANG_ID = r"""
SELECT doc_id AS id, lang AS labeled_lang,
       CASE WHEN len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) >= 2 THEN 'en'
            WHEN len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) >= 1 THEN 'maybe_en'
            ELSE 'other' END AS lang_guess
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("id"),
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"),
    )


SQL_QUALITY = r"""
WITH s AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(lower(text)) = '' OR text IS NULL THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS DOUBLE) AS n_tokens,
         CAST(coalesce(length(text), 0) AS DOUBLE) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) AS n_punct
  FROM documents
)
SELECT doc_id AS id,
       round((n_tokens * 5.0) / (n_chars + 1.0) - (n_punct / (n_chars + 1.0)), 6) AS quality
FROM s
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline a training-data run actually executes:
    language gate (confident-English) → quality-score floor → token-length
    band → exact dedup (min-id representative).  Catalyst fuses the three
    scalar gates into the scan's filter and the dedup is the only shuffle.

    The gated frame feeds BOTH the dedup build (md5 groupBy) and the
    semi-join probe — unpinned, the regex-heavy gate pass (lang guess +
    quality score + token count over every text) ran twice, plus a third
    token_count in the final projection.  One narrow projection
    (doc_id, _h, n_tokens) pinned with a lazy localCheckpoint runs the
    gate pass once and keeps full texts out of every downstream exchange
    (guide §1.2 reuse / §2.3 project-before-exchange — and unlike a
    text-carrying pin, safe at corpus scale).  No final orderBy:
    row-per-doc output, the correctness gate canonicalizes
    order-insensitively (guide §2.4 — the sort was a rangepartitioning
    Exchange + Sort over the whole survivor set)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    gated = (
        docs.where(
            (TX.lang_guess(t) == "en")
            & (F.round(TX.quality_score(t), 6) > 0.3)
            & (TX.token_count(t).between(5, 5000))
        )
        .select(
            F.col("doc_id"),
            F.md5(t).alias("_h"),
            TX.token_count(t).alias("n_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    keep = (
        gated.groupBy("_h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return gated.join(keep, "doc_id", "left_semi").select(
        "doc_id", "n_tokens"
    )


SQL_CORPUS_CURATION = r"""
WITH gated AS (
  SELECT doc_id, text,
         CASE WHEN trim(lower(text)) = '' OR text IS NULL THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS n_tokens
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) >= 2
    AND round(
      (CAST(CASE WHEN trim(lower(text)) = '' OR text IS NULL THEN 0
            ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS DOUBLE) * 5.0)
        / (CAST(coalesce(length(text), 0) AS DOUBLE) + 1.0)
      - (CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
         / (CAST(coalesce(length(text), 0) AS DOUBLE) + 1.0)), 6) > 0.3
    AND (CASE WHEN trim(lower(text)) = '' OR text IS NULL THEN 0
         ELSE len(string_split_regex(trim(lower(text)), '\s+')) END) BETWEEN 5 AND 5000
), keep AS (
  SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)
)
SELECT g.doc_id, g.n_tokens
FROM gated g JOIN keep k ON g.doc_id = k.doc_id
ORDER BY g.doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("id"), TX.tokens(F.col("text")).alias("_toks")
    ).select(
        "id", TX.doc_fingerprint_of(F.col("_toks"), 3).alias("fingerprint")
    )


SQL_FINGERPRINT = (
    _SQL_SHINGLES
    + """
SELECT doc_id AS id,
       list_min(list_transform(shingles, s -> md5(s))) AS fingerprint
FROM sh
"""
)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    return lsh_candidate_pairs(sigs, num_hashes=8, bands=4)


_SQL_MINHASH_BANDS = (
    _SQL_SHINGLES
    + """
, ex AS (
  SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
), sig AS (
  SELECT doc_id,
         min(md5('0:' || s)) AS mh0, min(md5('1:' || s)) AS mh1,
         min(md5('2:' || s)) AS mh2, min(md5('3:' || s)) AS mh3,
         min(md5('4:' || s)) AS mh4, min(md5('5:' || s)) AS mh5,
         min(md5('6:' || s)) AS mh6, min(md5('7:' || s)) AS mh7
  FROM ex GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band, md5(concat_ws('|', mh0, mh1)) AS bucket FROM sig
  UNION ALL SELECT doc_id, 1, md5(concat_ws('|', mh2, mh3)) FROM sig
  UNION ALL SELECT doc_id, 2, md5(concat_ws('|', mh4, mh5)) FROM sig
  UNION ALL SELECT doc_id, 3, md5(concat_ws('|', mh6, mh7)) FROM sig
)
"""
)

_SQL_PAIR_SELECT = """
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""

SQL_MINHASH_LSH = _SQL_MINHASH_BANDS + _SQL_PAIR_SELECT


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: exact-collapse then MinHash-LSH pairs →
    connected components (id, component=min reachable id) — the
    keep-one-per-cluster step after pair mining.  Since r15 the fuzzy tier
    runs on one representative per distinct content
    (``collapsed_assignment``; provably the same components — identical
    text ⇒ identical signature ⇒ the rep graph is the quotient graph), so
    a duplication-heavy corpus never pays clique-mass pair explosion.  A
    doc is CLUSTERED iff its exact class has ≥2 members (the class itself
    is a clique) or its representative mined a fuzzy pair.  The oracle
    computes the same closure with a recursive CTE over the uncollapsed
    graph."""
    from service_alerts_connector_spark.operators.textdedup import (
        collapsed_assignment,
    )

    docs = _t(spark, sf_dir, "documents")
    asg = collapsed_assignment(docs, num_hashes=8, shingle_k=3, bands=4)
    # no final orderBy (r16): row-per-clustered-doc output, the
    # correctness gate canonicalizes order-insensitively — the sort was a
    # rangepartitioning Exchange + sampling job over the whole cluster set
    # (guide §2.4; same class as the r15 presentation-sort drops)
    return asg.where(
        (F.col("n_class") >= 2) | F.col("component").isNotNull()
    ).select(
        "doc_id",
        F.coalesce("component", F.col("rep")).alias("component"),
    )


SQL_DEDUP_CLUSTERS = (
    _SQL_MINHASH_BANDS.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
, pairs AS (
  {_SQL_PAIR_SELECT}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS doc_id, min(r) AS component
FROM reach GROUP BY id ORDER BY doc_id
"""
)


def q_dedup_near_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized near-dedup decision: corpus minus non-representative
    cluster members (min-id representative kept, unclustered rows kept).
    Via ``collapsed_assignment`` the decision reduces to one predicate:
    keep a doc iff it IS the smallest id of its exact+fuzzy duplicate
    group (``doc_id == coalesce(component, rep)``) — non-rep exact copies
    fail ``rep``, clustered reps that aren't the cluster min fail
    ``component``, and every unclustered singleton passes trivially."""
    from service_alerts_connector_spark.operators.textdedup import (
        collapsed_assignment,
    )

    docs = _t(spark, sf_dir, "documents")
    asg = collapsed_assignment(docs, num_hashes=8, shingle_k=3, bands=4)
    # no final orderBy (r16): row-per-surviving-doc output, gate is
    # order-insensitive (see q_dedup_clusters)
    return asg.where(
        F.col("doc_id") == F.coalesce("component", F.col("rep"))
    ).select("doc_id")


SQL_DEDUP_NEAR_KEEP = (
    _SQL_MINHASH_BANDS.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
, pairs AS (
  {_SQL_PAIR_SELECT}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id
), comp AS (
  SELECT id, min(r) AS component FROM reach GROUP BY id
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
ORDER BY d.doc_id
"""
)


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a hash of the
    document's duplicate-CLUSTER representative (its connected component
    from LSH pair mining; unclustered docs key on their own id), so
    near-duplicates can never straddle train and held-out — the split-level
    counterpart of the dedup tier (plain per-doc hashing leaks every
    near-dup pair across the boundary).  Composition of
    ``collapsed_assignment`` (exact-collapse then fuzzy clustering on one
    rep per distinct content — provably the same group keys) +
    ``hash_split``; the only work beyond ``dedup_clusters`` is a pure-row
    md5."""
    from service_alerts_connector_spark.operators.sketches import hash_split
    from service_alerts_connector_spark.operators.textdedup import (
        collapsed_assignment,
    )

    docs = _t(spark, sf_dir, "documents")
    keyed = collapsed_assignment(
        docs, num_hashes=8, shingle_k=3, bands=4
    ).withColumn("group_key", F.coalesce("component", F.col("rep")))
    # no orderBy: the correctness gate hashes the value MULTISET
    # (order-insensitive), and a corpus-wide global sort would be the only
    # super-linear cost in this plan at 100 TB
    return hash_split(keyed, "group_key", seed="leak-v1").select(
        "doc_id", "group_key", "split"
    )


def _sql_leakage_safe_split() -> str:
    from service_alerts_connector_spark.operators.sketches import (
        hash_split_sql,
    )

    split_expr = hash_split_sql(
        "coalesce(c.component, d.doc_id)", seed="leak-v1"
    )
    return (
        _SQL_MINHASH_BANDS.replace("WITH ", "WITH RECURSIVE ", 1)
        + f"""
, pairs AS (
  {_SQL_PAIR_SELECT}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id
), comp AS (
  SELECT id, min(r) AS component FROM reach GROUP BY id
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS group_key,
       {split_expr} AS split
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination screen: every 10th doc is the held-out
    split; flag train docs sharing an LSH band bucket with any of them.

    Single-pass since r15: the split is a partition of ONE corpus, so
    `split_contamination` bands every doc once and splits the banded
    frame — identical flags to the two-pass
    `cross_corpus_contamination(train, test)` form (operator docstring
    has the proof; equivalence test pins it), one tokenize/shingle pass
    instead of two."""
    from service_alerts_connector_spark.operators.textdedup import (
        split_contamination,
    )

    docs = _t(spark, sf_dir, "documents")
    return split_contamination(
        docs, F.col("doc_id") % 10 == 0
    ).orderBy("doc_id")


SQL_CONTAMINATION = (
    _SQL_MINHASH_BANDS
    + """
SELECT DISTINCT a.doc_id
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
ORDER BY a.doc_id
"""
)


def q_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-overlap scoring tier on the same train/held-out split as
    `contamination`: per train doc, the fraction of its distinct 3-word
    shingles appearing verbatim in the held-out set (per-mille integer).
    The LSH screen says WHO to look at; this says HOW MUCH is shared."""
    from service_alerts_connector_spark.operators.textdedup import (
        exact_ngram_overlap,
    )

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    test = docs.where(F.col("doc_id") % 10 == 0)
    return exact_ngram_overlap(train, test, shingle_k=3)


SQL_NGRAM_DECONTAMINATION = (
    _SQL_SHINGLES
    + """
, ex AS (
  SELECT DISTINCT doc_id, s
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
), bench AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 10 = 0
), train AS (
  SELECT doc_id, s FROM ex WHERE doc_id % 10 <> 0
), totals AS (
  SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id
), matched AS (
  SELECT t.doc_id, count(*) AS n_matched
  FROM train t JOIN bench b ON t.s = b.s
  GROUP BY t.doc_id
)
SELECT m.doc_id,
       CAST(m.n_matched AS BIGINT) AS n_matched,
       CAST(tt.n_shingles AS BIGINT) AS n_shingles,
       CAST(floor((1000 * m.n_matched) / tt.n_shingles) AS BIGINT)
         AS overlap_pm
FROM matched m JOIN totals tt USING (doc_id)
"""
)


def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS set-similarity self-join: every pair with distinct-token
    Jaccard ≥ 4/5 via PPJoin-style prefix filtering (rarest-θ-quantile
    tokens only hit the join) — the exact-recall counterpart to the
    probabilistic MinHash/SimHash candidate generators.  Integer-rational
    threshold and per-mille output per the catalog determinism rules.
    Sliced to doc_id < 250 like `dedup_jaccard`: the synthetic corpus is
    pathologically self-similar (74% of ALL pairs clear Jaccard ≥ 1/2), so
    the TRUE result is quadratic on the full table — a filter problem, not
    a candidate-generation one."""
    from service_alerts_connector_spark.operators.textdedup import (
        prefix_filter_pairs,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 250)
    return prefix_filter_pairs(docs, theta_num=4, theta_den=5)


SQL_PREFIX_FILTER = r"""
WITH tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id,
           unnest(CASE WHEN text IS NULL OR trim(lower(text)) = '' THEN []
                       ELSE string_split_regex(trim(lower(text)), '\s+')
                  END) AS t
    FROM documents WHERE doc_id < 250)
), freq AS (
  SELECT t, count(*) AS df_t FROM tok GROUP BY t
), ordered AS (
  SELECT tok.doc_id, tok.t,
         row_number() OVER (PARTITION BY tok.doc_id
                            ORDER BY f.df_t, tok.t) AS pos,
         count(*) OVER (PARTITION BY tok.doc_id) AS n
  FROM tok JOIN freq f USING (t)
), prefix AS (
  SELECT doc_id, t, n FROM ordered
  WHERE pos <= n - floor((4 * n + 5 - 1) / 5) + 1
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM prefix a JOIN prefix b
    ON a.t = b.t AND a.doc_id < b.doc_id
   AND 5 * least(a.n, b.n) >= 4 * greatest(a.n, b.n)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN tok ta ON ta.doc_id = c.id_a
  JOIN tok tb ON tb.doc_id = c.id_b AND tb.t = ta.t
  GROUP BY c.id_a, c.id_b
), verified AS (
  SELECT i.id_a, i.id_b, i.n_inter,
         sa.n + sb.n - i.n_inter AS n_union
  FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
               JOIN sizes sb ON sb.doc_id = i.id_b
)
SELECT id_a, id_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_union AS BIGINT) AS n_union,
       CAST(floor((1000 * n_inter) / n_union) AS BIGINT) AS jaccard_pm
FROM verified WHERE 5 * n_inter >= 4 * n_union
"""


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return jaccard_pairs(docs, shingle_k=3, threshold=0.2)


SQL_JACCARD = (
    _SQL_SHINGLES
    + """
, ex AS (
  SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
                                  WHERE doc_id < 200)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.2
"""
)


def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall/precision of the banded-MinHash candidate tier
    against exact-Jaccard ground truth at threshold 0.8 (integer
    predicate 5·|∩| ≥ 4·|∪|), on the same restricted slice as
    ``dedup_jaccard`` — the knob-tuning harness that replaces trusting
    the 1-(1-J^r)^b S-curve on faith (``operators/textdedup
    lsh_recall_eval``).  Ground truth is O(pairs-sharing-a-shingle), so
    the eval runs on a sample; the tuned (hashes, bands) then serve the
    full corpus.  One row of exact bigint counts + ppm rates."""
    from service_alerts_connector_spark.operators.textdedup import (
        lsh_recall_eval,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return lsh_recall_eval(
        docs, shingle_k=3, num_hashes=8, bands=4,
        threshold_num=4, threshold_den=5,
    )


# restricted-corpus variants of the shingle/band CTEs (same text machinery
# as SQL_MINHASH_LSH, gated to the eval slice before anything expands)
_SQL_BANDS_LT200 = _SQL_MINHASH_BANDS.replace(
    "FROM documents", "FROM documents WHERE doc_id < 200"
)

SQL_LSH_RECALL = (
    _SQL_BANDS_LT200
    + """
, cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), truth AS (
  SELECT i.id_a, i.id_b
  FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
               JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE 5 * i.n_inter >= 4 * (sa.n + sb.n - i.n_inter)
), hit AS (
  SELECT t.id_a, t.id_b FROM truth t JOIN cand c
    ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT CAST(800000 AS BIGINT) AS threshold_ppm,
       CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
       CAST((SELECT count(*) FROM hit) * 1000000
            // greatest((SELECT count(*) FROM truth), 1) AS BIGINT)
         AS recall_ppm,
       CAST((SELECT count(*) FROM hit) * 1000000
            // greatest((SELECT count(*) FROM cand), 1) AS BIGINT)
         AS precision_ppm
"""
)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return simhash32(docs).select(
        F.col("doc_id").alias("id"), F.col("simhash")
    )


SQL_SIMHASH = r"""
WITH tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
    FROM documents
  )
), h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(8),
              j -> (strpos('0123456789abcdef', substr(md5(t), CAST(j+1 AS INTEGER), 1)) - 1)
                   * power(16, 7 - j))) AS BIGINT) AS h32
  FROM tok
), v AS (
  SELECT doc_id, bit,
         sum(CASE WHEN CAST(floor(h32 / power(2, bit)) AS BIGINT) % 2 = 1
                  THEN 1 ELSE -1 END) AS bal
  FROM h CROSS JOIN (SELECT unnest(range(32)) AS bit) bits
  GROUP BY doc_id, bit
)
SELECT doc_id AS id,
       CAST(sum(CASE WHEN bal > 0 THEN power(2, bit) ELSE 0 END) AS BIGINT) AS simhash
FROM v GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------
def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


SQL_ANN_TOPK = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
), s AS (
  SELECT vec_id,
         round(list_dot_product(CAST(embedding AS DOUBLE[]), qe)
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(qe, qe))), 6) AS cos
  FROM embeddings, q
)
SELECT vec_id, cos FROM s ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def _sql_proj(vec: str, plane: list[tuple[int, int]]) -> str:
    """<vec, sparse ±1 plane> as a left-associated explicit sum — the
    identical IEEE op sequence `projection_expr` builds in Spark, so bucket
    signs are bit-equal across engines (operators/similarity docstring)."""
    parts = []
    for i, (d, s) in enumerate(plane):
        if i == 0:
            parts.append(("-" if s < 0 else "") + f"{vec}[{d + 1}]")
        else:
            parts.append(("- " if s < 0 else "+ ") + f"{vec}[{d + 1}]")
    return " ".join(parts)


def _sql_bucket(vec: str, planes: list[list[tuple[int, int]]]) -> str:
    cases = [
        f"CASE WHEN ({_sql_proj(vec, p)}) > 0 THEN {2 ** j} ELSE 0 END"
        for j, p in enumerate(planes)
    ]
    return "(" + " + ".join(cases) + ")"


_ANN_PLANES = seeded_hyperplanes(8, 64, seed=7)


def q_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return bucketed_cosine_topk(
        emb, _query_vec(spark, sf_dir), k=5, n_planes=8, seed=7, hamming=1
    )


SQL_ANN_BUCKETED = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
), qb AS (
  SELECT qe, {_sql_bucket("qe", _ANN_PLANES)} AS qbucket FROM q
), e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT vec_id,
         round(list_dot_product(v, qe)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qe, qe))),
               6) AS cos
  FROM e, qb
  WHERE {_sql_bucket("v", _ANN_PLANES)} IN
        (qbucket, {", ".join(f"xor(qbucket, {1 << j})" for j in range(8))})
)
SELECT vec_id, cos FROM s ORDER BY cos DESC, vec_id ASC LIMIT 5
"""


def q_ann_ivf_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with *fixed* centroids (the embeddings of vec_id 1..4), so
    cell assignment (argmin squared-L2, first-wins ties), probe selection
    (2 nearest cells to the query) and the exact cosine top-k within probed
    cells are all SQL-expressible — the oracled complement of the
    rows-only ``ann_ivf``, whose iterative Lloyd training is not."""
    from service_alerts_connector_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.where(F.col("vec_id").between(1, 4))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in cent_rows]
    return ivf_topk(emb, cents, _query_vec(spark, sf_dir), k=10, n_probe=2)


SQL_ANN_IVF_FIXED = """
WITH cents AS (
  SELECT vec_id - 1 AS cell, CAST(embedding AS DOUBLE[]) AS c
  FROM embeddings WHERE vec_id BETWEEN 1 AND 4
), q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
), probe AS (
  SELECT cell FROM cents, q
  ORDER BY list_distance(c, qe) ASC, cell ASC LIMIT 2
), e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), ranked AS (
  SELECT e.vec_id, e.v, cents.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_distance(cents.c, e.v) ASC, cents.cell ASC
         ) AS rn
  FROM e CROSS JOIN cents
), assigned AS (
  SELECT vec_id, v, cell AS ivf_cell FROM ranked WHERE rn = 1
), s AS (
  SELECT a.vec_id,
         round(list_dot_product(a.v, q.qe)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos
  FROM assigned a, q
  WHERE a.ivf_cell IN (SELECT cell FROM probe)
)
SELECT vec_id, cos FROM s ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def q_ann_pq_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC ANN with *fixed* codebooks over SQ8 integer codes — the
    oracled complement of the rows-only ``ann_pq`` (whose lite-kmeans
    training is iterative).  Codebooks are pinned to data DuckDB can
    reproduce: centroid c of subspace s is the SQ8 code subvector
    [s·8, s·8+8) of vec_id c+1 (16 centroids × 8 subspaces), and the
    query is the SQ8-quantized embedding of vec_id 0.

    This composition exercises the REAL NumPy kernels (``pq_encode``
    argmin assignment, ``pq_adc_topk`` LUT scoring) while making every
    accumulation engine-exact: SQ8 codes are integers in [−127, 127], so
    all squared distances, LUT dots and norm² sums are integer-valued
    doubles ≪ 2⁵³ — exact under ANY summation order, immune to the
    NumPy-vs-sequential associativity fuzz that keeps the float-trained
    path rows-only (CLAUDE.md float-sum rules; same discipline as
    ``ann_sq8``)."""
    from service_alerts_connector_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        quantize_embeddings_sq8,
        sq8_quantize_vec,
    )

    emb = _t(spark, sf_dir, "embeddings")
    sq = quantize_embeddings_sq8(emb)  # (vec_id, scale, codes)
    cb_rows = (
        sq.where(F.col("vec_id").between(1, 16))
        .orderBy("vec_id")
        .select("codes")
        .collect()
    )
    books = [
        [[float(r["codes"][s * 8 + i]) for i in range(8)] for r in cb_rows]
        for s in range(8)
    ]
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][
        "embedding"
    ]
    q = [float(c) for c in sq8_quantize_vec(qvec)]
    enc = pq_encode(sq, books, vec_col="codes")
    return pq_adc_topk(enc, books, q, k=10)


SQL_ANN_PQ_FIXED = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), scaled AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
  FROM base
), codes AS (
  SELECT vec_id,
         CASE WHEN scale = 0
              THEN list_transform(v, x -> CAST(0 AS DOUBLE))
              ELSE list_transform(v, x -> floor(x / scale * 127 + 0.5))
         END AS c
  FROM scaled
), cb AS (
  SELECT vec_id - 1 AS cent, t.x AS sub,
         c[t.x * 8 + 1 : t.x * 8 + 8] AS cv
  FROM codes, range(0, 8) t(x)
  WHERE vec_id BETWEEN 1 AND 16
), vsub AS (
  SELECT vec_id, t.x AS sub, c[t.x * 8 + 1 : t.x * 8 + 8] AS xv
  FROM codes, range(0, 8) t(x)
), assigned AS (
  SELECT vec_id, sub, cent, cv,
         row_number() OVER (
           PARTITION BY vec_id, sub
           ORDER BY list_dot_product(xv, xv) - 2 * list_dot_product(xv, cv)
                    + list_dot_product(cv, cv) ASC,
                    cent ASC
         ) AS rn
  FROM vsub JOIN cb USING (sub)
), q AS (
  SELECT c AS qc FROM codes WHERE vec_id = 0
), qsub AS (
  SELECT t.x AS sub, qc[t.x * 8 + 1 : t.x * 8 + 8] AS qv
  FROM q, range(0, 8) t(x)
), qn AS (
  SELECT sqrt(list_dot_product(qc, qc)) AS qn FROM q
), scored AS (
  SELECT a.vec_id,
         sum(list_dot_product(s.qv, a.cv)) AS dots,
         sum(list_dot_product(a.cv, a.cv)) AS n2
  FROM assigned a JOIN qsub s USING (sub)
  WHERE a.rn = 1
  GROUP BY a.vec_id
)
SELECT s.vec_id,
       round(CAST(dots AS DOUBLE)
             / (sqrt(CAST(n2 AS DOUBLE)) * qn.qn), 6) AS pq_cos
FROM scored s, qn
WHERE n2 > 0
ORDER BY pq_cos DESC, vec_id ASC LIMIT 10
"""


_NDUP_PLANES = seeded_hyperplanes(32, 64, seed=7)
_NDUP_BANDS = 4
_NDUP_SHIFT = 10_000_000  # > any vec_id at any scale factor


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup extraction over a corpus that *contains* duplicates: the
    embeddings table unioned with an id-shifted copy of itself.  Exact
    duplicates (cosine 1.0) are recalled by banded sign-LSH under any
    banding, so the oracled row count is deterministic; recall at
    near-threshold cosines is the measured, documented approximation
    (tests/test_textdedup.py recall tests)."""
    from service_alerts_connector_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    shifted = emb.select(
        (F.col("vec_id") + F.lit(_NDUP_SHIFT)).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(shifted)
    # dim=64 pinned: the oracle's hyperplane literals (_NDUP_PLANES) are
    # generated at dim 64, so the query is 64-dimensional by declaration —
    # passing it skips the operator's head-row dim probe (a ~0.5 s
    # blocking driver job per build)
    return embedding_near_dup_pairs(
        corpus, threshold=0.9, n_planes=32, n_bands=_NDUP_BANDS, seed=7,
        dim=64,
    )


def _sql_band_bucket(
    vec: str, planes: list[list[tuple[int, int]]], band: int, r: int
) -> str:
    cases = [
        f"CASE WHEN ({_sql_proj(vec, planes[band * r + i])}) > 0"
        f" THEN {2 ** i} ELSE 0 END"
        for i in range(r)
    ]
    return "(" + " + ".join(cases) + ")"


def _sql_dedup_emb() -> str:
    r = len(_NDUP_PLANES) // _NDUP_BANDS
    band_cols = ",\n         ".join(
        f"{_sql_band_bucket('v', _NDUP_PLANES, b, r)} AS bb{b}"
        for b in range(_NDUP_BANDS)
    )
    cand_union = "\n  UNION\n".join(
        f"  SELECT a.vec_id AS ia, c.vec_id AS ib FROM b a JOIN b c"
        f" ON a.bb{b} = c.bb{b} AND a.vec_id < c.vec_id"
        for b in range(_NDUP_BANDS)
    )
    return f"""
WITH e0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), u AS (
  SELECT vec_id, v FROM e0
  UNION ALL
  SELECT vec_id + {_NDUP_SHIFT} AS vec_id, v FROM e0
), b AS (
  SELECT vec_id, v,
         {band_cols}
  FROM u
), cand AS (
{cand_union}
)
SELECT ia AS id_a, ib AS id_b,
       round(list_dot_product(ea.v, eb.v)
             / (sqrt(list_dot_product(ea.v, ea.v))
                * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos
FROM cand
JOIN u ea ON ea.vec_id = ia
JOIN u eb ON eb.vec_id = ib
WHERE round(list_dot_product(ea.v, eb.v)
            / (sqrt(list_dot_product(ea.v, ea.v))
               * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.9
"""


SQL_DEDUP_EMB = _sql_dedup_emb()


def q_semdedup_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with pinned centroids over a corpus that contains
    duplicates (embeddings ∪ id-shifted copy, as in
    ``dedup_embedding_cosine``): assign to the milli-quantized centroids
    of vec_id 1..4, LSH-bound within-cluster candidate pairs, drop the
    closer-to-centroid member of every cosine ≥ 0.9 pair (tie → keep the
    smaller id, so every original survives its shifted twin) —
    `operators/similarity.py semantic_dedup`."""
    import math

    from service_alerts_connector_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_rows = (
        emb.where(F.col("vec_id").between(1, 4))
        .orderBy("vec_id")
        .select("embedding")
        .collect()  # bounded: 4 rows
    )
    cents_milli = [
        [math.floor(float(x) * 1000.0) for x in r["embedding"]]
        for r in cent_rows
    ]
    shifted = emb.select(
        (F.col("vec_id") + F.lit(_NDUP_SHIFT)).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(shifted)
    return semantic_dedup(
        corpus, cents_milli, threshold=0.9,
        n_planes=32, n_bands=_NDUP_BANDS, seed=7,
    )


def _sql_semdedup() -> str:
    r = len(_NDUP_PLANES) // _NDUP_BANDS
    band_cols = ",\n         ".join(
        f"{_sql_band_bucket('v', _NDUP_PLANES, b, r)} AS bb{b}"
        for b in range(_NDUP_BANDS)
    )
    cand_union = "\n  UNION\n".join(
        f"  SELECT a.vec_id AS ia, c.vec_id AS ib FROM b a JOIN b c"
        f" ON a.cell = c.cell AND a.bb{b} = c.bb{b} AND a.vec_id < c.vec_id"
        for b in range(_NDUP_BANDS)
    )
    return f"""
WITH e0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), u AS (
  SELECT vec_id, v FROM e0
  UNION ALL
  SELECT vec_id + {_NDUP_SHIFT} AS vec_id, v FROM e0
), um AS (
  SELECT vec_id, v,
         list_transform(v, x -> CAST(floor(x * 1000) AS BIGINT)) AS xm
  FROM u
), ed AS (
  SELECT vec_id, generate_subscripts(xm, 1) AS i, unnest(xm) AS x FROM um
), cd AS (
  SELECT CAST(vec_id - 1 AS INTEGER) AS cell,
         generate_subscripts(xm, 1) AS i, unnest(xm) AS c
  FROM um WHERE vec_id BETWEEN 1 AND 4
), dists AS (
  SELECT e.vec_id, c.cell, sum((e.x - c.c) * (e.x - c.c)) AS d2
  FROM ed e JOIN cd c USING (i) GROUP BY e.vec_id, c.cell
), assign AS (
  SELECT vec_id, cell, d2 FROM (
    SELECT vec_id, cell, d2,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY d2 ASC, cell ASC
           ) AS rn
    FROM dists
  ) WHERE rn = 1
), b AS (
  SELECT a.vec_id, a.cell, a.d2, um.v,
         {band_cols}
  FROM assign a JOIN um USING (vec_id)
), cand AS (
{cand_union}
), losers AS (
  SELECT DISTINCT
         CASE WHEN ea.d2 > eb.d2 THEN ib
              WHEN eb.d2 > ea.d2 THEN ia
              ELSE greatest(ia, ib) END AS vec_id
  FROM cand
  JOIN b ea ON ea.vec_id = ia
  JOIN b eb ON eb.vec_id = ib
  WHERE round(list_dot_product(ea.v, eb.v)
              / (sqrt(list_dot_product(ea.v, ea.v))
                 * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.9
)
SELECT a.vec_id, a.cell, CAST(a.d2 AS BIGINT) AS d2_milli,
       (l.vec_id IS NULL) AS kept
FROM assign a LEFT JOIN losers l USING (vec_id)
ORDER BY a.vec_id
"""


SQL_SEMDEDUP = _sql_semdedup()


def q_incremental_semdedup_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIRST-WINS SemDeDup rule (`semantic_dedup(keep="first")`) over
    the same duplicated corpus as ``semdedup_fixed`` — the prefix-monotone
    drop rule `operators/similarity.py incremental_semantic_dedup` applies
    per ingest batch against its persistent vector store.  This batch-mode
    complement IS the incremental path's correctness anchor: sequential
    ingest over id-increasing batches is pytest-pinned equal to exactly
    this result (tests/test_incremental_semdedup.py), so a driver
    certificate here certifies the rule the store machinery replays."""
    import math

    from service_alerts_connector_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent_rows = (
        emb.where(F.col("vec_id").between(1, 4))
        .orderBy("vec_id")
        .select("embedding")
        .collect()  # bounded: 4 rows
    )
    cents_milli = [
        [math.floor(float(x) * 1000.0) for x in r["embedding"]]
        for r in cent_rows
    ]
    shifted = emb.select(
        (F.col("vec_id") + F.lit(_NDUP_SHIFT)).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(shifted)
    return semantic_dedup(
        corpus, cents_milli, threshold=0.9,
        n_planes=32, n_bands=_NDUP_BANDS, seed=7, keep="first",
    )


def _sql_semdedup_first() -> str:
    # identical candidate machinery to SQL_SEMDEDUP; the loser of a pair
    # (emitted ia < ib) is always ib under first-wins
    base = _sql_semdedup()
    old = """), losers AS (
  SELECT DISTINCT
         CASE WHEN ea.d2 > eb.d2 THEN ib
              WHEN eb.d2 > ea.d2 THEN ia
              ELSE greatest(ia, ib) END AS vec_id"""
    new = """), losers AS (
  SELECT DISTINCT ib AS vec_id"""
    if old not in base:  # not assert: must fail loudly under python -O too
        raise ValueError(
            "SQL_SEMDEDUP losers CTE drifted; _sql_semdedup_first would "
            "silently revert to the keep-farthest rule"
        )
    return base.replace(old, new)


SQL_SEMDEDUP_FIRST = _sql_semdedup_first()


def q_text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by frequency (token tiebreak) —
    the fan-in aggregation every corpus pipeline runs for vocab builds."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(TX.tokens(F.col("text")).alias("_toks"))
        .select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(50)
    )


SQL_VOCAB = r"""
SELECT t AS token, count(*) AS freq
FROM (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
)
GROUP BY t ORDER BY freq DESC, t ASC LIMIT 50
"""


def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length histogram in 50-char buckets — the length-filter design
    input for corpus quality gates."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            (F.floor(F.col("n_chars") / 50) * 50).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_LENGTH_HIST = """
SELECT CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bucket,
       count(*) AS n_docs
FROM documents GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# PII redaction — URLs / emails / phone-like runs → typed placeholders
# ---------------------------------------------------------------------------
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus has no organic PII, so each doc is decorated with a
    deterministic synthetic email / URL / phone derived from its id, then
    redacted — the round trip exercises every pattern on every row."""
    from service_alerts_connector_spark.functions.text import (
        pii_count,
        redact_pii,
    )

    docs = _t(spark, sf_dir, "documents")
    decorated = docs.select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via https://ex.example/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" or call +27 21 400 "),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" :: "),
            F.substring("text", 1, 80),
        ).alias("raw"),
    )
    return decorated.select(
        "doc_id",
        redact_pii(F.col("raw")).alias("redacted"),
        pii_count(F.col("raw")).alias("n_pii"),
    )


SQL_PII = r"""
WITH decorated AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR) ||
         '@example.com via https://ex.example/d/' || CAST(doc_id AS VARCHAR) ||
         ' or call +27 21 400 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         ' :: ' || substr(text, 1, 80) AS raw
  FROM documents
), s1 AS (
  SELECT doc_id, raw,
         regexp_replace(raw, 'https?://[^\s]+', '<URL>', 'g') AS r1,
         len(regexp_extract_all(raw, 'https?://[^\s]+')) AS c1
  FROM decorated
), s2 AS (
  SELECT doc_id, r1, c1,
         regexp_replace(r1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS r2,
         len(regexp_extract_all(r1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c2
  FROM s1
)
SELECT doc_id,
       regexp_replace(r2, '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
       CAST(c1 + c2 + len(regexp_extract_all(r2, '\+?[0-9][0-9()\- ]{6,}[0-9]'))
            AS BIGINT) AS n_pii
FROM s2
"""


# ---------------------------------------------------------------------------
# Boilerplate-line removal — corpus-frequent lines dropped per document
# ---------------------------------------------------------------------------
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesizes 3-line documents (unique header, shared footer, text
    stub); the shared footer crosses the 20%-of-corpus threshold and is
    removed, the per-doc lines survive in order."""
    from service_alerts_connector_spark.operators.boilerplate import (
        remove_frequent_lines,
    )

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("doc "), F.col("doc_id").cast("string"), F.lit(" begins")),
            F.lit("ALL RIGHTS RESERVED - FOOTER"),
            F.substring("text", 1, 40),
        ).alias("body"),
    )
    return remove_frequent_lines(
        lined, "doc_id", "body", sep="\n", min_doc_frac=0.2
    )


SQL_BOILERPLATE = """
WITH lined AS (
  SELECT doc_id,
         'doc ' || CAST(doc_id AS VARCHAR) || ' begins' || chr(10) ||
         'ALL RIGHTS RESERVED - FOOTER' || chr(10) ||
         substr(text, 1, 40) AS body
  FROM documents
), exploded AS (
  SELECT doc_id,
         unnest(string_split(body, chr(10))) AS line,
         generate_subscripts(string_split(body, chr(10)), 1) AS pos
  FROM lined
), nonblank AS (
  SELECT * FROM exploded WHERE line <> ''
), freq AS (
  SELECT line FROM (SELECT DISTINCT line, doc_id FROM nonblank)
  GROUP BY line
  HAVING count(*) >= ceil(0.2 * (SELECT count(*) FROM lined))
), kept AS (
  SELECT e.doc_id, e.pos, e.line
  FROM exploded e LEFT JOIN freq f USING (line)
  WHERE f.line IS NULL
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned
  FROM kept GROUP BY doc_id
)
SELECT l.doc_id, coalesce(r.cleaned, '') AS cleaned
FROM lined l LEFT JOIN rebuilt r USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Repetition metrics — within-doc duplicate-token ratio
# ---------------------------------------------------------------------------
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-token ratio per document (repetition filter input).
    Tokens materialized in a prior projection (transform-lambda rule)."""
    from service_alerts_connector_spark.functions.text import (
        distinct_token_count,
        dup_token_ratio,
        tokens,
    )

    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        distinct_token_count(F.col("toks")).alias("n_distinct"),
        dup_token_ratio(F.col("toks")).alias("dup_ratio"),
    )


SQL_REPETITION = r"""
WITH toked AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) IS NULL OR trim(lower(text)) = ''
              THEN [] ELSE string_split_regex(trim(lower(text)), '\s+')
         END AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
       CASE WHEN len(toks) <= 0 THEN 0.0
            ELSE CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE)
       END AS dup_ratio
FROM toked
"""


# ---------------------------------------------------------------------------
# Intra-document n-gram repetition (Gopher-style duplicate-3-gram ratio)
# ---------------------------------------------------------------------------
def q_text_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of a document's word 3-grams that repeat an earlier one —
    the Gopher/RefinedWeb repetition rule.  Shingles are materialized in a
    projection before the size/distinct expressions (transform-lambda
    rule); the ratio is one IEEE division of exact ints (the proven
    dup_token_ratio convention)."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id", TX.word_shingles_of(F.col("_toks"), 3).alias("_sh")
    )
    n = F.size("_sh")
    nd = F.size(F.array_distinct("_sh"))
    return toked.select(
        "doc_id",
        n.alias("n_ngrams"),
        nd.alias("n_distinct"),
        F.when(n <= 0, F.lit(0.0))
        .otherwise((n - nd).cast("double") / n.cast("double"))
        .alias("dup_ngram_ratio"),
    )


SQL_NGRAM_REPETITION = (
    _SQL_SHINGLES
    + """
SELECT doc_id,
       CAST(len(shingles) AS INTEGER) AS n_ngrams,
       CAST(len(list_distinct(shingles)) AS INTEGER) AS n_distinct,
       CASE WHEN len(shingles) <= 0 THEN 0.0
            ELSE CAST(len(shingles) - len(list_distinct(shingles)) AS DOUBLE)
                 / CAST(len(shingles) AS DOUBLE)
       END AS dup_ngram_ratio
FROM sh
"""
)


# ---------------------------------------------------------------------------
# JL random projection — dimensionality reduction as exact ± sums
# ---------------------------------------------------------------------------
_PROJ_DIM = 8


def q_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First ``_PROJ_DIM`` Johnson–Lindenstrauss components per embedding,
    surfaced as scalar columns (array columns can't be driver-hashed — a1
    lesson).  Components are exact left-associated ± sums of elements, so
    no rounding is needed for cross-engine equality."""
    from service_alerts_connector_spark.operators.similarity import (
        project_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # dim=64 pinned by the oracle's plane literals (see _sql_embedding_
    # project) — skips the operator's head-row dim probe job
    proj = project_embeddings(emb, out_dim=_PROJ_DIM, seed=7, dim=64)
    return proj.select(
        "vec_id",
        *[F.element_at("projected", j + 1).alias(f"p{j}") for j in range(_PROJ_DIM)],
    )


def _sql_embedding_project() -> str:
    from service_alerts_connector_spark.operators.similarity import (
        seeded_hyperplanes,
    )

    planes = seeded_hyperplanes(_PROJ_DIM, 64, seed=7)
    comps = ",\n       ".join(
        f"({_sql_proj('v', planes[j])}) AS p{j}" for j in range(_PROJ_DIM)
    )
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT vec_id,
       {comps}
FROM base
"""


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — int8 embedding compression, bit-exact oracle
# ---------------------------------------------------------------------------
def q_embedding_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector SQ8 codes + scale.  Every arithmetic step is one
    exactly-rounded IEEE op, so the int codes and the double scale match
    DuckDB bit-for-bit with zero rounding concessions; codes surface
    comma-joined (array cells can't be driver-hashed — a1 lesson)."""
    from service_alerts_connector_spark.operators.similarity import (
        quantize_embeddings_sq8,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = quantize_embeddings_sq8(emb)
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), ",").alias(
            "codes_csv"
        ),
    )


SQL_EMBEDDING_SQ8 = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), scaled AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
  FROM base
)
SELECT vec_id, scale,
       array_to_string(
         CASE WHEN scale = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(
                     v, x -> CAST(floor(x / scale * 127 + 0.5) AS INTEGER))
         END, ',') AS codes_csv
FROM scaled
"""


def q_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 served from the SQ8 codes alone (integer dot products;
    the per-vector scales cancel in the cosine).  The driver-side query
    quantization uses the identical IEEE recipe, so Spark and DuckDB
    produce the same codes, the same exact integer dots, and hence the
    same rounded scores."""
    from service_alerts_connector_spark.operators.similarity import (
        quantize_embeddings_sq8,
        sq8_cosine_topk,
        sq8_quantize_vec,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][
        "embedding"
    ]
    quant = quantize_embeddings_sq8(emb)
    return sq8_cosine_topk(quant, sq8_quantize_vec(qvec), k=10)


SQL_ANN_SQ8 = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), scaled AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
  FROM base
), codes AS (
  SELECT vec_id,
         CASE WHEN scale = 0
              THEN list_transform(v, x -> CAST(0 AS DOUBLE))
              ELSE list_transform(v, x -> floor(x / scale * 127 + 0.5))
         END AS c
  FROM scaled
), q AS (
  SELECT c AS qc FROM codes WHERE vec_id = 0
)
SELECT codes.vec_id,
       round(list_dot_product(c, qc)
             / (sqrt(list_dot_product(c, c)) * sqrt(list_dot_product(qc, qc))),
             6) AS qcos
FROM codes, q
WHERE list_dot_product(c, c) > 0
ORDER BY qcos DESC, codes.vec_id ASC
LIMIT 10
"""


def q_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: coarse SQ8 recall of 100 candidates over the whole
    corpus (integer dots on 4×-compressed codes), exact milli-int rerank
    of just those 100 — the recall→precision serving split every vector
    store runs at scale.  Both stages are exact-integer cross-engine
    (see operators/similarity.py two_stage_ann)."""
    from service_alerts_connector_spark.operators.similarity import (
        two_stage_ann,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return two_stage_ann(emb, qvec, recall_k=100, k=10)


SQL_ANN_RERANK = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), scaled AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
  FROM base
), codes AS (
  SELECT vec_id,
         CASE WHEN scale = 0
              THEN list_transform(v, x -> CAST(0 AS DOUBLE))
              ELSE list_transform(v, x -> floor(x / scale * 127 + 0.5))
         END AS c
  FROM scaled
), q AS (
  SELECT c AS qc FROM codes WHERE vec_id = 0
), coarse AS (
  SELECT codes.vec_id
  FROM codes, q
  WHERE list_dot_product(c, c) > 0
  ORDER BY round(list_dot_product(c, qc)
                 / (sqrt(list_dot_product(c, c))
                    * sqrt(list_dot_product(qc, qc))), 6) DESC,
           codes.vec_id ASC
  LIMIT 100
), milli AS (
  SELECT vec_id, list_transform(v, x -> floor(x * 1000)) AS m
  FROM base
  WHERE vec_id IN (SELECT vec_id FROM coarse)
), qm AS (
  SELECT list_transform(v, x -> floor(x * 1000)) AS mq
  FROM base WHERE vec_id = 0
)
SELECT milli.vec_id,
       round(list_dot_product(m, mq)
             / (sqrt(list_dot_product(m, m)) * sqrt(list_dot_product(mq, mq))),
             6) AS rcos
FROM milli, qm
WHERE list_dot_product(m, m) > 0
ORDER BY rcos DESC, milli.vec_id ASC
LIMIT 10
"""


def q_ann_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch serving: exact top-5 for five query vectors in one corpus
    scan, per-query ranking via the salted two-phase prune (no
    corpus-sized window group — same discipline as kmv_distinct)."""
    from service_alerts_connector_spark.operators.similarity import (
        batch_cosine_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 5).collect()
    ]
    return batch_cosine_topk(emb, qs, k=5)


# The oracle mirrors the exact math (cast to double, dot/norms, round 6)
# but ranks with a single window per query — fine single-node; the salted
# phase is an exact prune so results agree.
SQL_ANN_BATCH = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, b.vec_id,
         round(list_dot_product(b.v, q.qv)
               / (sqrt(list_dot_product(b.v, b.v))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
  FROM base b, q
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, vec_id ASC
         ) AS rn
  FROM scored
)
SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 5
ORDER BY query_id, cos DESC, vec_id ASC
"""


def q_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd update step with pinned centroids (the
    milli-quantized embeddings of vec_id 1..4) — exact integer sufficient
    statistics per (cell, dim), so the *update* half of iterative k-means
    training is differentially oracled the same way ``ann_ivf_fixed``
    oracles the *assignment* half (the full training loop is these two
    steps repeated)."""
    import math

    from service_alerts_connector_spark.operators.similarity import (
        kmeans_update_stats,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.where(F.col("vec_id").between(1, 4))
        .orderBy("vec_id")
        .select("embedding")
        .collect()  # bounded: 4 rows
    )
    cents_milli = [
        [math.floor(float(x) * 1000.0) for x in r["embedding"]]
        for r in cent_rows
    ]
    return kmeans_update_stats(emb, cents_milli)


SQL_KMEANS_UPDATE = """
WITH em AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        v -> CAST(floor(v * 1000) AS BIGINT)) AS xm
  FROM embeddings
), ed AS (
  SELECT vec_id, generate_subscripts(xm, 1) AS i, unnest(xm) AS x FROM em
), cd AS (
  SELECT CAST(vec_id - 1 AS INTEGER) AS cell,
         generate_subscripts(xm, 1) AS i, unnest(xm) AS c
  FROM em WHERE vec_id BETWEEN 1 AND 4
), dists AS (
  SELECT e.vec_id, c.cell, sum((e.x - c.c) * (e.x - c.c)) AS d2
  FROM ed e JOIN cd c USING (i) GROUP BY e.vec_id, c.cell
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY d2 ASC, cell ASC
           ) AS rn
    FROM dists
  ) WHERE rn = 1
)
SELECT a.cell, CAST(e.i - 1 AS INTEGER) AS d,
       count(*) AS n_members, CAST(sum(e.x) AS BIGINT) AS sum_milli
FROM assign a JOIN ed e USING (vec_id)
GROUP BY a.cell, e.i
"""



# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking — entity-resolution candidate generation
# ---------------------------------------------------------------------------
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup candidates over the documents' first
    token (the fuzzy "name" key): rank by (key, doc_id), pair every row
    with its 3 rank-successors, keep pairs within 2 Levenshtein edits —
    `operators/textdedup.sorted_neighborhood_pairs`.

    The rank is assigned WITHOUT a global row_number window (two-phase
    monotone first-byte buckets, ≤256-row driver offset table); the
    oracle's plain ``row_number() OVER (ORDER BY key, doc_id)`` is the
    semantic spec the distributed plan must reproduce exactly — which
    pins the bucketing's global-order claim cross-engine.
    """
    from service_alerts_connector_spark.functions.text import tokens
    from service_alerts_connector_spark.operators.textdedup import (
        sorted_neighborhood_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.element_at(tokens(F.col("text")), 1), F.lit("")).alias(
            "first_tok"
        ),
    )
    return sorted_neighborhood_pairs(
        docs, "first_tok", "doc_id", window=3, max_dist=2
    ).orderBy("id_a", "id_b")


SQL_SORTED_NEIGHBORHOOD = """
WITH keyed AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) IS NULL OR trim(lower(text)) = ''
              THEN ''
              ELSE string_split_regex(trim(lower(text)), '\\s+')[1]
         END AS k
  FROM documents
), ranked AS (
  SELECT doc_id, k,
         row_number() OVER (ORDER BY k ASC, doc_id ASC) - 1 AS rank
  FROM keyed
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       a.k AS key_a, b.k AS key_b,
       CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
FROM ranked a
JOIN ranked b
  ON b.rank - a.rank BETWEEN 1 AND 3
WHERE levenshtein(a.k, b.k) <= 2
ORDER BY id_a, id_b
"""



# ---------------------------------------------------------------------------
# Golden record / survivorship — merge a duplicate group into one canonical row
# ---------------------------------------------------------------------------
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record construction) — the step AFTER
    candidate generation in an MDM/dedup pipeline: every blocking group
    collapses to ONE canonical row under explicit field-level rules.

    Blocking key = (lang, first token); survivorship rules exercised:
    "richest value wins" (representative = longest text, doc_id
    tiebreak — a min_by on the complement-length‖id selector),
    "most frequent wins" (modal source via a (group, source) pre-count +
    the same selector pattern), and "aggregate" (member count, total
    chars).  Only groups that actually merge (≥ 2 members) surface.

    Scale shape: two map-side-combinable aggregations (group×source,
    then group) + one broadcast-sized join of the modal-source slice —
    no window, no self-join; at 100 TB the group agg is the only
    corpus-sized shuffle.
    """
    from service_alerts_connector_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.coalesce(F.element_at(tokens(F.col("text")), 1), F.lit("")).alias(
            "block_key"
        ),
    )
    rep_sel = F.concat(
        F.lpad((F.lit(999999999999) - F.col("n_chars")).cast("string"), 12, "0"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0"),
    )
    groups = (
        docs.withColumn("_sel", rep_sel)
        .groupBy("lang", "block_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min_by("doc_id", F.col("_sel")).cast("long").alias("rep_doc_id"),
            F.max("n_chars").cast("long").alias("rep_n_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    src_counts = docs.groupBy("lang", "block_key", "source").agg(
        F.count(F.lit(1)).alias("n_src")
    )
    modal_sel = F.concat(
        F.lpad((F.lit(999999999999) - F.col("n_src")).cast("string"), 12, "0"),
        F.col("source"),
    )
    modal = (
        src_counts.withColumn("_msel", modal_sel)
        .groupBy("lang", "block_key")
        .agg(F.min_by("source", F.col("_msel")).alias("modal_source"))
    )
    return (
        groups.where(F.col("n_members") >= 2)
        .join(modal, ["lang", "block_key"])
        .select(
            "lang",
            "block_key",
            "n_members",
            "rep_doc_id",
            "rep_n_chars",
            "modal_source",
            "total_chars",
        )
        .orderBy("lang", "block_key")
    )


SQL_GOLDEN_RECORD = """
WITH docs AS (
  SELECT doc_id, lang, source, n_chars,
         CASE WHEN trim(lower(text)) IS NULL OR trim(lower(text)) = ''
              THEN ''
              ELSE string_split_regex(trim(lower(text)), '\\s+')[1]
         END AS block_key
  FROM documents
), groups AS (
  SELECT lang, block_key,
         count(*) AS n_members,
         arg_min(doc_id,
                 lpad(CAST(999999999999 - n_chars AS VARCHAR), 12, '0')
                   || lpad(CAST(doc_id AS VARCHAR), 12, '0')) AS rep_doc_id,
         max(n_chars) AS rep_n_chars,
         sum(n_chars) AS total_chars
  FROM docs GROUP BY lang, block_key
), src_counts AS (
  SELECT lang, block_key, source, count(*) AS n_src
  FROM docs GROUP BY lang, block_key, source
), modal AS (
  SELECT lang, block_key,
         arg_min(source,
                 lpad(CAST(999999999999 - n_src AS VARCHAR), 12, '0')
                   || source) AS modal_source
  FROM src_counts GROUP BY lang, block_key
)
SELECT g.lang, g.block_key,
       CAST(g.n_members AS BIGINT) AS n_members,
       CAST(g.rep_doc_id AS BIGINT) AS rep_doc_id,
       CAST(g.rep_n_chars AS BIGINT) AS rep_n_chars,
       m.modal_source,
       CAST(g.total_chars AS BIGINT) AS total_chars
FROM groups g JOIN modal m
  ON m.lang = g.lang AND m.block_key = g.block_key
WHERE g.n_members >= 2
ORDER BY g.lang, g.block_key
"""



# ---------------------------------------------------------------------------
# ANN recall evaluation — approx-vs-exact retrieval quality as a query
# ---------------------------------------------------------------------------
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the SQ8-served ANN against exact
    cosine, as one self-contained query: recall@10 and MRR of the exact
    top-10 within the approximate list — the metrics every vector-store
    deployment tracks before trading precision for speed.

    Ranks inside the 10-row approximate list come from a 10×10 ordering
    self-join (count of rows at-or-before under the (score desc, id)
    total order) — NOT a window, keeping the catalog's no-unpartitioned-
    window invariant even on tiny frames.  recall_ppm and mrr_micro stay
    in exact integers (10⁶ div k, Σ 10⁶ div rank).

    Scale shape: both candidate lists are corpus-scan + TakeOrdered
    pipelines (their own catalog entries); everything in this query
    beyond them touches ≤ 10-row frames.
    """
    exact = q_ann_cosine_topk(spark, sf_dir).select(
        F.col("vec_id").alias("eid")
    )
    approx = q_ann_sq8(spark, sf_dir).select("vec_id", "qcos")
    other = approx.select(
        F.col("vec_id").alias("ovid"), F.col("qcos").alias("oq")
    )
    ranked = (
        approx.join(
            other,
            (F.col("oq") > F.col("qcos"))
            | ((F.col("oq") == F.col("qcos")) & (F.col("ovid") <= F.col("vec_id"))),
        )
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("rank"))
    )
    hits = exact.join(ranked, F.col("eid") == F.col("vec_id"), "inner")
    return hits.agg(
        F.lit(10).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.expr("(count(1) * 1000000) div 10").alias("recall_ppm"),
        F.sum(F.expr("1000000 div rank")).cast("long").alias("mrr_sum_micro"),
    )


SQL_ANN_RECALL_EVAL = f"""
WITH exact AS (
  SELECT vec_id AS eid FROM ({SQL_ANN_TOPK})
), approx AS (
  SELECT * FROM ({SQL_ANN_SQ8})
), ranked AS (
  SELECT a.vec_id, count(*) AS rank
  FROM approx a JOIN approx o
    ON (o.qcos > a.qcos) OR (o.qcos = a.qcos AND o.vec_id <= a.vec_id)
  GROUP BY a.vec_id
)
SELECT CAST(10 AS BIGINT) AS k,
       count(*) AS n_hits,
       (count(*) * 1000000) // 10 AS recall_ppm,
       CAST(sum(1000000 // rank) AS BIGINT) AS mrr_sum_micro
FROM exact e JOIN ranked r ON r.vec_id = e.eid
"""



# ---------------------------------------------------------------------------
# Asymmetric containment — excerpt/quote detection (A ⊂ B, not A ≈ B)
# ---------------------------------------------------------------------------
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT pairs: |A∩B| / |A| per direction, in exact
    per-mille — the asymmetric companion to Jaccard that catches
    EXCERPTS (a short doc fully inside a long one scores containment
    ≈ 1000 while its Jaccard stays tiny, so the symmetric tier never
    surfaces it).  The dedup decision for quotes, boilerplate
    inclusions, and retranslations.

    Same candidate-restricted contract and per-shingle pair expansion
    as ``dedup_jaccard`` (the LSH tier feeds this at scale); kept pairs
    have max(containment) ≥ 500 ‰.  All arithmetic integer (n_inter ×
    1000 div n_side).
    """
    from service_alerts_connector_spark.functions.text import (
        tokens,
        word_shingles_of,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    sh = docs.select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles_of(F.col("_toks"), 3))
        ).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_inter",
            F.expr("(n_inter * 1000) div n_a").alias("cont_a_in_b_pm"),
            F.expr("(n_inter * 1000) div n_b").alias("cont_b_in_a_pm"),
        )
        .where(
            (F.col("cont_a_in_b_pm") >= 500) | (F.col("cont_b_in_a_pm") >= 500)
        )
        .orderBy("id_a", "id_b")
    )


SQL_CONTAINMENT = (
    _SQL_SHINGLES
    + """
, ex AS (
  SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
                                  WHERE doc_id < 200)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b, CAST(i.n_inter AS BIGINT) AS n_inter,
       (i.n_inter * 1000) // sa.n AS cont_a_in_b_pm,
       (i.n_inter * 1000) // sb.n AS cont_b_in_a_pm
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE (i.n_inter * 1000) // sa.n >= 500 OR (i.n_inter * 1000) // sb.n >= 500
ORDER BY i.id_a, i.id_b
"""
)


TEXT_QUERIES = {
    "text_pii_redact": q_text_pii_redact,
    "text_boilerplate": q_text_boilerplate,
    "text_repetition": q_text_repetition,
    "text_ngram_repetition": q_text_ngram_repetition,
    "embedding_project": q_embedding_project,
    "text_vocab_topk": q_text_vocab_topk,
    "text_length_histogram": q_text_length_histogram,
    "text_stats": q_text_stats,
    "text_lang_id": q_text_lang_id,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
    "dedup_near_keep": q_dedup_near_keep,
    "contamination": q_contamination,
    "ngram_decontamination": q_ngram_decontamination,
    "corpus_curation": q_corpus_curation,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_lsh_recall": q_dedup_lsh_recall,
    "dedup_prefix_filter": q_dedup_prefix_filter,
    "sorted_neighborhood": q_sorted_neighborhood,
    "golden_record": q_golden_record,
    "containment_pairs": q_containment_pairs,
    "ann_recall_eval": q_ann_recall_eval,
    "dedup_simhash": q_dedup_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_bucketed": q_ann_bucketed,
    "ann_ivf_fixed": q_ann_ivf_fixed,
    "ann_pq_fixed": q_ann_pq_fixed,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "semdedup_fixed": q_semdedup_fixed,
    "incremental_semdedup_fixed": q_incremental_semdedup_fixed,
    "embedding_sq8": q_embedding_sq8,
    "ann_sq8": q_ann_sq8,
    "ann_batch": q_ann_batch,
    "ann_rerank": q_ann_rerank,
    "kmeans_update": q_kmeans_update,
    "leakage_safe_split": q_leakage_safe_split,
}

TEXT_ORACLES = {
    "ann_batch": SQL_ANN_BATCH,
    "ann_rerank": SQL_ANN_RERANK,
    "kmeans_update": SQL_KMEANS_UPDATE,
    "leakage_safe_split": _sql_leakage_safe_split(),
    "embedding_sq8": SQL_EMBEDDING_SQ8,
    "ann_sq8": SQL_ANN_SQ8,
    "text_pii_redact": SQL_PII,
    "text_boilerplate": SQL_BOILERPLATE,
    "text_repetition": SQL_REPETITION,
    "text_ngram_repetition": SQL_NGRAM_REPETITION,
    "embedding_project": _sql_embedding_project(),
    "text_vocab_topk": SQL_VOCAB,
    "text_length_histogram": SQL_LENGTH_HIST,
    "text_stats": SQL_TEXT_STATS,
    "text_lang_id": SQL_LANG_ID,
    "text_quality": SQL_QUALITY,
    "text_fingerprint": SQL_FINGERPRINT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash_lsh": SQL_MINHASH_LSH,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_near_keep": SQL_DEDUP_NEAR_KEEP,
    "contamination": SQL_CONTAMINATION,
    "ngram_decontamination": SQL_NGRAM_DECONTAMINATION,
    "corpus_curation": SQL_CORPUS_CURATION,
    "dedup_jaccard": SQL_JACCARD,
    "dedup_lsh_recall": SQL_LSH_RECALL,
    "dedup_prefix_filter": SQL_PREFIX_FILTER,
    "sorted_neighborhood": SQL_SORTED_NEIGHBORHOOD,
    "golden_record": SQL_GOLDEN_RECORD,
    "containment_pairs": SQL_CONTAINMENT,
    "ann_recall_eval": SQL_ANN_RECALL_EVAL,
    "dedup_simhash": SQL_SIMHASH,
    "ann_cosine_topk": SQL_ANN_TOPK,
    "ann_bucketed": SQL_ANN_BUCKETED,
    "ann_ivf_fixed": SQL_ANN_IVF_FIXED,
    "ann_pq_fixed": SQL_ANN_PQ_FIXED,
    "dedup_embedding_cosine": SQL_DEDUP_EMB,
    "semdedup_fixed": SQL_SEMDEDUP,
    "incremental_semdedup_fixed": SQL_SEMDEDUP_FIRST,
}
