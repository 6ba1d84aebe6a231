"""Corpus-saturation operators: n-gram novelty attribution, rarity-based
document scoring, and an incremental first-occurrence shingle store.

A 100 TB curation loop needs to know *when to stop collecting*: each new
source (or each arriving ingest batch) contributes some share of n-grams
the corpus has never seen, and that share decays as the corpus saturates
(the motivation behind dedup-pressure curves in large-scale dataset
reports).  These operators measure that decay two ways:

- **Batch attribution** (``ngram_novelty_by_source``): over the full
  corpus, attribute every distinct word k-shingle to the source of its
  first-occurrence document (min ``doc_id`` — unique, so the attribution
  is total-order deterministic, the ``min_by``/``arg_min`` oracle rule).
  One shuffle on the shingle, one on the source: the per-shingle pass
  folds presence (``collect_set(source)``, bounded by #sources) and
  first-owner (``min_by``) into a single aggregation, so the corpus is
  never re-shuffled for the two metrics separately.

- **Incremental tracking** (``incremental_novelty_ingest``): a persistent
  store of every shingle digest ever seen with the batch that introduced
  it.  Per ingest the work is O(batch ∪ store-anti-join): the arriving
  batch's distinct digests anti-join the store, survivors are appended
  under the new batch id.  Set-union with first-wins attribution is
  idempotent at the set level, and the ingested-batch ledger (committed
  atomically with the digests, one ``_SUCCESS``) makes the *reported
  metric* exactly-once: a redelivered batch re-derives its ORIGINAL
  novelty from the store's ``first_batch`` column instead of reporting a
  bogus 0 (every digest would already be present).  Telescoping
  invariant (pytest-pinned): Σ n_novel over distinct delivered batches
  == COUNT(DISTINCT shingle) over their union — the saturation curve
  integrates to the vocabulary size.

- **Rarity scoring** (``doc_rarity_scores``): integer-exact idf in micro
  units — ``(n_docs * 1_000_000) div doc_freq`` — averaged over a
  document's token occurrences.  Rare-token-heavy documents are a
  classic noise tell in web-corpus quality filtering; keeping the score
  in 64-bit integer arithmetic end-to-end makes it engine-exact (no
  libm ``log``, whose last ulp differs per platform — the same dodge
  ``tfidf_top_terms`` uses).

The reference corpus surface is plain pandas string cleaning
(``ServiceAlertFixer.py``); these extend it with the saturation metrics
a training-data pipeline needs (SURVEY §2 training-pipeline mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from service_alerts_connector_spark.functions.text import (
    tokens,
    word_shingles_of,
)

NOVELTY_STORE = "novelty_shingles"
# space-prefixed sentinel: collides with no md5 hex digest
_LEDGER_DIGEST = " batch"

DOCFREQ_STORE = "docfreq_cells"
# space-prefixed sentinels: whitespace tokens can't survive tokens()'s
# \s+ split, so no real token collides
_DF_LEDGER_PREFIX = " batch:"
_DF_NDOCS = " n_docs"
# bottom-k KMV sketch of every ingested doc-id digest (the disjointness
# tripwire's memory); rows ride the same atomic version write
_DF_SKETCH_PREFIX = " docsketch:"
_DOC_SKETCH_K = 1024


def ngram_novelty_by_source(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-source first-occurrence novelty over word k-shingles.

    For every distinct shingle in the corpus, the *owner* is the source
    of the minimum-``doc_id`` document containing it.  Per source:
    ``n_shingles`` = distinct shingles present, ``n_novel`` = shingles
    owned, ``novelty_ppm`` = owned-per-million-present.  A source whose
    novelty_ppm is near zero adds no new n-grams — the collect-more
    signal inverted.

    Plan shape: ONE aggregation keyed on the shingle (min_by owner +
    collect_set presence, the set bounded by #sources), one explode of
    the tiny presence set, one aggregation keyed on source.  No join
    against the corpus, no per-shingle window.

    NULL sources group under the ``<null>`` label: ``collect_set`` drops
    NULLs and ``min_by`` would return a NULL owner, so without the
    coalesce a shingle first seen in a null-source doc would be owned by
    NOBODY and Σ n_novel would silently undercount the vocabulary —
    breaking the telescoping invariant the property test pins.
    """
    base = docs.select(
        "doc_id",
        F.coalesce(F.col("source"), F.lit("<null>")).alias("source"),
        tokens(F.col("text")).alias("toks"),
    )
    sh = base.select(
        "doc_id",
        "source",
        F.explode(word_shingles_of(F.col("toks"), k)).alias("sh"),
    )
    per_shingle = sh.groupBy("sh").agg(
        F.min_by("source", "doc_id").alias("first_source"),
        F.collect_set("source").alias("srcs"),
    )
    exploded = per_shingle.select(
        F.col("first_source"), F.explode("srcs").alias("source")
    )
    return (
        exploded.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.coalesce(
                F.sum(
                    F.when(F.col("source") == F.col("first_source"), 1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "source",
            "n_shingles",
            "n_novel",
            F.expr("(n_novel * 1000000) div n_shingles").alias(
                "novelty_ppm"
            ),
        )
        .orderBy("source")
    )


def doc_rarity_scores(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """Top-``top_n`` documents by mean token rarity, integer-exact.

    rarity(token) = (n_docs * 1_000_000) div doc_freq(token) — an idf in
    micro units kept in exact integer arithmetic so Spark and any SQL
    oracle agree bit-for-bit.  A document's score is the integer mean of
    rarity over its token OCCURRENCES (repeated rare tokens weigh more,
    the quality-filter behaviour we want).  Documents with no tokens
    (empty/null text) carry no score and are excluded.

    Overflow discipline: the per-doc sum Σ n·idf can exceed int64 on
    exactly the documents this filter exists to catch (a 10k-token doc
    of df=1 tokens at 10⁹ corpus docs sums to ~10¹⁹ > 2⁶³, and Spark's
    non-ANSI long sum would WRAP — inverting the top-k while DuckDB's
    HUGEINT oracle stays correct).  The sum therefore runs in
    DECIMAL(38,0) (exact; Spark's decimal ``div`` returns the exact
    integral quotient as BIGINT, matching HUGEINT ``//``), leaving one
    residual bound: idf itself stays int64-exact while
    n_docs ≤ 9.2×10¹², beyond any 100 TB corpus.

    Plan shape: occurrences reduce ONCE to unique (doc, token) pairs
    with a repeat count — the doc-freq count-distinct becomes a plain
    count over those pairs (its two-phase expansion made explicit and
    REUSED), and the idf join probes the pair frame weighted by the
    count instead of re-shuffling every raw occurrence (measured 2.4×
    on a 20×-duplicated corpus: 15.6 → 6.4 s).  Top-k is
    TakeOrderedAndProject (per-partition partial top-k — never an
    unpartitioned window); the 1-row corpus count rides in on a
    broadcast cross join (BNLJ at 1×N is the documented harmless case).
    """
    occ = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    pairs = occ.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    freq = pairs.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("dfreq")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    rarity = freq.crossJoin(F.broadcast(n_docs)).select(
        "tok",
        F.expr("(n_docs * 1000000) div dfreq").alias("idf_micro"),
    )
    return (
        pairs.join(rarity, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * idf_micro")).alias(
                "_s"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("(_s div n_tokens)").alias("rarity_micro"),
        )
        .orderBy(F.col("rarity_micro").desc(), F.col("doc_id").asc())
        .limit(top_n)
    )


def batch_shingle_digests(docs: DataFrame, k: int = 3) -> DataFrame:
    """Distinct md5 digests of a batch's word k-shingles (one narrow
    column — 32 bytes/shingle into the store regardless of text size)."""
    base = docs.select(tokens(F.col("text")).alias("toks"))
    return (
        base.select(
            F.explode(word_shingles_of(F.col("toks"), k)).alias("sh")
        )
        .select(F.md5("sh").alias("digest"))
        .distinct()
    )


def novelty_curve(store: DataFrame) -> DataFrame:
    """The corpus saturation curve, re-derived from the store ALONE:
    (batch_id, n_novel) per ingested batch, including batches that
    contributed nothing (their ledger row exists; their digest count is
    0).  Because every digest carries its introducing batch, the curve
    needs no metric log — the store IS the metric.  Ordered by batch_id
    string; the streaming loops zero-pad their ``<namespace>-<epoch>``
    keys to 12 digits so lexicographic == arrival order (callers
    inventing their own keys own the same obligation)."""
    ledger = store.where(F.col("digest") == _LEDGER_DIGEST).select(
        F.col("first_batch").alias("batch_id")
    )
    counts = (
        store.where(F.col("digest") != _LEDGER_DIGEST)
        .groupBy("first_batch")
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
        .withColumnRenamed("first_batch", "batch_id")
    )
    return (
        ledger.join(counts, "batch_id", "left")
        .select(
            "batch_id",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
        .orderBy("batch_id")
    )


def ingested_novelty_batches(store: DataFrame) -> list[str]:
    """Batch ids committed into a novelty store frame (ledger rows)."""
    return [
        r["first_batch"]
        for r in store.where(
            F.col("digest") == _LEDGER_DIGEST
        ).collect()
    ]


def _novelty_stats(
    batch_digests: DataFrame, novel_count: DataFrame, batch_id: str
) -> DataFrame:
    """1-row stats frame: (batch_id, n_shingles, n_novel, novelty_ppm).
    Both inputs are 1-row aggregates; the cross join broadcasts."""
    n_batch = batch_digests.agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    return (
        n_batch.crossJoin(F.broadcast(novel_count))
        .select(
            F.lit(batch_id).alias("batch_id"),
            "n_shingles",
            "n_novel",
            F.when(F.col("n_shingles") > 0,
                   F.expr("(n_novel * 1000000) div n_shingles"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


def incremental_novelty_ingest(
    spark,
    root: str,
    batch: DataFrame,
    batch_id: str,
    k: int = 3,
) -> DataFrame:
    """O(batch) maintenance of the first-occurrence shingle store; returns
    the 1-row novelty stats frame for ``batch_id``.

    Exactly-once: the ledger row commits atomically with the digests
    (one ``write_dataset`` job, one ``_SUCCESS``).  A redelivered batch
    is recognized and re-derives its ORIGINAL stats from the store's
    ``first_batch`` attribution — no second version, no zeroed metric.

    ``k`` is an irreversible store parameter (digests of k-shingles and
    k'-shingles live in disjoint spaces, so mixing silently reports
    everything as novel): persisted beside the store on first ingest,
    re-validated on every later one (the sample-store k rule).

    Cost honesty: the anti-join PROBE is O(batch), but each version
    commit rewrites prev ∪ novel — O(store) write I/O per ingest, the
    same full-snapshot discipline as the sibling band/shingle/semdedup
    stores (what buys the one-``_SUCCESS`` crash story).  Measured
    (``tools/measure_store_growth.py``; SCALE.md "Saturation-store
    growth curve"): per-ingest cost stays flat across a 20× store
    growth to 544 k rows at sf0.1 — the rewrite term only bites when
    store bytes / write throughput rivals the ~2 s fixed cost, i.e.
    GB-scale stores, where the documented swap is
    ``sources/lakehouse.py``'s Delta MERGE (true file-level appends +
    a transaction log).  Version history is retention-bounded
    (``write_dataset(prune=5)``).  Sequential-ingest loops in ONE
    session must gc-settle periodically or pay localCheckpoint
    block-cleanup debt (5–12× tail spikes; see the SCALE.md row).

    The returned frame is forced (eager localCheckpoint) before the new
    version commits, so callers holding it across later ingests never
    read through a retention-pruned version (store discipline per
    CLAUDE.md / ``operators/topk.py incremental_sample_ingest``).
    """
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        persist_or_validate_store_param,
        read_dataset,
        write_dataset,
    )

    persist_or_validate_store_param(
        root,
        NOVELTY_STORE,
        "shingle_k.txt",
        "k",
        k,
        "mark every shingle novel (disjoint digest spaces)",
    )
    versions = list_versions(root, NOVELTY_STORE)
    if versions:
        prev = read_dataset(
            spark, root, NOVELTY_STORE, version=versions[-1]
        )
        if batch_id in ingested_novelty_batches(prev):
            novel_count = prev.where(
                (F.col("digest") != _LEDGER_DIGEST)
                & (F.col("first_batch") == batch_id)
            ).agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
            return _novelty_stats(
                batch_shingle_digests(batch, k), novel_count, batch_id
            ).localCheckpoint(eager=True)
    else:
        prev = None

    # Pin ONE evaluation of each expensive subtree (CLAUDE.md multi-
    # consumer rule): batch_dg feeds the anti-join AND the n_shingles
    # count; novel feeds the stats count AND the version write — unpinned,
    # the shingling would run 3× and the O(store) anti-join 2× per ingest.
    batch_dg = batch_shingle_digests(batch, k).localCheckpoint(eager=True)
    if prev is not None:
        novel = batch_dg.join(
            prev.select("digest"), "digest", "left_anti"
        ).select("digest", F.lit(batch_id).alias("first_batch"))
    else:
        novel = batch_dg.select(
            "digest", F.lit(batch_id).alias("first_batch")
        )
    # the eager pin also forces `novel` BEFORE the commit: it reads the
    # PREVIOUS version through the anti-join — a lazy return would break
    # once retention prunes that dir
    novel = novel.localCheckpoint(eager=True)

    ledger_row = spark.createDataFrame(
        [(_LEDGER_DIGEST, batch_id)], "digest string, first_batch string"
    )
    merged = novel.unionByName(ledger_row)
    if prev is not None:
        merged = prev.unionByName(merged)
    novel_count = novel.agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    stats = _novelty_stats(
        batch_dg, novel_count, batch_id
    ).localCheckpoint(eager=True)
    write_dataset(merged, root, NOVELTY_STORE)
    return stats


def batch_docfreq_cells(docs: DataFrame) -> DataFrame:
    """(tok → dfreq) cells for one batch: distinct (doc, token) pairs
    counted per token, plus the ``n_docs`` sentinel cell.  Additive
    across DISJOINT batches (each doc arrives exactly once), which is
    what makes the store mergeable — the colstats cell-histogram class."""
    pairs = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.lit(1))
    )
    cells = pairs.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("dfreq")
    )
    ndocs_row = docs.agg(
        F.lit(_DF_NDOCS).alias("tok"),
        F.count(F.lit(1)).cast("long").alias("dfreq"),
    )
    return cells.unionByName(ndocs_row)


def ingested_docfreq_batches(store: DataFrame) -> list[str]:
    return [
        r["tok"][len(_DF_LEDGER_PREFIX):]
        for r in store.where(
            F.col("tok").startswith(_DF_LEDGER_PREFIX)
        ).collect()
    ]


def _batch_doc_digests(batch: DataFrame) -> DataFrame:
    """Distinct md5 digests of a batch's doc ids — the unit the
    disjointness tripwire reasons about."""
    return batch.select(
        F.md5(F.col("doc_id").cast("string")).alias("dg")
    ).distinct()


def incremental_docfreq_ingest(
    spark,
    root: str,
    batch: DataFrame,
    batch_id: str,
    batch_cells: DataFrame | None = None,
) -> DataFrame:
    """O(batch) maintenance of the global document-frequency store —
    the statistic ``doc_rarity_scores`` needs, kept incrementally so a
    100 TB corpus never recomputes global dfreq per scoring pass.

    Counts are ADDITIVE (each document is delivered in exactly one
    batch), so redelivery would double them — the ingested-batch ledger
    commits atomically with the cells inside one version write, making
    a replayed ``batch_id`` a committed no-op (the
    ``operators/colstats.py incremental_column_stats_ingest`` crash
    story, applied to the token domain).  Store size is bounded at the
    vocabulary (+1 ``n_docs`` cell, +1 ledger row per batch, +≤1024
    sketch rows).

    Contract: batches must partition the corpus by document — a doc
    re-sent in a LATER batch under a new batch_id double-counts dfreq
    by construction.  No ledger can PROVE disjointness without storing
    every doc id (O(corpus)), but a bottom-k KMV sketch of ingested
    doc-id digests is a cheap probabilistic tripwire: any EXACT digest
    match between a new batch and the sketch means a doc id reappeared
    (md5 collisions aside, a repeated digest IS a repeated id — zero
    false positives on unique ids), so the ingest raises with sample
    offending ids.  Detection is one-sided: the sketch holds the k
    smallest of N ingested digests, so a single replayed doc trips
    w.p. ≈ k/N and a replayed batch of b docs w.p. ≈ 1 − e^(−bk/N) —
    near-certain for the gross violations the guard exists for (a
    replayed feed, a re-pointed upstream), vanishing for one stray doc
    at billion-doc scale, which is the honest limit of bounded state.
    The sketch rows commit atomically with the counts (same version
    write, same ``_SUCCESS``), so a crash before commit never leaves a
    sketch that accuses the legitimate retry.

    Upgrade caveat: a store created BEFORE the sketch existed holds no
    sketch rows, and doc ids are not recoverable from the counts, so
    backfill is impossible — the sketch only ever covers batches
    ingested after the upgrade.  Replays of the pre-upgrade corpus are
    permanently undetectable; the 1−e^(−bk/N) detection claim applies
    to post-upgrade ingests only.  Rebuilding the store from the raw
    corpus is the only way to regain full coverage.

    ``batch_cells`` (r16, optimization hook): a caller that ingests
    SEVERAL batches back-to-back may pre-compute each batch's
    ``batch_docfreq_cells`` frame concurrently (guide §2.6 overlapping
    independent jobs — the cell aggregation depends only on the batch,
    never on the store) and pass the pinned frame here; the ingest then
    skips its own cell pass.  The caller owns the equivalence obligation
    (the frame must be ``batch_docfreq_cells(batch)`` for THIS batch —
    pytest-pinned by test_docfreq_ingest_staged_cells_equivalent); the
    ledger short-circuit, tripwire probe and commit order are unchanged.

    Returns the refreshed 1-row (n_docs, vocab_size) stats frame,
    forced before commit.
    """
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
        write_dataset,
    )

    if batch_cells is None:
        batch_cells = batch_docfreq_cells(batch)
    ledger_row = spark.createDataFrame(
        [(_DF_LEDGER_PREFIX + batch_id, 0)], "tok string, dfreq long"
    )
    versions = list_versions(root, DOCFREQ_STORE)
    if versions:
        prev = read_dataset(spark, root, DOCFREQ_STORE, version=versions[-1])
        # ledger FIRST: a redelivered committed batch is a no-op, and
        # its docs are all in the sketch — probing it for overlap would
        # accuse every legitimate at-least-once redelivery.  The batch
        # digest frame is built only PAST this short-circuit so a
        # committed redelivery never pays the distinct-digest shuffle
        # (it feeds sketch_rows → merged, which is checkpointed once
        # before the write — no extra pin needed).
        if batch_id in ingested_docfreq_batches(prev):
            return docfreq_store_stats(prev).localCheckpoint(eager=True)
        batch_dg = _batch_doc_digests(batch)
        prev_sketch = prev.where(
            F.col("tok").startswith(_DF_SKETCH_PREFIX)
        ).select(
            F.substring(
                F.col("tok"), len(_DF_SKETCH_PREFIX) + 1, 32
            ).alias("dg")
        )
        offenders = [
            r["doc_id"]
            for r in batch.select(
                "doc_id",
                F.md5(F.col("doc_id").cast("string")).alias("dg"),
            )
            .join(F.broadcast(prev_sketch), "dg", "left_semi")
            .select("doc_id")
            .limit(5)
            .collect()
        ]
        if offenders:
            raise ValueError(
                f"docfreq store at {root!r}: batch {batch_id!r} re-sends "
                f"documents already ingested under an earlier batch "
                f"(sample doc_ids: {offenders}) — batches must partition "
                "the corpus by document (re-ingesting double-counts "
                "dfreq); dedupe the feed or rebuild the store"
            )
        prev_counts = prev.where(
            ~F.col("tok").startswith(_DF_SKETCH_PREFIX)
        )
        merged_counts = (
            prev_counts.unionByName(batch_cells)
            .unionByName(ledger_row)
            .groupBy("tok")
            .agg(F.sum("dfreq").cast("long").alias("dfreq"))
        )
        sketch_src = prev_sketch.unionByName(batch_dg)
    else:
        merged_counts = batch_cells.unionByName(ledger_row)
        sketch_src = _batch_doc_digests(batch)
    # bottom-k of old sketch ∪ batch digests = bottom-k of the full
    # ingested union (KMV merge law); TakeOrderedAndProject, no global
    # sort
    sketch_rows = (
        sketch_src.distinct()
        .orderBy("dg")
        .limit(_DOC_SKETCH_K)
        .select(
            F.concat(F.lit(_DF_SKETCH_PREFIX), F.col("dg")).alias("tok"),
            F.lit(0).cast("long").alias("dfreq"),
        )
    )
    merged = merged_counts.unionByName(sketch_rows)
    merged = merged.localCheckpoint(eager=True)
    # Bounded store (vocabulary + ≤1024 sketch + ledger rows): write ONE
    # file per version instead of a shuffle-partition-count spray of
    # KB-sized shards (guide §6 small-files — listing, open overhead and
    # the current-copy tree all scale with file count; at GB-scale store
    # bytes the documented Delta MERGE swap is the path anyway).
    write_dataset(merged.coalesce(1), root, DOCFREQ_STORE)
    # The returned stats frame needs no eager checkpoint of its own: its
    # lineage is pinned to `merged`'s already-materialized checkpoint
    # blocks, not to any version directory, so retention pruning cannot
    # invalidate it (the redelivery branch above DOES force, because there
    # the lineage reads a pinned version dir).  Saves one driver-blocking
    # job per ingest.
    return docfreq_store_stats(merged)


def docfreq_store_stats(store: DataFrame) -> DataFrame:
    """1-row (n_docs, vocab_size) from a docfreq store frame."""
    return store.agg(
        F.coalesce(
            F.sum(F.when(F.col("tok") == _DF_NDOCS, F.col("dfreq"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_docs"),
        F.count(
            F.when(
                (F.col("tok") != _DF_NDOCS)
                & (~F.col("tok").startswith(_DF_LEDGER_PREFIX))
                & (~F.col("tok").startswith(_DF_SKETCH_PREFIX)),
                F.lit(1),
            )
        )
        .cast("long")
        .alias("vocab_size"),
    )


def rarity_scores_from_store(store: DataFrame, docs: DataFrame) -> DataFrame:
    """Score documents against a PERSISTED docfreq store — the O(batch)
    scoring pass: only the scored docs tokenize and join; the corpus
    contributes nothing but the ≤vocabulary-sized idf frame.  With a
    store covering exactly the scored corpus this is bit-equal to
    ``doc_rarity_scores`` (pytest-pinned); with a larger corpus behind
    the store, scores reflect GLOBAL frequencies — the point of keeping
    the store.  Tokens absent from the store (dfreq would be 0) score
    as maximally rare: idf = n_docs × 10⁶ (one hypothetical occurrence
    — the standard unseen-token convention, kept integer-exact)."""
    n_docs_df = store.where(F.col("tok") == _DF_NDOCS).select(
        F.col("dfreq").alias("n_docs")
    )
    idf = (
        store.where(
            (F.col("tok") != _DF_NDOCS)
            & (~F.col("tok").startswith(_DF_LEDGER_PREFIX))
            & (~F.col("tok").startswith(_DF_SKETCH_PREFIX))
        )
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "tok",
            F.expr("(n_docs * 1000000) div dfreq").alias("idf_micro"),
        )
    )
    pairs = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        pairs.join(idf, "tok", "left")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "doc_id",
            "n",
            F.coalesce(
                F.col("idf_micro"), F.expr("n_docs * 1000000")
            ).alias("idf_eff"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            # DECIMAL(38,0) sum: see doc_rarity_scores' overflow note
            F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * idf_eff")).alias(
                "_s"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("(_s div n_tokens)").alias("rarity_micro"),
        )
    )
