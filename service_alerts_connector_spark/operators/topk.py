"""Ordered selection operators (SURVEY P10, P11, W1-W3).

The reference leans on positional order (``tail``, ``head``, ``iloc[-1]``,
unseeded ``sample``); the engine replaces each with a deterministic,
distributed equivalent:

* top-k by column      → ``orderBy().limit(k)``   (TakeOrderedAndProject —
                          no global sort materialization, each partition
                          keeps k candidates then the driver merges)
* best-match per group → window ``row_number() == 1``
* random sample of n   → ``orderBy(rand(seed)).limit(n)`` (seeded,
                          reproducible — SURVEY §7(d))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """P10 — ``orderBy(...).limit(k)``; Catalyst plans TakeOrderedAndProject.

    Pass a total order (include a key tiebreak) for deterministic results.
    """
    return df.orderBy(*order).limit(k)


def seeded_sample_n(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """P11 — deterministic n-row sample (reference's unseeded ``.sample()``
    at ServiceAlertAugmenter.py:561, pinned for reproducibility)."""
    return df.orderBy(F.rand(seed)).limit(n)


def stratified_sample_exact(
    df: DataFrame,
    group_cols: list[str],
    n_per_group: int,
    hash_key: Column,
) -> DataFrame:
    """Exact, engine-portable stratified sample: exactly ``n_per_group``
    rows per group (fewer if the stratum is smaller), selected by a
    content-hash order instead of an RNG.

    ``hash_key`` (e.g. ``F.md5(key.cast("string").cast("binary"))``) gives
    a uniform pseudo-random-but-deterministic order any engine reproduces
    bit-for-bit — unlike ``rand(seed)``, whose stream is engine-specific.
    The training-data use: class-balanced subcorpora with reproducible
    membership across reruns and engines.  One window shuffle on the
    group key; skewed strata are still a single partition each — for
    pathological strata pre-aggregate with ``skew.salted_aggregate``.
    """
    w = Window.partitionBy(*group_cols).orderBy(F.asc(hash_key))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def best_match_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column]
) -> DataFrame:
    """W3 — top-1 per group (e.g. best Levenshtein-scored street per alert,
    reference ServiceAlertAugmenter.py:163, 173)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


SAMPLE_STORE = "hash_sample_reservoir"


def incremental_sample_ingest(
    spark,
    root: str,
    batch: DataFrame,
    key_col: str,
    payload_cols: list[str],
    k: int = 256,
):
    """O(batch) maintenance of an exact uniform k-sample over everything
    ever ingested — the mergeable-reservoir member of the engine's
    incremental-store family (bands, digests, vectors, registers, cells,
    and now samples).

    The sample is bottom-k-by-md5 of the key (the ``kmv_synopsis`` /
    ``weighted_sample`` determinism rule): a content hash is a uniform
    draw, so the k smallest hashes are a uniform sample of the DISTINCT
    key set, and bottom-k is a MIN-MERGE — bottomk(A ∪ B) =
    bottomk(bottomk(A) ∪ bottomk(B)).  Therefore: N sequential ingests ≡
    one batch-mode bottom-k over the concatenation (pytest-pinned), a
    redelivered batch re-derives identical hash rows and vanishes in the
    distinct (idempotent, no ledger needed — the max/min-merge class,
    unlike the additive colstats cells), and the store is bounded at k
    rows forever.  Each ingest touches only the batch plus the k-row
    store; the batch's own bottom-k plans TakeOrderedAndProject (no
    global sort) and the merge sorts ≤ 2k rows.

    Contract: payload columns must be a pure function of the key
    (immutable records / content-addressed rows) — ``dropDuplicates`` on
    the hash keeps an arbitrary row per key, which is only deterministic
    when every row for a key is identical.  A mutable-record sample
    would need last-wins semantics (the ``operators/dedup.py`` upsert)
    BEFORE ingest.  And ``k`` must be CONSTANT across a store's life:
    once a bottom-k truncation discards a key, no later ingest can
    resurrect it, so growing k mid-stream yields a biased
    not-quite-k-sample.  The guard below persists k beside the store on
    first ingest and raises on any later mismatch.

    Store discipline per CLAUDE.md: previous version read pinned, and
    the RETURNED frame is forced (eager localCheckpoint of the ≤k-row
    merge) BEFORE the new version commits — an unpinned lazy read of
    ``current`` would silently resolve to a later ingest's sample, or
    hit a missing path mid-refresh, if the caller held it across the
    next ingest (the hazard the semdedup store fixed the same way)."""
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        persist_or_validate_store_param,
        read_dataset,
        write_dataset,
    )

    persist_or_validate_store_param(
        root,
        SAMPLE_STORE,
        "sample_k.txt",
        "k",
        k,
        "bias the sample (bottom-k truncation is irreversible)",
    )
    batch_s = (
        batch.select(
            F.md5(F.col(key_col).cast("string")).alias("_h"),
            *payload_cols,
        )
        .dropDuplicates(["_h"])
        .orderBy("_h")
        .limit(k)
    )
    versions = list_versions(root, SAMPLE_STORE)
    if versions:
        prev = read_dataset(spark, root, SAMPLE_STORE, version=versions[-1])
        merged = (
            prev.unionByName(batch_s)
            .dropDuplicates(["_h"])
            .orderBy("_h")
            .limit(k)
        )
    else:
        merged = batch_s
    merged = merged.localCheckpoint(eager=True)
    write_dataset(merged, root, SAMPLE_STORE)
    return merged
