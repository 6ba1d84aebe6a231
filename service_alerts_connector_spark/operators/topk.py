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
