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
