"""Lookup joins (SURVEY J1, J3, J4) and join-validation guards.

All reference joins are small-dimension lookups — broadcast-hash in Spark
(SURVEY §2.3).  At 100 TB the fact side streams through map-side hash probes
with zero shuffle; only `assert_unique_key` adds a (tiny, build-side-only)
agg job when validation is requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class JoinValidationError(ValueError):
    """Raised when a many-to-one validation fails (duplicate build-side keys)."""


def assert_unique_key(dim: DataFrame, keys: list[str]) -> None:
    """Re-implements pandas ``merge(validate='many_to_one')``
    (reference ServiceAlertFixer.py:126) as a build-side uniqueness check.

    Runs one small agg over the dimension only — never over the fact table.
    """
    dup = (
        dim.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise JoinValidationError(
            f"many_to_one violated: duplicate key {dict(dup[0].asDict())} in build side"
        )


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "left",
    validate_unique: list[str] | None = None,
    trim_keys: list[str] | None = None,
) -> DataFrame:
    """J1/J4 — left many-to-one lookup against a broadcast dimension.

    Reference ServiceAlertFixer.py:110-131 (request-number lookup) and
    ServiceAlertAugmenter.py:509-535 (area-polygon lookup; build-side names
    ``str.strip()``ped — pass ``trim_keys``).
    """
    if trim_keys:
        for k in trim_keys:
            dim = dim.withColumn(k, F.trim(F.col(k)))
    if validate_unique:
        assert_unique_key(dim, validate_unique)
    return fact.join(F.broadcast(dim), on, how)


def map_lookup(col: Column, mapping: dict[str, str]) -> Column:
    """J3 — tiny literal map lookup (hashtag per service_area,
    reference ServiceAlertAugmenter.py:52-62, 630).

    Compiles to a literal ``create_map``[col] — no join, no shuffle, fully
    codegen'd; the idiomatic form of ``Series.map(dict)`` for maps that fit
    in the plan.
    """
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)[col]
