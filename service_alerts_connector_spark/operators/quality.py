"""Data-quality rule screen — deequ-style declarative validation.

A lakehouse ingest gate evaluates a battery of rules (null checks, range
checks, set membership, pattern matches) over each batch and blocks or
quarantines on failure.  The shape that survives 100 TB is ONE pass per
table: every rule compiles to a conditional-sum aggregate expression, so
any number of rules costs a single map-side-combined aggregation — never
one scan per rule (the naive deequ deployment mistake).

The wide→long unpivot of per-rule counters happens on the 1-row aggregate
output via ``stack`` — zero extra shuffle.

Reference parity note: the reference's implicit quality gates (drop-null
Id/date at ingest, ``ServiceAlertBase.py`` field coercions) are point
fixes; this is the generalized, declarative form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rule_screen(
    df: DataFrame,
    rules: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Evaluate ``(rule_id, violation_predicate)`` pairs in ONE aggregation.

    A row violates a rule when its predicate is true; null predicate results
    count as violations too (a null range-check input IS a quality finding —
    matching SQL ``count(*) FILTER (...)`` semantics requires the explicit
    null coalesce, which this applies for the caller).

    Output: ``rule_id``, ``n_checked``, ``n_violations``, ``pass`` — one
    row per rule, produced by unpivoting the single aggregate row.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            F.sum(F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0))
            .cast("long")
            .alias(f"_v{i}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{rid}', _v{i}" for i, (rid, _) in enumerate(rules)
    )
    long = wide.select(
        F.col("_n"),
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule_id, n_violations)"
        ),
    )
    return long.select(
        "rule_id",
        F.col("_n").cast("long").alias("n_checked"),
        "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    )
