"""Stats-driven physical planning: the CONSUMING side of the ANALYZE tier.

catalog_stats computes optimizer statistics (NDVs, System-R join
cardinalities, equi-depth split points); this module makes them drive
actual plan decisions, the loop a cost-based optimizer closes:

- ``estimate_table_bytes`` — one-aggregate byte estimate of a join side
  (exact octet lengths for strings + fixed widths for numerics), the
  statistic Spark's own ``autoBroadcastJoinThreshold`` consumes from its
  catalog when tables are ANALYZEd;
- ``stats_driven_join`` — broadcast-vs-shuffle chosen from that estimate
  instead of Spark's file-size heuristic (which over-broadcasts heavily
  compressed / highly selective sides and misses small PROJECTIONS of
  big tables — the estimate here is measured on the exact columns the
  join ships, post-projection);
- the equi-depth split points feed ``layout.write_range_partitioned``
  (deterministic range layout; see ``catalog_stats.q_range_partition_plan``
  for the balance audit of those bounds).

Plan shapes are pinned in tests/test_plan_shapes.py: the sub-threshold
side plans BroadcastHashJoin, the over-threshold side keeps the shuffle
join, with AQE free to re-plan only within the chosen strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Spark's default spark.sql.autoBroadcastJoinThreshold
DEFAULT_BROADCAST_BYTES = 10 * 1024 * 1024

_NUMERIC_WIDTH = {
    "bigint": 8,
    "double": 8,
    "long": 8,
    "int": 4,
    "integer": 4,
    "date": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
    "boolean": 1,
}


def row_bytes_expr(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Per-row byte estimate over ``cols`` (default: every column):
    exact ``octet_length`` for strings/binary, fixed type width for
    numerics.  Deterministic and engine-portable (DuckDB's
    ``octet_length`` agrees byte-for-byte on UTF-8), unlike sampled or
    compressed-size estimates."""
    dt = dict(df.dtypes)
    total = F.lit(0).cast("long")
    for c in cols or df.columns:
        t = dt[c]
        if t in ("string", "binary"):
            total = total + F.coalesce(
                F.octet_length(F.col(c)).cast("long"), F.lit(0)
            )
        else:
            total = total + F.lit(_NUMERIC_WIDTH.get(t, 8)).cast("long")
    return total


def estimate_table_bytes(df: DataFrame) -> tuple[int, int]:
    """(n_rows, est_bytes) from ONE map-side-combined aggregate — the
    1-row stat frame class (same budget as the bound collects)."""
    row = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(row_bytes_expr(df)).cast("long").alias("b"),
    ).first()
    return int(row["n"] or 0), int(row["b"] or 0)


def stats_driven_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
    est_bytes: int | None = None,
) -> DataFrame:
    """Equi-join whose physical strategy is chosen by the MEASURED
    post-projection byte size of the dim side: under the threshold the
    dim is broadcast (hash join, no fact shuffle); over it the join is
    left to the shuffle planner (sort-merge / shuffled-hash, AQE skew
    handling intact).

    ``est_bytes`` short-circuits the measurement when the caller already
    holds the statistic (the versioned colstats store / a prior
    ``estimate_table_bytes``) — at 100 TB the estimate comes from the
    ANALYZE pass, not an extra scan per join."""
    if est_bytes is None:
        _, est_bytes = estimate_table_bytes(dim)
    if est_bytes <= threshold_bytes:
        return fact.join(F.broadcast(dim), on, how)
    return fact.join(dim.hint("shuffle_merge"), on, how)
