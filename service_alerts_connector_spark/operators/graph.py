"""Iterative graph algorithms as keyed DataFrame recurrences.

Connected components (min-label propagation) lives in
``operators/textdedup.py`` where the dedup tier consumes it; this module
holds the general-purpose additions, starting with weighted PageRank.

Cross-engine determinism: float PageRank is order-sensitive (sums of
doubles associate differently per partitioning), so ranks here are EXACT
integers in micro-units with every per-edge contribution floored via
integer division — the recurrence is then a pure function of the edge
table, reproducible by any engine that can join and sum (the DuckDB oracle
unrolls the same iterations).  Integer division on the non-negative
operands only (Spark ``div`` truncates toward zero, DuckDB ``//`` floors —
identical on non-negatives, CLAUDE.md rule).

Scale shape per iteration: one join of edges→ranks on src (edge table is
the big side; ranks are node-sized) and one groupBy dst — the same census
as connected components, with ``localCheckpoint`` truncating lineage so t
iterations never replan a t-deep tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000  # ranks in micro-units


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint: bool = True,
) -> DataFrame:
    """Weighted PageRank over ``(src, dst, weight)`` with exact-integer
    arithmetic.

    r₀(v) = RANK_SCALE for every node;
    rₜ₊₁(v) = (den−num)·RANK_SCALE div den
              + Σ_{u→v} (num · rₜ(u) · w(u,v)) div (den · wout(u)).

    Dangling nodes (no out-edges) keep receiving but stop distributing —
    their mass share shrinks toward the teleport floor, which is the
    standard "no redistribution" simplification; total mass is therefore
    NOT conserved and ranks are a relative centrality score, not a
    probability.  Integer budget: num · rₜ · w must stay under 2⁶³ —
    ranks are bounded by N·RANK_SCALE, so this holds while
    N · RANK_SCALE · max_weight < 10¹⁷ (document the cap at call sites
    with heavier weights).

    Output: ``node``, ``rank_micro`` (bigint).
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("wout"))
    teleport = (damping_den - damping_num) * RANK_SCALE // damping_den
    ranks = nodes.withColumn("rank_micro", F.lit(RANK_SCALE).cast("long"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"], "inner")
            .join(out_w, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({damping_num} * rank_micro * weight)"
                    f" div ({damping_den} * wout)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long")
                .alias("rank_micro"),
            )
        )
        if checkpoint:
            # truncate lineage so iteration t doesn't replan a t-deep tree
            # (same rationale as connected_components in textdedup.py)
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
