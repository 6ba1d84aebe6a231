"""Adversarial duplicate-row audit of the iterative graph operators.

`pointer_jump_roots` had a real amplification bug (a single duplicated
node squared per self-join round: 66 rows -> 262k in 4 rounds, ~1e19 by
round 6 — fixed by the min-parent collapse in operators/graph.py).  The
other two iterative operators self-join every round with the same
exposure; these tests pin that duplicated INPUT rows can never amplify:

- `connected_components`: duplicate pairs collapse in the initial
  `distinct()`; labels stay one-row-per-vertex; output is identical to
  the deduplicated input's.
- `pagerank_integer`: duplicate edges are parallel edges (their weight
  legitimately counts twice, in both inflow and out-degree); per-round
  intermediates are edge-sized, the output is exactly node-sized, and a
  heavily duplicated edge list still converges in the same wall budget.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.graph import pagerank_integer
from service_alerts_connector_spark.operators.textdedup import (
    connected_components,
)


@pytest.fixture(scope="module")
def chainy_pairs(spark):
    # two clusters: a 6-vertex path (worst diameter) and a triangle
    rows = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (11, 12),
            (10, 12)]
    return spark.createDataFrame(rows, ["id_a", "id_b"])


def test_connected_components_duplicate_pairs_no_amplification(
    spark, chainy_pairs
):
    # duplicate every pair 7x, half of them also reversed — the adversarial
    # input class that blew up pointer jumping
    dup = chainy_pairs
    for _ in range(3):
        dup = dup.unionByName(
            chainy_pairs.select(
                F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
            )
        ).unionByName(chainy_pairs)
    clean = connected_components(chainy_pairs).orderBy("id")
    noisy = connected_components(dup).orderBy("id")
    clean_rows = [(r["id"], r["component"]) for r in clean.collect()]
    noisy_rows = [(r["id"], r["component"]) for r in noisy.collect()]
    # one label per vertex (no duplicate-id rows survive any round) and
    # bitwise-identical clustering to the deduplicated input
    assert noisy_rows == clean_rows
    assert len(noisy_rows) == 9
    assert len({i for i, _ in noisy_rows}) == 9


def test_pagerank_duplicate_edges_node_sized_output(spark):
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, 1), (3, 4, 1)],
        ["src", "dst", "weight"],
    )
    # 9 copies of every edge: parallel-edge semantics, never row blowup
    dup = edges
    for _ in range(8):
        dup = dup.unionByName(edges)
    out = pagerank_integer(dup, iterations=4).orderBy("node")
    rows = out.collect()
    assert len(rows) == 4  # exactly node-sized
    assert len({r["node"] for r in rows}) == 4
    # every rank at least the teleport floor, i.e. the integer recursion
    # stayed sane under duplication
    floor = (100 - 85) * 1_000_000 // 100
    assert all(r["rank_micro"] >= floor for r in rows)
    # uniform duplication scales every inflow term identically
    # ((85*r*9w) div (100*9wout) == contribution-sum within rounding), so
    # the relative ordering must match the clean run's exactly
    clean = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(edges, iterations=4).collect()
    }
    noisy = {r["node"]: r["rank_micro"] for r in rows}
    rank_order = lambda d: [n for n, _ in sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))]
    assert rank_order(noisy) == rank_order(clean)


def test_pointer_jump_strict_raises_on_conflicting_parents(spark):
    from service_alerts_connector_spark.operators.graph import (
        pointer_jump_roots,
    )

    edges = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (0, 0)], ["node", "parent"]
    )
    with pytest.raises(ValueError, match="conflicting duplicate parents"):
        pointer_jump_roots(edges, iterations=2, strict=True)
    # same-parent duplicates are NOT conflicts: strict accepts them
    ok = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1)], ["node", "parent"]
    )
    out = pointer_jump_roots(ok, iterations=2, strict=True).collect()
    assert len(out) == 2


def test_path_sum_duplicate_rows_no_amplification(spark):
    from service_alerts_connector_spark.operators.graph import (
        pointer_jump_path_sum,
    )

    rows = [(n, max(0, n - 1), 10 * n + 1) for n in range(8)]
    clean = spark.createDataFrame(rows, ["node", "parent", "value"])
    dup = clean
    for _ in range(3):
        dup = dup.unionByName(clean)
    got = sorted(
        (r["node"], r["root_id"], r["depth"], r["path_sum"], r["converged"])
        for r in pointer_jump_path_sum(dup, iterations=4).collect()
    )
    want = sorted(
        (r["node"], r["root_id"], r["depth"], r["path_sum"], r["converged"])
        for r in pointer_jump_path_sum(clean, iterations=4).collect()
    )
    assert got == want
    assert len(got) == 8  # node-sized output under 4x duplication
