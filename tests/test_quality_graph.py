"""rule_screen (operators/quality.py) + pagerank_integer (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.graph import (
    RANK_SCALE,
    pagerank_integer,
)
from service_alerts_connector_spark.operators.quality import rule_screen


def test_rule_screen_counts_and_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 200.0)],
        "id long, v double",
    )
    out = {
        r["rule_id"]: (r["n_checked"], r["n_violations"], r["pass"])
        for r in rule_screen(
            df,
            [
                ("v_nonneg", F.col("v") < 0),
                ("v_below_100", F.col("v") > 100),
                ("id_positive", F.col("id") <= 0),
            ],
        ).collect()
    }
    # null v counts as a violation for rules predicated on v (quality
    # finding), but not for the id rule
    assert out["v_nonneg"] == (4, 2, False)      # -5 and the null
    assert out["v_below_100"] == (4, 2, False)   # 200 and the null
    assert out["id_positive"] == (4, 0, True)


def test_rule_screen_single_aggregation_plan(spark):
    # N rules must compile to ONE aggregate over ONE scan — no per-rule
    # scans (the naive deequ deployment mistake).
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    rules = [(f"r{i}", F.col("v") > i) for i in range(8)]
    plan = rule_screen(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") + plan.count("Range ") <= 2  # wide agg + stack


def test_pagerank_prefers_heavier_inflow(spark):
    edges = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        "src string, dst string, weight long",
    )
    ranks = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(edges, iterations=3).collect()
    }
    assert ranks["b"] > ranks["c"]  # 9× the inflow weight from a
    assert all(v >= (100 - 85) * RANK_SCALE // 100 for v in ranks.values())


def test_pagerank_partitioning_invariant(spark):
    # exact-integer recurrence: the result is a pure function of the edge
    # table, so any physical layout must produce identical ranks.
    rows = [
        (f"n{i}", f"n{(i * 3 + 1) % 10}", (i % 4) + 1) for i in range(30)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, weight long")
    a = sorted(map(tuple, pagerank_integer(edges, iterations=3).collect()))
    b = sorted(
        map(
            tuple,
            pagerank_integer(edges.repartition(7, "dst"), iterations=3).collect(),
        )
    )
    assert a == b


def test_pagerank_dangling_node_receives_only(spark):
    # dangling node keeps its inflow; it never redistributes, and the
    # recurrence still terminates with every node >= the teleport floor.
    edges = spark.createDataFrame(
        [("a", "sink", 1), ("b", "sink", 1), ("a", "b", 1)],
        "src string, dst string, weight long",
    )
    ranks = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(edges, iterations=2).collect()
    }
    assert ranks["sink"] > ranks["a"]
    assert ranks["a"] == (100 - 85) * RANK_SCALE // 100  # teleport floor only


def test_triangle_count_matches_brute_force(spark):
    """Seeded random graph: the ordered-wedge-join count equals the
    brute-force enumeration over all id triples, and direction/duplicate
    edges in the input don't change the answer (canonicalization)."""
    import itertools
    import random

    from service_alerts_connector_spark.operators.graph import triangle_count

    rng = random.Random(7)
    n = 30
    edge_set = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < 0.18
    }
    # feed the operator reversed duplicates and self-loops to exercise
    # canonicalization
    rows = [(a, b) for a, b in edge_set] + [
        (b, a) for a, b in list(edge_set)[::3]
    ] + [(5, 5)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    row = triangle_count(edges, "src", "dst").collect()[0]
    adj = {frozenset(e) for e in edge_set}
    brute = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= adj
    )
    assert row["n_triangles"] == brute
    assert row["n_edges"] == len(edge_set)
    assert brute > 0  # non-vacuous at this density


def test_pointer_jump_roots_forest(spark):
    """Mixed forest: two chains + a binary tree + isolated roots; exact
    depths and roots vs closed form, and the converged flag flips FALSE
    when iterations are too few for the depth."""
    from service_alerts_connector_spark.operators.graph import (
        pointer_jump_roots,
    )

    # chain A: 0<-1<-2<-...<-9 (root 0); tree B: root 100, children
    # 101,102, grandchildren 103..106; isolated root 200
    edges = (
        [(i, i - 1) for i in range(1, 10)]
        + [(0, 0), (100, 100), (101, 100), (102, 100),
           (103, 101), (104, 101), (105, 102), (106, 102), (200, 200)]
    )
    df = spark.createDataFrame(edges, "node long, parent long")
    got = {
        r["node"]: (r["root_id"], r["depth"], r["converged"])
        for r in pointer_jump_roots(df, iterations=4).collect()
    }
    for i in range(10):
        assert got[i] == (0, i, True)
    assert got[100] == (100, 0, True)
    assert got[103] == (100, 2, True)
    assert got[200] == (200, 0, True)

    # depth 9 chain with 2^2 = 4 reach: node 9 cannot resolve in 2 rounds
    short = {
        r["node"]: r["converged"]
        for r in pointer_jump_roots(df, iterations=2).collect()
    }
    assert short[9] is False and short[3] is True


def test_pointer_jump_roots_cycle_degrades_gracefully(spark):
    """A cycle (corrupt hierarchy: a->b->a) has no root.  The fixed
    round budget must terminate with converged=False for cycle members
    — never loop, never mis-assign a root — while legitimate trees in
    the same frame still resolve."""
    from service_alerts_connector_spark.operators.graph import (
        pointer_jump_roots,
    )

    edges = [
        (1, 2), (2, 1),          # 2-cycle, no root
        (3, 3), (4, 3),          # healthy tree beside it
    ]
    df = spark.createDataFrame(edges, "node long, parent long")
    got = {
        r["node"]: (r["root_id"], r["depth"], r["converged"])
        for r in pointer_jump_roots(df, iterations=5).collect()
    }
    assert got[3] == (3, 0, True)
    assert got[4] == (3, 1, True)
    for n in (1, 2):
        root_id, depth, converged = got[n]
        assert converged is False
        assert root_id in (1, 2)  # pointer still inside the cycle
        assert depth == 2 ** 5    # doubling walked the cycle, bounded


def test_pointer_jump_dangling_parent_freezes(spark):
    """A node whose parent id has NO node row (sparse/corrupt ids) must
    freeze at the missing pointer with converged=false — never vanish
    (the inner-hop regression this pins: the node used to drop from the
    output entirely while a recursive CTE keeps it with a truncated
    walk)."""
    from service_alerts_connector_spark.operators.graph import (
        pointer_jump_roots,
    )

    edges = [
        (1, 1), (2, 1), (3, 2),  # healthy chain 3->2->1(root)
        (5, 99),                 # 99 has no node row
        (6, 5),                  # chains INTO the dangling node
    ]
    df = spark.createDataFrame(edges, "node long, parent long")
    got = {
        r["node"]: (r["root_id"], r["depth"], r["converged"])
        for r in pointer_jump_roots(df, iterations=4).collect()
    }
    assert len(got) == 5  # nobody dropped
    assert got[1] == (1, 0, True)
    assert got[2] == (1, 1, True)
    assert got[3] == (1, 2, True)
    # the walk truncates where a recursive CTE's join finds no row:
    # pointer frozen at the missing id, depth = edges walked incl. the
    # dangling edge
    assert got[5] == (99, 1, False)
    assert got[6] == (99, 2, False)


def test_pointer_jump_path_sum_dangling_matches_recursive_cte(spark):
    """Sparse-id path sums vs an independent DuckDB recursive CTE that
    walks the same edges until the parent join finds no row: existing-
    chain sums must agree exactly, dangling nodes flag converged=false."""
    import duckdb

    from service_alerts_connector_spark.operators.graph import (
        pointer_jump_path_sum,
    )

    edges = [
        (1, 1, 10), (2, 1, 20), (3, 2, 30),  # healthy chain, root 1
        (5, 99, 50),                          # dangling parent 99
        (6, 5, 60),                           # chains into the dangling node
    ]
    df = spark.createDataFrame(edges, "node long, parent long, value long")
    got = {
        r["node"]: (r["root_id"], r["depth"], r["path_sum"], r["converged"])
        for r in pointer_jump_path_sum(df, iterations=4).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e(node BIGINT, parent BIGINT, value BIGINT)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", edges)
    # walk upward; stop at a root (parent = node) or when the parent id
    # has no row (dangling) — accumulate every EXISTING node's value
    cte = con.execute(
        """
        WITH RECURSIVE walk AS (
          SELECT node AS start, node, parent, value AS s, 0 AS d,
                 (parent = node) AS at_root
          FROM e
          UNION ALL
          SELECT w.start, p.node, p.parent, w.s + p.value, w.d + 1,
                 (p.parent = p.node)
          FROM walk w JOIN e p ON p.node = w.parent
          WHERE NOT w.at_root
        )
        SELECT start,
               arg_max(node, d) AS last_node,
               arg_max(at_root, d) AS resolved,
               arg_max(s, d) AS chain_sum,
               max(d) AS steps
        FROM walk GROUP BY start
        """
    ).df().set_index("start")
    assert len(got) == len(cte)
    for n, (root_id, depth, path_sum, conv) in got.items():
        row = cte.loc[n]
        assert bool(row["resolved"]) == conv, n
        assert path_sum == int(row["chain_sum"]), n
        if conv:
            assert root_id == int(row["last_node"]), n
            assert depth == int(row["steps"]), n
        else:
            # frozen at the missing id, one PAST the CTE's last row
            assert depth == int(row["steps"]) + 1, n
    assert got[5] == (99, 1, 50, False)
    assert got[6] == (99, 2, 110, False)
