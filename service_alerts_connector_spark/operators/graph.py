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
    # Pin ONE evaluation of the caller's edge-build subtree (lazy
    # localCheckpoint): the unrolled recurrence references ``edges``
    # in every iteration plus ``nodes`` (twice) and ``out_w``, so an
    # unpinned frame duplicates the upstream scan/window/aggregate
    # ~10× per 3 iterations (measured: 28 parquet scans + 28 Windows
    # in event_pagerank's physical plan — plans/r15/
    # event_pagerank_before.txt).  eager=False materializes inside the
    # first consuming job — no separate driver-forced job, which is why
    # this is cheaper than the per-iteration eager checkpoint the
    # ``checkpoint`` flag controls (that one pays off only on
    # corpus-sized graphs; see caller notes).
    edges = edges.localCheckpoint(eager=False)
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


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact global triangle count via the ordered wedge join
    (compact-forward): canonicalize every undirected edge to (lo, hi)
    and dedup, build ordered wedges a<b<c from edge pairs sharing b, and
    semi-join the closing (a, c) edge.  The a<b<c total order counts each
    triangle exactly once with no post-hoc /3 or /6 division.

    Output: one row (n_nodes, n_edges, n_wedges, n_triangles) — all exact
    bigints, so any engine reproduces them bit-for-bit.

    Scale shape: the wedge join shuffles the canonical edge table on the
    shared endpoint b; the closing probe is an equi-semi-join on (a, c).
    Wedge volume is Σ_b deg_lo(b)·deg_hi(b) — callers should prune
    low-support edges first (see the catalog query's min-support filter):
    triangle counting on an unpruned power-law graph is wedge-bound no
    matter the engine, and the standard mitigation IS the support/degree
    threshold, not a cleverer join.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    wedges = (
        e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        .join(
            e.select(F.col("lo").alias("b2"), F.col("hi").alias("c")),
            F.col("b") == F.col("b2"),
        )
        .select("a", "b", "c")
    )
    tri = wedges.join(
        e.select(F.col("lo").alias("a"), F.col("hi").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    nodes = (
        e.select(F.col("lo").alias("n"))
        .union(e.select(F.col("hi").alias("n")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n_wedges"))
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_tri))
    )


def pointer_jump_roots(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    iterations: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Resolve every node of a forest to its root (+ exact depth) in
    O(log depth) rounds by pointer jumping — the hierarchy-flattening /
    org-chart / BOM-rollup primitive relational engines express as a
    recursive CTE and Spark must express as a bounded self-join loop.

    A sequential walk is O(depth) chained joins; pointer jumping squares
    the reach each round — after round i every pointer spans min(2^i,
    dist-to-root) edges, so ``iterations`` rounds resolve any tree of
    depth ≤ 2^iterations.  Roots are rows with ``parent == node`` (their
    pointer is a fixed point at distance 0, which is what freezes
    converged rows in later rounds: joining a root's own entry adds 0).

    Scale shape per round: ONE equi-join of the node-sized pointer table
    with itself on the pointer key (both sides node-sized — unlike
    PageRank there is no edge-sized side), then ``localCheckpoint``
    truncating lineage so the loop never replans a deepening tree.  12
    rounds cover depth 4096; the ``converged`` flag (pointer is a root)
    makes an undersized ``iterations`` detectable rather than silently
    wrong.  CYCLES (corrupt hierarchies) also terminate: the fixed round
    budget walks the cycle 2^iterations edges and leaves members
    unconverged (pytest-pinned), never looping or mis-assigning a root.

    DUPLICATE node rows (the other corrupt-hierarchy class) are collapsed
    deterministically to the smallest parent BEFORE the loop — without
    this, each self-join round multiplies the duplicates (k copies square
    to k² per round: a single doubled node measurably blew up 66 → 262k
    rows in 4 rounds and ~10¹⁹ by round 6, hanging the cluster instead of
    erroring).  The min-parent collapse keeps the loop's per-round row
    count exactly node-sized for ANY input.

    Output: node, ``root_id`` (the pointer after the final round),
    ``depth`` (exact edge count to the root), ``converged``.

    ``strict=True`` makes corrupt input DETECTABLE instead of silently
    repaired: before the collapse, one cheap audit job counts nodes with
    more than one distinct parent and raises ``ValueError`` naming the
    count — callers who must not lose rows opt in; the default keeps the
    documented deterministic min-parent repair.

    DANGLING parents (a parent id with no node row — sparse ids) freeze:
    the hop join is LEFT, so such a node keeps its pointer at the missing
    id with ``converged = false`` and ``depth`` counting every edge
    walked INCLUDING the dangling one — exactly where a recursive CTE's
    join stops — instead of vanishing from the output the way an inner
    hop would drop it (pytest-pinned).
    """
    if strict:
        conflicts = (
            edges.groupBy(F.col(node_col).alias("node"))
            .agg(F.countDistinct(parent_col).alias("_np"))
            .where(F.col("_np") > 1)
            .count()
        )
        if conflicts:
            raise ValueError(
                f"pointer_jump_roots(strict=True): {conflicts} node(s) "
                "appear with conflicting duplicate parents — corrupt "
                "hierarchy (rerun without strict to repair via "
                "deterministic min-parent collapse)"
            )
    ptr = (
        edges.select(
            F.col(node_col).alias("node"),
            F.col(parent_col).alias("_rawptr"),
        )
        # corrupt inputs may repeat a node (possibly with conflicting
        # parents): one deterministic pointer per node, or the per-round
        # self-join squares the duplicates — see docstring
        .groupBy("node")
        .agg(F.min("_rawptr").alias("ptr"))
        .select(
            "node",
            "ptr",
            F.when(F.col("ptr") == F.col("node"), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("dist"),
        )
        # lazy: lineage is truncated at construction either way (the
        # round plans stay flat); eager=True additionally forced one
        # materialization job PER checkpoint before any consumer ran —
        # with each round's broadcast build already materializing the
        # blocks as a side effect, the eager jobs were pure overhead
        # (~2 driver jobs/round → 1; guide §1.2 job-count reduction).
        .localCheckpoint(eager=False)
    )
    roots = ptr.where(F.col("ptr") == F.col("node")).select(
        F.col("node").alias("_root")
    )
    for _ in range(iterations):
        hop = ptr.select(
            F.col("node").alias("_pn"),
            F.col("ptr").alias("_pp"),
            F.col("dist").alias("_pd"),
        )
        # LEFT join: a DANGLING pointer (parent id with no node row —
        # sparse/corrupt hierarchies) must freeze in place with
        # converged=false, not silently drop the node the way an inner
        # join would (the walk truncates at the last existing edge; the
        # recursive-CTE oracle likewise stops when the join finds no row)
        ptr = (
            ptr.join(hop, ptr["ptr"] == hop["_pn"], "left")
            .select(
                "node",
                F.coalesce(F.col("_pp"), ptr["ptr"]).alias("ptr"),
                (F.col("dist") + F.coalesce(F.col("_pd"), F.lit(0))).alias(
                    "dist"
                ),
            )
            # lazy for the same reason as the init checkpoint above
            .localCheckpoint(eager=False)
        )
    return (
        ptr.join(roots, ptr["ptr"] == roots["_root"], "left")
        .select(
            "node",
            F.col("ptr").alias("root_id"),
            F.col("dist").alias("depth"),
            F.col("_root").isNotNull().alias("converged"),
        )
    )


def pointer_jump_path_sum(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    value_col: str = "value",
    iterations: int = 8,
) -> DataFrame:
    """Ancestor-path aggregation in O(log depth) rounds: for every node of
    a forest, the exact sum of ``value`` over the node's entire ancestor
    chain INCLUDING itself and its root — the inherited-quota / rolled-
    permission / cumulative-cost recursive workload, generalizing
    ``pointer_jump_roots``'s depth counter (a path sum of 1s) to an
    arbitrary additive weight.

    Invariant carried through each jump: ``acc(u)`` sums values over the
    half-open path [u, ptr(u)) — up to but excluding the current pointer.
    A jump composes two such segments (``acc += acc(ptr)``,
    ``ptr = ptr(ptr)``), preserving the invariant while doubling reach;
    roots hold (ptr = self, acc = 0), the fixed point that freezes
    converged rows.  The final answer closes the half-open interval by
    adding the root's own value via one node-sized equi-join.

    Same corrupt-input armor as ``pointer_jump_roots``: duplicate node
    rows collapse deterministically (min parent, min value) BEFORE the
    loop, so the per-round self-join never amplifies; cycles exhaust the
    round budget and surface ``converged = false`` rather than looping;
    DANGLING parents freeze via the left hop join with ``path_sum``
    degrading to the sum over the chain's EXISTING nodes (the missing
    "root" contributes nothing) and ``converged = false``.
    Integer budget: |value| · depth must stay under 2^63.

    Output: node, ``root_id``, ``depth``, ``path_sum``, ``converged``.
    """
    base = (
        edges.select(
            F.col(node_col).alias("node"),
            F.col(parent_col).alias("_rawptr"),
            F.col(value_col).alias("_rawval"),
        )
        .groupBy("node")
        .agg(
            F.min("_rawptr").alias("ptr0"),
            F.min("_rawval").cast("long").alias("val"),
        )
        # lazy checkpoints throughout (init + loop): see
        # pointer_jump_roots — truncation happens at construction, and
        # the first consuming job materializes the blocks, so the eager
        # per-checkpoint jobs were pure driver-job overhead.
        .localCheckpoint(eager=False)
    )
    is_root = F.col("ptr0") == F.col("node")
    ptr = base.select(
        "node",
        F.when(is_root, F.col("node")).otherwise(F.col("ptr0")).alias("ptr"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).cast("long").alias(
            "dist"
        ),
        F.when(is_root, F.lit(0).cast("long")).otherwise(F.col("val")).alias(
            "acc"
        ),
    ).localCheckpoint(eager=False)
    roots = ptr.where(F.col("ptr") == F.col("node")).select(
        F.col("node").alias("_root")
    )
    for _ in range(iterations):
        hop = ptr.select(
            F.col("node").alias("_pn"),
            F.col("ptr").alias("_pp"),
            F.col("dist").alias("_pd"),
            F.col("acc").alias("_pa"),
        )
        # LEFT join freezes dangling pointers (see pointer_jump_roots):
        # the accumulator keeps its half-open [u, dangling-ptr) sum — every
        # EXISTING ancestor's value — instead of the node vanishing
        ptr = (
            ptr.join(hop, ptr["ptr"] == hop["_pn"], "left")
            .select(
                "node",
                F.coalesce(F.col("_pp"), ptr["ptr"]).alias("ptr"),
                (F.col("dist") + F.coalesce(F.col("_pd"), F.lit(0))).alias(
                    "dist"
                ),
                (F.col("acc") + F.coalesce(F.col("_pa"), F.lit(0))).alias(
                    "acc"
                ),
            )
            .localCheckpoint(eager=False)
        )
    root_vals = base.select(
        F.col("node").alias("_rv_node"), F.col("val").alias("_rv_val")
    )
    return (
        ptr.join(roots, ptr["ptr"] == roots["_root"], "left")
        # LEFT: a dangling final pointer has no root row and no value to
        # close the half-open interval with — path_sum degrades to the
        # existing-chain sum, converged stays false
        .join(root_vals, ptr["ptr"] == root_vals["_rv_node"], "left")
        .select(
            "node",
            F.col("ptr").alias("root_id"),
            F.col("dist").alias("depth"),
            (F.col("acc") + F.coalesce(F.col("_rv_val"), F.lit(0)))
            .cast("long")
            .alias("path_sum"),
            F.col("_root").isNotNull().alias("converged"),
        )
    )
