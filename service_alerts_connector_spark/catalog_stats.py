"""Catalog — optimizer-statistics / planning tier (round 9).

The ANALYZE-side of an engine: the statistics a cost-based optimizer and
a shuffle planner consume.  The reference pipeline plans nothing (pandas
has no optimizer), so this tier is beyond-reference engine surface — the
queries compute the stats Spark itself keeps in its catalog
(``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``) and the split
points a global sort / range partitioner needs, with the repo's exact
integer determinism rules so each has a full DuckDB value-hash oracle:

- ``column_stats_mcv`` — per-column row count, null count, exact NDV and
  top-3 most-common values with frequencies (the pg_stats / Spark column
  statistics shape) over pinned categorical lineitem columns, from ONE
  fact scan.
- ``equi_depth_histogram`` — exact k=8 equi-depth bucket bounds over the
  GLOBAL order-price distribution (the TeraSort/RangePartitioner split
  points, and the ANALYZE equi-height histogram) without any
  unpartitioned window: the round-8 two-phase bucket-offset prefix sum,
  with the tiny bucket frame's exclusive prefix computed by a bounded
  self-join instead of a per-flag window (there is no flag here — the
  rank is global).
- ``cohens_kappa`` — chance-corrected agreement between two deterministic
  row labelers (the statistic behind annotation-quality gates on training
  data), with an explicit floor-division formulation so the signed
  kappa ratio is bit-identical across engines (Spark ``div`` truncates
  toward zero, DuckDB ``//`` floors — they agree only on non-negative
  operands, and kappa is legitimately negative when labelers disagree
  more than chance).
- ``auc_exact`` — exact ROC AUC via the Mann-Whitney identity over score
  cells (no global sort, no per-row rank; ties carry the exact ½ through
  a doubled integer numerator).
- ``ks_statistic`` — exact two-sample Kolmogorov-Smirnov distance between
  two value distributions with the maximizing score, from the same
  two-phase cumulative machinery (`_bucketed_cum`).
- ``correlated_column_stats`` — multi-column dependency stats per pinned
  pair (PostgreSQL ``CREATE STATISTICS`` shape): combination NDV vs the
  independence product, modal combination and share.
- ``join_cardinality_check`` — the System-R estimator run on exact NDVs
  and calibrated against the true join count (the stats consumed, not
  just reported).

Scale notes live next to each query; plan shapes are pinned in
``tests/test_plan_shapes.py`` (one fact scan for the unpivoted stats,
no unpartitioned window anywhere, broadcast-only joins below the fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _t


# ---------------------------------------------------------------------------
# Column statistics + most-common values — the ANALYZE / pg_stats shape
# ---------------------------------------------------------------------------
# (name, Spark string expression, DuckDB string expression) — the synthetic
# lineitem carries a reduced TPC-H column set, so the pinned categoricals are
# the two flags, the line number, and integer-floored quantity.  Doubles
# never cast to string directly (engine float formatting differs): quantity
# floors to bigint first, so both engines render the same digits.
def _stats_exprs():
    return [
        ("l_linenumber", F.col("l_linenumber").cast("string")),
        ("l_linestatus", F.col("l_linestatus").cast("string")),
        (
            "l_quantity_i",
            F.floor(F.col("l_quantity")).cast("long").cast("string"),
        ),
        ("l_returnflag", F.col("l_returnflag").cast("string")),
    ]


_STATS_SQL_EXPRS = (
    ("l_linenumber", "CAST(l_linenumber AS VARCHAR)"),
    ("l_linestatus", "CAST(l_linestatus AS VARCHAR)"),
    (
        "l_quantity_i",
        "CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)",
    ),
    ("l_returnflag", "CAST(l_returnflag AS VARCHAR)"),
)


def q_column_stats_mcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer column statistics for the pinned categorical lineitem
    columns: row count, NULL count, exact NDV, and the top-3 most-common
    values with their frequencies.

    Shape: ONE lineitem scan projects every (col_name, value) pair via a
    narrow explode (no join, no second scan — the stats and the MCV list
    fold into the SAME final aggregation), then a single
    groupBy(col_name, value) with map-side combine carries at most
    Σ NDV(col) cells to the reducers — for categorical columns that is a
    few dozen rows at ANY table size.  The MCV rank window partitions by
    col_name over those cells only (bounded by the pinned categorical
    NDV; a high-NDV column would take the NDV/null half of this query
    and skip the MCV window — documented scale boundary, same reasoning
    as pg_stats' `most_common_vals` cutoff).  NULL cells sort to the
    BOTTOM of the rank order so the top-3 picks guard on val IS NOT NULL
    instead of needing a second, null-free branch of the cell frame.

    Ties rank deterministically by (cnt DESC, value ASC).  NULLs count
    into n_null and never into NDV or the MCV list (pg_stats semantics).
    """
    from service_alerts_connector_spark.operators.colstats import (
        column_cells,
        stats_from_cells,
    )

    li = _t(spark, sf_dir, "lineitem")
    return stats_from_cells(column_cells(li, _stats_exprs()))


def _sql_stats_pairs() -> str:
    return "\n  UNION ALL ".join(
        f"SELECT '{name}' AS col_name, {expr} AS val FROM lineitem"
        for name, expr in _STATS_SQL_EXPRS
    )


SQL_COLUMN_STATS_MCV = f"""
WITH pairs AS (
  {_sql_stats_pairs()}
), cells AS (
  SELECT col_name, val, count(*) AS cnt FROM pairs GROUP BY col_name, val
), ranked AS (
  SELECT col_name, val, cnt,
         row_number() OVER (PARTITION BY col_name
                            ORDER BY (val IS NULL) ASC, cnt DESC, val ASC)
           AS rk
  FROM cells
)
SELECT col_name,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CASE WHEN val IS NULL THEN cnt END), 0) AS BIGINT)
         AS n_null,
       CAST(count(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT) AS ndv,
       min(CASE WHEN rk = 1 AND val IS NOT NULL THEN val END) AS mcv1,
       CAST(min(CASE WHEN rk = 1 AND val IS NOT NULL THEN cnt END) AS BIGINT)
         AS mcv1_cnt,
       min(CASE WHEN rk = 2 AND val IS NOT NULL THEN val END) AS mcv2,
       CAST(min(CASE WHEN rk = 2 AND val IS NOT NULL THEN cnt END) AS BIGINT)
         AS mcv2_cnt,
       min(CASE WHEN rk = 3 AND val IS NOT NULL THEN val END) AS mcv3,
       CAST(min(CASE WHEN rk = 3 AND val IS NOT NULL THEN cnt END) AS BIGINT)
         AS mcv3_cnt
FROM ranked
GROUP BY col_name
ORDER BY col_name
"""


# ---------------------------------------------------------------------------
# Equi-depth histogram — global range-partition split points, no global window
# ---------------------------------------------------------------------------
_EDH_K = 8
_EDH_BUCKET = 1 << 20  # same 2^20-cent domain bucket as weighted_median_price


def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k=8 equi-depth histogram of o_totalprice (integer cents):
    the split points a RangePartitioner / global sort / ANALYZE
    equi-height histogram needs, each bound the smallest cents whose
    GLOBAL running count reaches rank greatest(1, (q·n) div 8).

    A global running rank is exactly what the catalog bans as a plan
    shape (an unpartitioned window sorts the corpus in one task), so
    this generalizes the round-8 two-phase prefix sum to the NO-KEY
    case:

      1. reduce orders to (cents → cnt) histogram cells (the only
         fact-sized shuffle, map-side combined);
      2. aggregate per domain bucket (cents div 2^20) — a frame bounded
         by the PRICE DOMAIN (≤ ~60 rows at any data size), whose
         exclusive prefix sum comes from a bounded self-join
         (b.bucket < a.bucket), not a window: with no partition key the
         window alternative is exactly the banned global sort;
      3. broadcast the per-bucket offsets back and run the running count
         partitioned by bucket — parallelism = domain buckets, each task
         walking ≤ 2^20 cells (weighted_median_price's shape, global);
      4. the 7 interior bounds + the max close into ONE 8-element bound
         array; cells assign to their bucket with a single broadcast of
         that one row and an array_min(filter(...)) — never a per-row
         theta join against the bound table.

    Buckets whose bound duplicates the previous one (a value heavier
    than n/8) legitimately come out empty and are absent from the
    output on BOTH engines.  Everything is bigint; ranks use div on
    non-negative operands only.
    """
    rev = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    # cells feeds FOUR consumers (bucket offsets, totals, the ranked walk,
    # and the final assignment); without a pinned evaluation each branch
    # re-runs the fact scan + histogram shuffle (measured 5 parquet scans
    # in the executed plan).  Lazy, like semantic_dedup: eager-vs-lazy
    # A/B'd identical on both the deduped census (149 837 records each
    # way) and wall time — the "7× lazy recompute" first seen here was
    # the census double-counting AQE plan-version descriptors, fixed in
    # tools/shuffle_census.py the same round.  (CLAUDE.md: pin only
    # expensive subtrees — this one is the fact scan.)
    cells = (
        rev.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bucket", F.expr(f"cents div {_EDH_BUCKET}"))
        .localCheckpoint(eager=False)
    )
    buckets = cells.groupBy("bucket").agg(
        F.sum("cnt").alias("bw"), F.count(F.lit(1)).alias("bn")
    )
    lower = buckets.select(
        F.col("bucket").alias("lb"), F.col("bw").alias("lw")
    )
    offsets = (
        buckets.join(
            F.broadcast(lower), F.col("lb") < F.col("bucket"), "left"
        )
        .groupBy("bucket")
        .agg(F.coalesce(F.sum("lw"), F.lit(0)).alias("boff"))
    )
    totals = cells.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("ncells")
    )
    w_inb = (
        Window.partitionBy("bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        cells.join(F.broadcast(offsets), "bucket")
        .select(
            "cents",
            "cnt",
            (F.col("boff") + F.sum("cnt").over(w_inb)).alias("cum"),
        )
        .crossJoin(F.broadcast(totals))
    )
    bound_cols = [
        F.expr(
            f"min(CASE WHEN cum >= greatest(CAST(1 AS BIGINT),"
            f" ({q} * n) div {_EDH_K}) THEN cents END)"
        ).alias(f"b{q}")
        for q in range(1, _EDH_K)
    ] + [F.max("cents").alias(f"b{_EDH_K}")]
    bounds_row = ranked.agg(*bound_cols).select(
        F.expr(
            "array("
            + ",".join(
                f"struct({q} AS q, b{q} AS ub)"
                for q in range(1, _EDH_K + 1)
            )
            + ")"
        ).alias("bnds")
    )
    assigned = cells.crossJoin(F.broadcast(bounds_row)).select(
        "cents",
        "cnt",
        F.expr("array_min(filter(bnds, x -> cents <= x.ub))").alias("hit"),
    )
    return (
        assigned.select(
            F.col("hit.q").alias("bucket_id"),
            F.col("hit.ub").alias("ub"),
            "cents",
            "cnt",
        )
        .groupBy("bucket_id")
        .agg(
            F.max("ub").cast("long").alias("ub_c"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.min("cents").cast("long").alias("lo_c"),
            F.max("cents").cast("long").alias("hi_c"),
        )
        .orderBy("bucket_id")
    )


SQL_EQUI_DEPTH_HISTOGRAM = f"""
WITH rev AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders
), cells AS (
  SELECT cents, count(*) AS cnt FROM rev GROUP BY cents
), ranked AS (
  SELECT cents, cnt,
         sum(cnt) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER () AS n
  FROM cells
), qs AS (
  SELECT unnest(generate_series(1, {_EDH_K - 1})) AS q
), bounds AS (
  SELECT q, min(CASE WHEN cum >= greatest(1, (q * n) // {_EDH_K})
                     THEN cents END) AS ub
  FROM ranked CROSS JOIN qs GROUP BY q
  UNION ALL
  SELECT {_EDH_K} AS q, max(cents) AS ub FROM cells
), assign AS (
  SELECT c.cents, c.cnt, min(b.q) AS bucket_id
  FROM cells c JOIN bounds b ON c.cents <= b.ub
  GROUP BY c.cents, c.cnt
)
SELECT a.bucket_id,
       CAST(max(b.ub) AS BIGINT) AS ub_c,
       CAST(sum(a.cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(min(a.cents) AS BIGINT) AS lo_c,
       CAST(max(a.cents) AS BIGINT) AS hi_c
FROM assign a JOIN bounds b ON b.q = a.bucket_id
GROUP BY a.bucket_id
ORDER BY a.bucket_id
"""


# ---------------------------------------------------------------------------
# Cohen's kappa — chance-corrected agreement with engine-exact signed division
# ---------------------------------------------------------------------------
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-labeler agreement on events: labeler A flags high-value rows
    (integer cents ≥ 5000), labeler B flags rows whose props payload has
    k ≥ 50 — two deterministic binary annotators whose chance-corrected
    agreement is Cohen's kappa = (p_o − p_e) / (1 − p_e).

    Everything reduces to ONE conditional aggregation (n11/n10/n01/n00 —
    the same single-pass confusion shape as rule_eval_confusion), then
    pure integer arithmetic on the one-row frame:

      num = n·(n11 + n00) − (a1·b1 + a0·b0)        (scaled p_o − p_e)
      den = n² − (a1·b1 + a0·b0)                   (scaled 1 − p_e)

    kappa is legitimately NEGATIVE when the labelers disagree more than
    chance predicts, and signed integer division is where engines split:
    Spark ``div`` truncates toward zero, DuckDB ``//`` floors.  So
    kappa_ppm is emitted as an EXPLICIT floor division both sides —
    ``num ≥ 0 → (num·10⁶) div den``, else
    ``−(((−num)·10⁶ + den − 1) div den)`` — every div on non-negative
    operands, bit-identical across engines (CLAUDE.md's negative-operand
    rule, handled rather than dodged).  num/den are also emitted raw so
    the ratio is auditable.  Overflow bound: den ≤ n², ×10⁶ stays inside
    bigint for n ≤ 3·10⁶ rows; beyond that swap the two products to
    DECIMAL(38,0) (documented, not needed at any test SF).
    """
    ev = _t(spark, sf_dir, "events").select(
        (F.floor(F.col("value") * 100).cast("long") >= 5000).alias("a"),
        (
            F.from_json(F.col("props"), "k INT").getField("k") >= 50
        ).alias("b"),
    )
    cm = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    with_pe = cm.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        (
            (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
            + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
        ).alias("pe_num"),
    ).select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        (F.col("n") * (F.col("n11") + F.col("n00")) - F.col("pe_num")).alias(
            "num"
        ),
        (F.col("n") * F.col("n") - F.col("pe_num")).alias("den"),
    )
    return with_pe.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        "num",
        "den",
        F.expr(
            "CASE WHEN den = 0 THEN NULL "  # constant labelers: kappa undefined
            "WHEN num >= 0 THEN (num * 1000000) div den "
            "ELSE -(((-num) * 1000000 + den - 1) div den) END"
        )
        .cast("long")
        .alias("kappa_ppm"),
    )


SQL_COHENS_KAPPA = """
WITH lab AS (
  SELECT (CAST(floor(value * 100) AS BIGINT) >= 5000) AS a,
         (CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50) AS b
  FROM events
), cm AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
           AS n00
  FROM lab
), scaled AS (
  SELECT n, n11, n10, n01, n00,
         n * (n11 + n00)
           - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS num,
         n * n
           - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS den
  FROM cm
)
SELECT n, n11, n10, n01, n00, num, den,
       CAST(CASE WHEN den = 0 THEN NULL
                 WHEN num >= 0 THEN (num * 1000000) // den
                 ELSE -(((-num) * 1000000 + den - 1) // den) END
            AS BIGINT) AS kappa_ppm
FROM scaled
"""


# ---------------------------------------------------------------------------
# Exact AUC — Mann-Whitney rank statistic without a global sort
# ---------------------------------------------------------------------------
_SCORE_BUCKET = 4096  # value-domain bucket (cents div 4096) for the prefix


def _score_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(score-cents → pos/neg counts) histogram for auc_exact: score =
    integer event-value cents, label = props k ≥ 50 (the kappa query's
    labeler B).  Lazily checkpointed — the cell frame feeds the
    bucket-offset build AND the ranked walk (same reasoning as
    equi_depth_histogram's cells)."""
    lab = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100).cast("long").alias("score"),
        (
            F.from_json(F.col("props"), "k INT").getField("k") >= 50
        ).alias("pos"),
    )
    return (
        # NULL scores would get a NULL bucket and silently vanish at the
        # inner bucket join while the DuckDB oracle's window kept them
        # (ordered last) — filter them symmetrically on both engines
        # (events.value is non-null today; this pins the behavior if a
        # regeneration ever changes that)
        lab.where(F.col("score").isNotNull())
        .groupBy("score")
        .agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0))
            .cast("long")
            .alias("pc"),
            F.sum(F.when(~F.col("pos"), 1).otherwise(0))
            .cast("long")
            .alias("nc"),
        )
        .withColumn("bucket", F.expr(f"score div {_SCORE_BUCKET}"))
        .localCheckpoint(eager=False)
    )


def _bucketed_cum(cells: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Two-phase global running sums over score cells: per-bucket offsets
    from a bounded tiny-frame self-join (the bucket frame is VALUE-DOMAIN
    sized — score div 4096 — independent of row count), then an in-bucket
    running sum on the bucket partitioning.  Returns cells + one
    inclusive ``cum_<col>`` per requested column.  The no-key two-phase
    prefix introduced by equi_depth_histogram, shared by the ranking
    metrics."""
    buckets = cells.groupBy("bucket").agg(
        *[F.sum(c).alias(f"b_{c}") for c in cols]
    )
    lower = buckets.select(
        F.col("bucket").alias("lb"),
        *[F.col(f"b_{c}").alias(f"l_{c}") for c in cols],
    )
    offsets = (
        buckets.join(
            F.broadcast(lower), F.col("lb") < F.col("bucket"), "left"
        )
        .groupBy("bucket")
        .agg(
            *[
                F.coalesce(F.sum(f"l_{c}"), F.lit(0)).alias(f"off_{c}")
                for c in cols
            ]
        )
    )
    w_inb = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cells.join(F.broadcast(offsets), "bucket")
    return ranked.select(
        *cells.columns,
        *[
            (F.col(f"off_{c}") + F.sum(c).over(w_inb)).alias(f"cum_{c}")
            for c in cols
        ],
    )


def q_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC of the value-cents score against the props-k label —
    the threshold-free ranking metric behind every classifier gate, via
    the Mann-Whitney identity: AUC = P(score⁺ > score⁻) + ½·P(tie).

    No global sort and no per-row rank: reduce to (score → pos/neg
    count) cells, run the two-phase bucket-offset prefix for the
    cumulative negative count, and one aggregation computes the DOUBLED
    integer numerator Σ pc·(2·cum_neg_excl + nc) — each positive row
    counts 2 per strictly-lower negative and 1 per tied negative, so ½
    never materializes as a float.  den2 = 2·n_pos·n_neg;
    auc_ppm = (num2·10⁶) div den2, every operand non-negative.  Overflow
    bound: num2 ≤ 2·n⁺·n⁻ and the ppm product stays in bigint to
    n ≈ 4·10⁶ rows — beyond, re-encode the two products as
    DECIMAL(38,0) (documented, not needed at test SFs).
    """
    cells = _score_cells(spark, sf_dir)
    ranked = _bucketed_cum(cells, ("nc",)).select(
        "pc", "nc", (F.col("cum_nc") - F.col("nc")).alias("cneg_excl")
    )
    agg = ranked.agg(
        (F.sum("pc") + F.sum("nc")).cast("long").alias("n"),
        F.sum("pc").cast("long").alias("n_pos"),
        F.sum("nc").cast("long").alias("n_neg"),
        F.sum(
            F.col("pc") * (2 * F.col("cneg_excl") + F.col("nc"))
        )
        .cast("long")
        .alias("num2"),
        (2 * F.sum("pc") * F.sum("nc")).cast("long").alias("den2"),
    )
    # the ppm division references the aggregate aliases, so it stages in a
    # second select (F.expr cannot see same-select aliases — CLAUDE.md)
    return agg.select(
        "n",
        "n_pos",
        "n_neg",
        "num2",
        "den2",
        F.expr("CAST((num2 * 1000000) div den2 AS BIGINT)").alias("auc_ppm"),
    )


SQL_AUC_EXACT = """
WITH lab AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS score,
         (CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50) AS pos
  FROM events WHERE value IS NOT NULL
), cells AS (
  SELECT score,
         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pc,
         CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS nc
  FROM lab GROUP BY score
), ranked AS (
  SELECT pc, nc,
         sum(nc) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nc
           AS cneg_excl
  FROM cells
)
SELECT CAST(sum(pc) + sum(nc) AS BIGINT) AS n,
       CAST(sum(pc) AS BIGINT) AS n_pos,
       CAST(sum(nc) AS BIGINT) AS n_neg,
       CAST(sum(pc * (2 * cneg_excl + nc)) AS BIGINT) AS num2,
       CAST(2 * sum(pc) * sum(nc) AS BIGINT) AS den2,
       CAST((sum(pc * (2 * cneg_excl + nc)) * 1000000)
            // (2 * sum(pc) * sum(nc)) AS BIGINT) AS auc_ppm
FROM ranked
"""


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample statistic — drift testing without a sort
# ---------------------------------------------------------------------------
def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between the purchase and view value
    distributions: D = max |F_a(x) − F_b(x)| — the classic
    distribution-drift test beside `distribution_drift`'s binned
    divergence, here EXACT over the full empirical CDFs.

    Same machinery as auc_exact: (score → a/b counts) cells, two-phase
    cumulative counts, then the scaled integer statistic
    d = |cum_a·n_b − cum_b·n_a| (common denominator n_a·n_b — no float
    CDFs).  The maximizing score reports where the distributions diverge
    most (ties → smallest score, via the cusum-style max join-back).
    ks_ppm = (d_max·10⁶) div (n_a·n_b), all non-negative.
    """
    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100).cast("long").alias("score"),
        "event_type",
    )
    cells = (
        # score NOT NULL: same symmetric-null rule as _score_cells
        ev.where(
            F.col("event_type").isin("purchase", "view")
            & F.col("score").isNotNull()
        )
        .groupBy("score")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("ac"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("bc"),
        )
        .withColumn("bucket", F.expr(f"score div {_SCORE_BUCKET}"))
        .localCheckpoint(eager=False)
    )
    cum = _bucketed_cum(cells, ("ac", "bc"))
    totals = cells.agg(
        F.sum("ac").cast("long").alias("n_a"),
        F.sum("bc").cast("long").alias("n_b"),
    )
    # scored feeds BOTH the d_max aggregate and the max join-back —
    # unpinned, the bucketed-cum window pipeline over the (pinned) cells
    # ran twice; the frame is one narrow row per score cell (r15, §1.2)
    scored = (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "score",
            "n_a",
            "n_b",
            F.abs(
                F.col("cum_ac") * F.col("n_b")
                - F.col("cum_bc") * F.col("n_a")
            ).alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    dmax = scored.agg(F.max("d").alias("d_max"))
    return (
        scored.join(F.broadcast(dmax), F.col("d") == F.col("d_max"))
        .groupBy("n_a", "n_b", "d_max")
        .agg(F.min("score").cast("long").alias("at_score_c"))
        .select(
            "n_a",
            "n_b",
            F.col("d_max").cast("long").alias("d_scaled"),
            "at_score_c",
            F.expr("CAST((d_max * 1000000) div (n_a * n_b) AS BIGINT)").alias(
                "ks_ppm"
            ),
        )
    )


SQL_KS_STATISTIC = """
WITH ev AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS score, event_type
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
), cells AS (
  SELECT score,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS ac,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS bc
  FROM ev GROUP BY score
), cum AS (
  SELECT score,
         sum(ac) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ac,
         sum(bc) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_bc,
         (SELECT sum(ac) FROM cells) AS n_a,
         (SELECT sum(bc) FROM cells) AS n_b
  FROM cells
), scored AS (
  SELECT score, n_a, n_b,
         abs(cum_ac * n_b - cum_bc * n_a) AS d
  FROM cum
)
SELECT CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       CAST(max(d) AS BIGINT) AS d_scaled,
       CAST(min(CASE WHEN d = (SELECT max(d) FROM scored) THEN score END)
            AS BIGINT) AS at_score_c,
       CAST((max(d) * 1000000) // (max(n_a) * max(n_b)) AS BIGINT) AS ks_ppm
FROM scored
"""


# ---------------------------------------------------------------------------
# Correlated-column statistics — PostgreSQL CREATE STATISTICS shape
# ---------------------------------------------------------------------------
_CORR_PAIRS = (
    ("l_returnflag", "l_linestatus"),
    ("l_linenumber", "l_linestatus"),
)


def q_correlated_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column dependency statistics for pinned column pairs — what
    single-column stats cannot see: an optimizer multiplying independent
    selectivities over-prunes when columns correlate (the classic
    ANALYZE blind spot PostgreSQL's ``CREATE STATISTICS`` fixes).

    Per pair: exact NDVs of each side and of the combination, plus
    independence_ppm = ndv_ab·10⁶ div (ndv_a·ndv_b) — 10⁶ means the
    combination space is fully populated, far below means functional
    dependence (in spec TPC-H, returnflag R/A only pairs with
    linestatus F, so the pair would report 4/6 ≈ 666 667; the driver's
    synthetic generator draws the flags independently, so both pinned
    pairs measure the full 10⁶ — the audit's value is the measurement
    itself) — and the modal combination with its exact row share.
    One distinct-pair
    aggregate per pinned pair, each map-side combined to the pair's
    combination cardinality; the modal pick is the min_by complement
    selector on the tiny combo frame (no window)."""
    li = _t(spark, sf_dir, "lineitem")
    outs = []
    for a, b in _CORR_PAIRS:
        combos = li.groupBy(
            F.col(a).cast("string").alias("va"),
            F.col(b).cast("string").alias("vb"),
        ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # modal combo via lexicographic-min complement selector: padded
        # (max-cnt complement, va, vb) so min == (max cnt, then min combo)
        # total order: fixed-width max-cnt complement, then the exact
        # combo string the oracle minimizes over - no min_by tie ever
        sel = F.concat(
            F.lpad((F.lit(10**12) - F.col("cnt")).cast("string"), 13, "0"),
            F.lit("|"),
            F.col("va"),
            F.lit("|"),
            F.col("vb"),
        )
        outs.append(
            combos.agg(
                F.lit(f"{a}|{b}").alias("pair"),
                F.countDistinct("va").cast("long").alias("ndv_a"),
                F.countDistinct("vb").cast("long").alias("ndv_b"),
                F.count(F.lit(1)).cast("long").alias("ndv_ab"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.min_by(F.concat("va", F.lit("|"), "vb"), sel).alias(
                    "modal_combo"
                ),
                F.max("cnt").cast("long").alias("modal_cnt"),
            )
        )
    un = outs[0]
    for o in outs[1:]:
        un = un.unionByName(o)
    return un.select(
        "pair",
        "ndv_a",
        "ndv_b",
        "ndv_ab",
        "n_rows",
        F.expr("CAST((ndv_ab * 1000000) div (ndv_a * ndv_b) AS BIGINT)").alias(
            "independence_ppm"
        ),
        "modal_combo",
        "modal_cnt",
        F.expr("CAST((modal_cnt * 1000000) div n_rows AS BIGINT)").alias(
            "modal_share_ppm"
        ),
    ).orderBy("pair")


def _sql_corr_pair(a: str, b: str) -> str:
    return f"""
  SELECT '{a}|{b}' AS pair,
         CAST(count(DISTINCT va) AS BIGINT) AS ndv_a,
         CAST(count(DISTINCT vb) AS BIGINT) AS ndv_b,
         CAST(count(*) AS BIGINT) AS ndv_ab,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         min(CASE WHEN cnt = (SELECT max(cnt) FROM c_{a}_{b}) THEN va || '|' || vb END)
           AS modal_combo,
         CAST(max(cnt) AS BIGINT) AS modal_cnt
  FROM c_{a}_{b}"""


SQL_CORRELATED_COLUMN_STATS = (
    "WITH "
    + ", ".join(
        f"""c_{a}_{b} AS (
  SELECT CAST({a} AS VARCHAR) AS va, CAST({b} AS VARCHAR) AS vb,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY va, vb
)"""
        for a, b in _CORR_PAIRS
    )
    + ", per_pair AS ("
    + " UNION ALL ".join(_sql_corr_pair(a, b) for a, b in _CORR_PAIRS)
    + """
)
SELECT pair, ndv_a, ndv_b, ndv_ab, n_rows,
       CAST((ndv_ab * 1000000) // (ndv_a * ndv_b) AS BIGINT)
         AS independence_ppm,
       modal_combo, modal_cnt,
       CAST((modal_cnt * 1000000) // n_rows AS BIGINT) AS modal_share_ppm
FROM per_pair
ORDER BY pair
"""
)


# ---------------------------------------------------------------------------
# Join-cardinality estimation — the stats CONSUMED, not just reported
# ---------------------------------------------------------------------------
def q_join_cardinality_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The System-R estimator a cost-based optimizer runs on the stats
    this tier collects: |A ⋈ B| ≈ n_a·n_b / max(ndv_a, ndv_b) for an
    equi-join on (o_orderkey = l_orderkey) — computed HERE from exact
    NDVs, then calibrated against the true join cardinality in the same
    result row (est_ppm_of_actual makes the estimator's bias auditable;
    on a PK-FK join the estimate is exact up to dangling keys, which the
    dangling_fk column quantifies).

    At 100 TB the actual-count leg is the calibration harness, not the
    product — the estimate needs only the two distinct-count aggregates
    (each O(n) scan → 1-row frame; the KMV synopsis in
    `join_size_estimate` is the sampled alternative when even a distinct
    is too much).  Every output is exact bigint; div on non-negative,
    with ``greatest(..., 1)`` divisor floors so a degenerate EMPTY table
    yields an agreed 0-row estimate instead of engine-divergent
    division-by-zero (Spark div→NULL vs DuckDB //→error).
    """
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    so = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_o"),
        F.countDistinct("o_orderkey").cast("long").alias("ndv_o"),
    )
    sl = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_l"),
        F.countDistinct("o_orderkey").cast("long").alias("ndv_l"),
    )
    actual = o.join(li, "o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("actual")
    )
    est = (
        so.crossJoin(F.broadcast(sl))
        .crossJoin(F.broadcast(actual))
        .select(
            "n_o",
            "ndv_o",
            "n_l",
            "ndv_l",
            "actual",
            F.expr(
                "CAST((n_o * n_l) div greatest(ndv_o, ndv_l, 1) AS BIGINT)"
            ).alias("est"),
        )
    )
    return est.select(
        "n_o",
        "ndv_o",
        "n_l",
        "ndv_l",
        "est",
        "actual",
        (F.col("n_l") - F.col("actual")).alias("dangling_fk"),
        F.expr("CAST((est * 1000000) div greatest(actual, 1) AS BIGINT)").alias(
            "est_ppm_of_actual"
        ),
    )


SQL_JOIN_CARDINALITY_CHECK = """
WITH so AS (
  SELECT CAST(count(*) AS BIGINT) AS n_o,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv_o
  FROM orders
), sl AS (
  SELECT CAST(count(*) AS BIGINT) AS n_l,
         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ndv_l
  FROM lineitem
), act AS (
  SELECT CAST(count(*) AS BIGINT) AS actual
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), est AS (
  SELECT n_o, ndv_o, n_l, ndv_l, actual,
         CAST((n_o * n_l) // greatest(ndv_o, ndv_l, 1) AS BIGINT) AS est
  FROM so CROSS JOIN sl CROSS JOIN act
)
SELECT n_o, ndv_o, n_l, ndv_l, est, actual,
       n_l - actual AS dangling_fk,
       CAST((est * 1000000) // greatest(actual, 1) AS BIGINT) AS est_ppm_of_actual
FROM est
"""


# ---------------------------------------------------------------------------
# Stats → plan feedback (round 10): the CONSUMING side of the ANALYZE tier
# ---------------------------------------------------------------------------
_BCAST_TABLES = (
    "region", "nation", "supplier", "customer", "part", "orders", "lineitem",
)


def q_broadcast_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The broadcast-vs-shuffle decision table a join planner reads: per
    candidate join side, exact row count and the exact post-projection
    byte estimate (``operators/planner.row_bytes_expr`` — octet lengths
    for strings, fixed widths for numerics), the resulting strategy at
    Spark's default 10 MiB ``autoBroadcastJoinThreshold``, and the
    threshold-utilization ppm.  This is the statistic
    ``stats_driven_join`` consumes (plan pin: the sub-threshold side
    plans BroadcastHashJoin, the over-threshold side keeps the shuffle
    join — tests/test_plan_shapes.py), measured where Spark's own
    file-size heuristic is blind: on the exact columns shipped, not the
    compressed file footprint.  One map-side-combined aggregate per
    table; the union is a 7-row stat frame."""
    from service_alerts_connector_spark.operators.planner import (
        DEFAULT_BROADCAST_BYTES,
        row_bytes_expr,
    )

    parts = []
    for tbl in _BCAST_TABLES:
        df = _t(spark, sf_dir, tbl)
        parts.append(
            df.agg(
                F.lit(tbl).alias("tbl"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(row_bytes_expr(df)).cast("long").alias("est_bytes"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "tbl",
        "n_rows",
        "est_bytes",
        F.when(
            F.col("est_bytes") <= DEFAULT_BROADCAST_BYTES, F.lit("broadcast")
        )
        .otherwise(F.lit("shuffle"))
        .alias("decision"),
        F.expr(
            f"CAST((est_bytes * 1000000) div {DEFAULT_BROADCAST_BYTES}"
            " AS BIGINT)"
        ).alias("threshold_ppm"),
    ).orderBy("tbl")


# Column lists + type widths the broadcast_decision ORACLE assumes for each
# parquet table.  The Spark side reads the live schema via row_bytes_expr,
# so any generator-side schema drift shows up only as an opaque oracle red —
# tests/test_catalog_stats.py pins _t(tbl).dtypes against this dict so drift
# fails loudly in pytest instead ("V" = variable-length string; numerics and
# timestamps carry their fixed on-wire width).
BCAST_ORACLE_SCHEMAS = {
    "region": [("r_regionkey", "INTEGER"), ("r_name", "V")],
    "nation": [
        ("n_nationkey", "INTEGER"), ("n_name", "V"),
        ("n_regionkey", "INTEGER"),
    ],
    "supplier": [
        ("s_suppkey", "BIGINT"), ("s_name", "V"),
        ("s_nationkey", "INTEGER"), ("s_acctbal", "DOUBLE"),
    ],
    "customer": [
        ("c_custkey", "BIGINT"), ("c_name", "V"),
        ("c_nationkey", "INTEGER"), ("c_acctbal", "DOUBLE"),
        ("c_mktsegment", "V"),
    ],
    "part": [
        ("p_partkey", "BIGINT"), ("p_name", "V"), ("p_brand", "V"),
        ("p_type", "V"), ("p_size", "INTEGER"),
        ("p_retailprice", "DOUBLE"),
    ],
    "orders": [
        ("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"),
        ("o_orderstatus", "V"), ("o_totalprice", "DOUBLE"),
        ("o_orderdate", "TIMESTAMP"), ("o_orderpriority", "V"),
    ],
    "lineitem": [
        ("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"),
        ("l_suppkey", "BIGINT"), ("l_linenumber", "INTEGER"),
        ("l_quantity", "DOUBLE"), ("l_extendedprice", "DOUBLE"),
        ("l_discount", "DOUBLE"), ("l_tax", "DOUBLE"),
        ("l_returnflag", "V"), ("l_linestatus", "V"),
        ("l_shipdate", "TIMESTAMP"),
    ],
}


def _sql_broadcast_decision() -> str:
    width = {"INTEGER": 4, "BIGINT": 8, "DOUBLE": 8, "TIMESTAMP": 8}
    legs = []
    for tbl, cols in BCAST_ORACLE_SCHEMAS.items():
        # DuckDB's byte length of a VARCHAR is strlen() (octet_length is
        # BLOB-only there); Spark's is octet_length — both count UTF-8 bytes
        terms = [
            f"coalesce(strlen({c}), 0)" if t == "V" else str(width[t])
            for c, t in cols
        ]
        legs.append(
            f"  SELECT '{tbl}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,\n"
            f"         CAST(sum({' + '.join(terms)}) AS BIGINT) AS est_bytes\n"
            f"  FROM {tbl}"
        )
    union = "\n  UNION ALL\n".join(legs)
    thr = 10 * 1024 * 1024
    return f"""
WITH sizes AS (
{union}
)
SELECT tbl, n_rows, est_bytes,
       CASE WHEN est_bytes <= {thr} THEN 'broadcast' ELSE 'shuffle' END
         AS decision,
       CAST((est_bytes * 1000000) // {thr} AS BIGINT) AS threshold_ppm
FROM sizes ORDER BY tbl
"""


SQL_BROADCAST_DECISION = _sql_broadcast_decision()


_RPP_K = 16


def q_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The range-layout plan audit: compute exact k=16 equi-depth split
    points over lineitem price cents with the certified two-phase prefix
    (``layout.compute_equi_depth_bounds`` — the stats side), ASSIGN every
    row to its range exactly as ``layout.write_range_partitioned`` does
    (same bound-array expression — the plan side), and report per range:
    row count, value span, and balance ppm (n·k·10⁶ div total; 10⁶ =
    perfectly equi-depth).  This is the audit a 100 TB nightly re-layout
    runs before committing a sort order — skewed ppm means the stats are
    stale.  The bounds collect is a k-row stat frame; the assignment is
    one broadcast literal array, no join — and it runs on the PINNED
    histogram cells the bounds pass already reduced the scan to (every
    reported aggregate is value-determined: n_rows = Σcnt, lo/hi = per-
    range min/max of the value itself), so the fact table is scanned
    ONCE per plan instead of twice (r15, guide §1.2; the DuckDB oracle
    has always assigned on its cells CTE — same quotient structure)."""
    from service_alerts_connector_spark.operators.layout import (
        equi_depth_bounds_with_cells,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    bounds, cells = equi_depth_bounds_with_cells(li, "cents", k=_RPP_K)
    bnds = F.expr(
        "array("
        + ",".join(
            f"struct({i + 1} AS q, CAST({int(b)} AS BIGINT) AS ub)"
            for i, b in enumerate(bounds)
        )
        + ")"
    )
    assigned = (
        cells.select(F.col("v").alias("cents"), "cnt")
        .withColumn("_bnds", bnds)
        .select(
            "cents",
            "cnt",
            F.coalesce(
                F.expr("array_min(filter(_bnds, x -> cents <= x.ub)).q"),
                F.lit(_RPP_K),
            ).alias("range_id"),
        )
    )
    per = assigned.groupBy("range_id").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.min("cents").cast("long").alias("lo_c"),
        F.max("cents").cast("long").alias("hi_c"),
    )
    totals = per.agg(F.sum("n_rows").alias("ntot"))
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            F.col("range_id").cast("int").alias("range_id"),
            "n_rows",
            "lo_c",
            "hi_c",
            F.expr(
                f"CAST((n_rows * {_RPP_K} * 1000000) div ntot AS BIGINT)"
            ).alias("balance_ppm"),
        )
        .orderBy("range_id")
    )


SQL_RANGE_PARTITION_PLAN = f"""
WITH rev AS (
  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
), cells AS (
  SELECT cents, count(*) AS cnt FROM rev GROUP BY cents
), ranked AS (
  SELECT cents, cnt,
         sum(cnt) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER () AS n
  FROM cells
), qs AS (
  SELECT unnest(generate_series(1, {_RPP_K - 1})) AS q
), bounds AS (
  SELECT q, min(CASE WHEN cum >= greatest(1, (q * n) // {_RPP_K})
                     THEN cents END) AS ub
  FROM ranked CROSS JOIN qs GROUP BY q
  UNION ALL
  SELECT {_RPP_K} AS q, max(cents) AS ub FROM cells
), assign AS (
  SELECT c.cents, c.cnt, coalesce(min(b.q), {_RPP_K}) AS range_id
  FROM cells c LEFT JOIN bounds b ON c.cents <= b.ub
  GROUP BY c.cents, c.cnt
), per AS (
  SELECT range_id,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(min(cents) AS BIGINT) AS lo_c,
         CAST(max(cents) AS BIGINT) AS hi_c
  FROM assign GROUP BY range_id
)
SELECT CAST(range_id AS INTEGER) AS range_id, n_rows, lo_c, hi_c,
       CAST((n_rows * {_RPP_K} * 1000000)
            // (SELECT sum(n_rows) FROM per) AS BIGINT) AS balance_ppm
FROM per ORDER BY range_id
"""


def q_analyze_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANALYZE byte-statistics frame itself (``operators/planner
    analyze_byte_stats``) as an oracled query: per column of the two
    broadcast-candidate dims, exact row count and byte sum (octet sums
    for strings, width × rows for fixed types).  This is the frame the
    versioned stats store persists so ``est_bytes_from_store`` can price
    any projection of a join side WITHOUT rescanning it (plan pin:
    tests/test_plan_shapes.py::test_analyze_store_feeds_join_without_dim_rescan).
    One map-side-combined single-row aggregate per table; the per-column
    rows are an explode of that 1-row frame — nothing table-sized ever
    shuffles."""
    from service_alerts_connector_spark.operators.planner import (
        analyze_byte_stats,
    )

    return (
        analyze_byte_stats(_t(spark, sf_dir, "nation"), "nation")
        .unionByName(
            analyze_byte_stats(_t(spark, sf_dir, "supplier"), "supplier")
        )
        .orderBy("tbl", "col")
    )


def _sql_analyze_bytes() -> str:
    width = {"INTEGER": 4, "BIGINT": 8, "DOUBLE": 8, "TIMESTAMP": 8}
    legs = []
    for tbl in ("nation", "supplier"):
        for c, t in BCAST_ORACLE_SCHEMAS[tbl]:
            if t == "V":
                b = f"CAST(coalesce(sum(coalesce(strlen({c}), 0)), 0) AS BIGINT)"
            else:
                b = f"CAST(count(*) * {width[t]} AS BIGINT)"
            legs.append(
                f"SELECT '{tbl}' AS tbl, '{c}' AS col,\n"
                f"       CAST(count(*) AS BIGINT) AS n_rows,\n"
                f"       {b} AS byte_sum\nFROM {tbl}"
            )
    return "\nUNION ALL\n".join(legs) + "\nORDER BY tbl, col"


SQL_ANALYZE_BYTES = _sql_analyze_bytes()


def q_join_order_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """System-R left-deep join-order selection for the 3-table chain
    customer ⋈ orders ⋈ lineitem, from EXACT statistics: per candidate
    order, the estimated intermediate and final cardinalities under the
    textbook estimator |R ⋈ S| = |R|·|S| div max(ndv(R.k), ndv(S.k))
    (NDV-preservation assumption for the second join), the summed-
    intermediates cost (the C_out proxy System-R minimizes), and the
    winning order (ties break toward the first order name).  The
    consuming sibling of ``join_cardinality_check``: that query
    calibrates the estimator; this one lets it PICK the plan.

    All integer arithmetic on non-negative operands (Spark ``div`` ≡
    DuckDB ``//`` there — CLAUDE.md) so the two engines agree
    bit-for-bit; every NDV divisor is floored with ``greatest(..., 1)``
    so empty tables estimate 0 on both engines instead of diverging
    (Spark div-by-0→NULL vs DuckDB //-by-0→error).  Stats are three O(n)-scan single-row aggregates (the
    ANALYZE store ships them at 100 TB); everything after is a 1-row
    compute, so choosing the order for a petabyte join costs three stat
    lookups."""
    li = _t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).cast("long").alias("n_l"),
        F.countDistinct("l_orderkey").cast("long").alias("ndv_l_ok"),
    )
    o = _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_o"),
        F.countDistinct("o_orderkey").cast("long").alias("ndv_o_ok"),
        F.countDistinct("o_custkey").cast("long").alias("ndv_o_ck"),
    )
    c = _t(spark, sf_dir, "customer").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.countDistinct("c_custkey").cast("long").alias("ndv_c_ck"),
    )
    stats = li.crossJoin(F.broadcast(o)).crossJoin(F.broadcast(c))
    # F.expr can't reference a same-select alias (CLAUDE.md) — stage the
    # dependent estimates across selects
    c1 = stats.select(
        "*",
        F.expr("(n_l * n_o) div greatest(ndv_l_ok, ndv_o_ok, 1)").alias("i_lo"),
        F.expr("(n_o * n_c) div greatest(ndv_o_ck, ndv_c_ck, 1)").alias("i_oc"),
    )
    c2 = c1.select(
        "*",
        F.expr("(i_lo * n_c) div greatest(ndv_o_ck, ndv_c_ck, 1)").alias("t_lo"),
        F.expr("(i_oc * n_l) div greatest(ndv_o_ok, ndv_l_ok, 1)").alias("t_oc"),
    )
    c3 = c2.select(
        "*",
        (F.col("i_lo") + F.col("t_lo")).alias("c_lo"),
        (F.col("i_oc") + F.col("t_oc")).alias("c_oc"),
    )
    return (
        c3.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lineitem_orders_first").alias("order_name"),
                        F.col("i_lo").alias("est_intermediate"),
                        F.col("t_lo").alias("est_total"),
                        F.col("c_lo").alias("cost"),
                        (F.col("c_lo") <= F.col("c_oc")).alias("chosen"),
                    ),
                    F.struct(
                        F.lit("orders_customer_first").alias("order_name"),
                        F.col("i_oc").alias("est_intermediate"),
                        F.col("t_oc").alias("est_total"),
                        F.col("c_oc").alias("cost"),
                        (F.col("c_oc") < F.col("c_lo")).alias("chosen"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
        .orderBy("order_name")
    )


SQL_JOIN_ORDER_PLAN = """
WITH s AS (
  SELECT (SELECT count(*) FROM lineitem) AS n_l,
         (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS ndv_l_ok,
         (SELECT count(*) FROM orders) AS n_o,
         (SELECT count(DISTINCT o_orderkey) FROM orders) AS ndv_o_ok,
         (SELECT count(DISTINCT o_custkey) FROM orders) AS ndv_o_ck,
         (SELECT count(*) FROM customer) AS n_c,
         (SELECT count(DISTINCT c_custkey) FROM customer) AS ndv_c_ck
), c1 AS (
  SELECT s.*,
         (n_l * n_o) // greatest(ndv_l_ok, ndv_o_ok, 1) AS i_lo,
         (n_o * n_c) // greatest(ndv_o_ck, ndv_c_ck, 1) AS i_oc
  FROM s
), c2 AS (
  SELECT c1.*,
         (i_lo * n_c) // greatest(ndv_o_ck, ndv_c_ck, 1) AS t_lo,
         (i_oc * n_l) // greatest(ndv_o_ok, ndv_l_ok, 1) AS t_oc
  FROM c1
), c3 AS (
  SELECT c2.*, i_lo + t_lo AS c_lo, i_oc + t_oc AS c_oc FROM c2
)
SELECT 'lineitem_orders_first' AS order_name,
       CAST(i_lo AS BIGINT) AS est_intermediate,
       CAST(t_lo AS BIGINT) AS est_total,
       CAST(c_lo AS BIGINT) AS cost,
       c_lo <= c_oc AS chosen
FROM c3
UNION ALL
SELECT 'orders_customer_first',
       CAST(i_oc AS BIGINT), CAST(t_oc AS BIGINT), CAST(c_oc AS BIGINT),
       c_oc < c_lo
FROM c3
ORDER BY order_name
"""


def q_join_order_plan_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``join_order_plan`` with the statistics flowing through the
    ANALYZE STORE's representation instead of per-decision DISTINCT
    shuffles — the round-11 verdict's last planner-tier scan, closed.

    The join keys pass through ``operators/colstats.column_cells`` (the
    exact frame ``incremental_column_stats_ingest`` persists, one narrow
    explode + groupBy per table — the amortized ANALYZE pass a 100 TB
    deployment runs once per ingest, not per plan), then the DECISION
    consumes only the 4 (col_name, n_rows, ndv) stat rows
    (``colstats.ndv_from_cells``, missing columns defaulting to 0 so an
    empty table estimates 0 exactly like the zero-guarded oracle;
    ``planner.est_ndv_from_store`` is the strict store-facing API a
    runtime planner uses) and folds them into a literal 2-row frame
    with ``join_order_decision``.  The returned
    subtree therefore contains NO table scan and NO shuffle (pinned:
    tests/test_plan_shapes.py::test_join_order_plan_stored_has_no_scan),
    mirroring how ``analyze_bytes``/``est_bytes_from_store`` already
    price broadcast decisions.  The store round-trip itself (ingest →
    versioned store → est_ndv_from_store → identical decision) is
    pinned in tests/test_incremental_colstats.py.  For high-NDV keys
    where even the amortized exact cells are too much state, the KMV
    synopsis (`join_size_estimate`) and the HLL register store are the
    documented sampled alternatives.

    Values are bit-identical to ``join_order_plan``: cell NDV counts
    non-null distinct string-casts of the keys (injective on integers ≡
    count(DISTINCT k)), n_rows = Σcnt ≡ count(*), and the Python floor
    division runs on non-negative operands (≡ Spark div ≡ DuckDB //) —
    so the same System-R oracle certifies both."""
    from service_alerts_connector_spark.operators.colstats import (
        column_cells,
    )
    from service_alerts_connector_spark.operators.planner import (
        join_order_decision,
    )

    li_cells = column_cells(
        _t(spark, sf_dir, "lineitem").select("l_orderkey"),
        [("l_orderkey", F.col("l_orderkey").cast("string"))],
    )
    o_cells = column_cells(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        [
            ("o_orderkey", F.col("o_orderkey").cast("string")),
            ("o_custkey", F.col("o_custkey").cast("string")),
        ],
    )
    c_cells = column_cells(
        _t(spark, sf_dir, "customer").select("c_custkey"),
        [("c_custkey", F.col("c_custkey").cast("string"))],
    )
    # ndv_from_cells directly rather than est_ndv_from_store: the store
    # helper RAISES on columns with no cells (planner safety), but here an
    # empty table must estimate 0 exactly like the zero-guarded oracle, so
    # degenerate testdata yields an agreed 2-row result instead of a
    # query-side crash vs an oracle-side answer
    from service_alerts_connector_spark.operators.colstats import (
        ndv_from_cells,
    )

    rows = ndv_from_cells(
        li_cells.unionByName(o_cells).unionByName(c_cells)
    ).collect()
    present = {r["col_name"]: (int(r["n_rows"]), int(r["ndv"])) for r in rows}
    per = {
        c: present.get(c, (0, 0))
        for c in ("l_orderkey", "o_orderkey", "o_custkey", "c_custkey")
    }
    return join_order_decision(
        spark,
        {
            "n_l": per["l_orderkey"][0],
            "ndv_l_ok": per["l_orderkey"][1],
            "n_o": per["o_orderkey"][0],
            "ndv_o_ok": per["o_orderkey"][1],
            "ndv_o_ck": per["o_custkey"][1],
            "n_c": per["c_custkey"][0],
            "ndv_c_ck": per["c_custkey"][1],
        },
    )


_SALT_PARTS = 32    # reducer budget the hot key is measured against
_SALT_FACTOR = 4    # AQE's skewedPartitionFactor analogue


def q_skew_salting_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIRD stats→plan consumer, completing the trilogy: byte stats
    price broadcasts (``broadcast_decision``), NDV stats order joins
    (``join_order_plan_stored``), and the MCV cell histogram here decides
    WHERE THE SALT GOES — per candidate shuffle key, salt exactly when
    the hottest value's row count exceeds ``_SALT_FACTOR ×`` the average
    reducer's share at ``_SALT_PARTS`` partitions (the same
    factor-over-median rule AQE's skewedPartitionFactor applies at
    runtime, applied at PLAN time so the mitigation is chosen before the
    first shuffle melts a reducer; ``skew_salted_agg`` is the mitigation
    this decision switches on, ``skew_report`` its per-key drill-down).

    Statistics flow through the colstats CELL layout (one
    ``column_cells`` pass per table — the frame the versioned ANALYZE
    store persists) into ``operators/planner.salting_decision_from_cells``
    — the SAME function a runtime planner points at a persisted store
    version, where it reads ≤ Σ NDV(col) cell rows instead of the tables
    (store round-trip pinned in tests/test_incremental_colstats.py).
    The MCV is derived engine-portably with the padded-selector rule
    (CLAUDE.md min_by/max_by): max over ``lpad(cnt,12,'0')|val``
    strings, unique per cell, so Spark and DuckDB agree bit-for-bit
    without arg_max tie-break trouble.  All arithmetic is non-negative
    integer div with greatest(...,1) floors.  Since round 13 the NULL
    cell participates in the skew test (``hot_cnt =
    greatest(mcv1_cnt, null_cnt)``): in an aggregate-shaped shuffle
    every NULL key lands on ONE reducer exactly like a hot value, so a
    NULL-dominant column must read ``salt`` — ``null_cnt`` rides in the
    frame so join-shaped consumers (which prune NULL keys) can re-test
    on ``mcv1_cnt`` alone.  ``planner.stats_driven_aggregate`` is the
    runtime consumer dispatching on this decision."""
    from service_alerts_connector_spark.operators.colstats import (
        column_cells,
    )
    from service_alerts_connector_spark.operators.planner import (
        salting_decision_from_cells,
    )

    per_table = {
        "lineitem": [
            ("l_partkey", F.col("l_partkey").cast("string")),
            ("l_returnflag", F.col("l_returnflag").cast("string")),
        ],
        "orders": [("o_orderstatus", F.col("o_orderstatus").cast("string"))],
        "events": [
            ("user_id", F.col("user_id").cast("string")),
            ("event_type", F.col("event_type").cast("string")),
        ],
    }
    stat_frames = [
        salting_decision_from_cells(
            column_cells(
                _t(spark, sf_dir, tbl).select(*[p[0] for p in pairs]), pairs
            ),
            parts=_SALT_PARTS,
            factor=_SALT_FACTOR,
            tbl=tbl,
        )
        for tbl, pairs in per_table.items()
    ]
    out = stat_frames[0]
    for f in stat_frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("tbl", "col")


def _sql_skew_salting_decision() -> str:
    legs = {
        "lineitem": ["l_partkey", "l_returnflag"],
        "orders": ["o_orderstatus"],
        "events": ["user_id", "event_type"],
    }
    cells = "\nUNION ALL\n".join(
        f"  SELECT '{tbl}' AS tbl, '{c}' AS col_name, "
        f"CAST({c} AS VARCHAR) AS val FROM {tbl}"
        for tbl, cols in legs.items()
        for c in cols
    )
    return f"""
WITH pairs AS (
{cells}
), cells AS (
  SELECT tbl, col_name, val, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY tbl, col_name, val
), stats AS (
  SELECT tbl, col_name,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(count(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT) AS ndv,
         CAST(max(CASE WHEN val IS NOT NULL THEN cnt END) AS BIGINT)
           AS mcv1_cnt,
         CAST(coalesce(sum(CASE WHEN val IS NULL THEN cnt END), 0)
           AS BIGINT) AS null_cnt,
         max(CASE WHEN val IS NOT NULL THEN
               lpad(CAST(cnt AS VARCHAR), 12, '0') || '|' || val END) AS sel
  FROM cells GROUP BY tbl, col_name
)
SELECT tbl, col_name AS col, n_rows, ndv,
       substring(sel, 14) AS mcv1, mcv1_cnt, null_cnt,
       greatest(coalesce(mcv1_cnt, 0), null_cnt) AS hot_cnt,
       n_rows // greatest(ndv, 1) AS avg_per_key,
       CAST(greatest(coalesce(mcv1_cnt, 0), null_cnt) * 1000000
            // greatest(n_rows, 1) AS BIGINT) AS hot_share_ppm,
       CASE WHEN greatest(coalesce(mcv1_cnt, 0), null_cnt)
                 > {_SALT_FACTOR} * greatest(n_rows // {_SALT_PARTS}, 1)
            THEN 'salt' ELSE 'plain' END AS decision
FROM stats ORDER BY tbl, col
"""


SQL_SKEW_SALTING_DECISION = _sql_skew_salting_decision()


STATS_QUERIES = {
    "column_stats_mcv": q_column_stats_mcv,
    "equi_depth_histogram": q_equi_depth_histogram,
    "cohens_kappa": q_cohens_kappa,
    "auc_exact": q_auc_exact,
    "ks_statistic": q_ks_statistic,
    "join_cardinality_check": q_join_cardinality_check,
    "correlated_column_stats": q_correlated_column_stats,
    "broadcast_decision": q_broadcast_decision,
    "range_partition_plan": q_range_partition_plan,
    "analyze_bytes": q_analyze_bytes,
    "join_order_plan": q_join_order_plan,
    "join_order_plan_stored": q_join_order_plan_stored,
    "skew_salting_decision": q_skew_salting_decision,
}

STATS_ORACLES = {
    "column_stats_mcv": SQL_COLUMN_STATS_MCV,
    "equi_depth_histogram": SQL_EQUI_DEPTH_HISTOGRAM,
    "cohens_kappa": SQL_COHENS_KAPPA,
    "auc_exact": SQL_AUC_EXACT,
    "ks_statistic": SQL_KS_STATISTIC,
    "join_cardinality_check": SQL_JOIN_CARDINALITY_CHECK,
    "correlated_column_stats": SQL_CORRELATED_COLUMN_STATS,
    "broadcast_decision": SQL_BROADCAST_DECISION,
    "range_partition_plan": SQL_RANGE_PARTITION_PLAN,
    "analyze_bytes": SQL_ANALYZE_BYTES,
    "join_order_plan": SQL_JOIN_ORDER_PLAN,
    # bit-identical estimator on the same exact stats — the store-fed
    # variant certifies against the same System-R SQL
    "join_order_plan_stored": SQL_JOIN_ORDER_PLAN,
    "skew_salting_decision": SQL_SKEW_SALTING_DECISION,
}
