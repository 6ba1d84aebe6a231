"""Catalog — round-7 additions: recurrence, changepoint, seasonality,
correlated-subquery join-back, and weighted order statistics.

Five patterns the earlier tiers did not cover, each with a full DuckDB
value-hash oracle and the catalog.py determinism rules (integer cents,
floored epoch seconds, explicit tiebreaks, no unpartitioned windows):

- `clamped_running_balance` — the Lindley recursion b_t = max(0,
  b_{t-1} + x_t) (inventory that cannot go negative, queue waiting time,
  battery charge).  NOT prefix-sum decomposable at first glance, but has
  the exact closed form b_t = S_t - least(0, running_min(S_t)) over plain
  keyed windows — the oracle deliberately computes the recurrence the
  OTHER way (a DuckDB recursive CTE stepping row by row), so the
  differential proves the closed-form identity rather than re-running the
  same plan twice.
- `cusum_changepoint` — exact integer CUSUM peak per event type: with D
  days and total T, D·prefix_t − t·T is the scaled cumulative deviation
  (never a float mean), and its absolute peak marks the level shift.
- `seasonal_dow_profile` — day-of-week decomposition with engine-proof
  weekday math (day_num mod 7 from a pinned epoch, NOT dayofweek(),
  whose origin differs between Spark and DuckDB) and exact scaled
  residual extremes (cnt·dow_days − dow_sum).
- `cheapest_supplier_per_part` — TPC-H Q2's correlated-subquery shape
  (min cost per part, then recover the row achieving it) as a
  group-min + join-back, region-constrained through the dimension chain;
  the repo's testdata has no partsupp, so lineitem plays the
  part↔supplier price list (documented stand-in).
- `weighted_median_price` — quantity-weighted exact median per return
  flag via the round-7 histogram-rank pattern (groupBy (flag, cents) →
  per-flag running weight sum → smallest cents reaching rank
  (W+1) div 2): order statistics with weights, no per-group array ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _t
from service_alerts_connector_spark.catalog_events import _epoch_s


# ---------------------------------------------------------------------------
# Clamped running balance — Lindley recursion via its prefix-sum closed form
# ---------------------------------------------------------------------------
def q_clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user clamped balance: purchases draw down, every other event
    deposits, and the balance floors at zero (b_t = max(0, b_{t-1} + x_t)).

    The recursion looks inherently sequential, but Lindley's identity
    makes it two keyed windows: with S_t the plain prefix sum of deltas,
    b_t = S_t - least(0, min_{j<=t} S_j) exactly.  So the plan is ONE
    exchange on user_id (prefix sum, then running min of that sum on the
    same partitioning) — no loop, no UDF, no per-group array; at 100 TB
    it scales like any other keyed window.

    The oracle is a DuckDB recursive CTE that steps the recurrence row by
    row — an independent derivation, so a green differential certifies
    the closed form itself.  Cents clamp non-negative (twap_value's
    generator-drift guard); value magnitudes keep S_t far below 2^63.
    """
    ev = _t(spark, sf_dir, "events")
    staged = ev.select(
        "user_id",
        "event_id",
        _epoch_s("ts").alias("t"),
        F.when(
            F.col("event_type") == "purchase",
            -F.greatest(
                F.floor(F.col("value") * 100).cast("long"),
                F.lit(0).cast("long"),
            ),
        )
        .otherwise(
            F.greatest(
                F.floor(F.col("value") * 100).cast("long"),
                F.lit(0).cast("long"),
            )
        )
        .alias("delta_c"),
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("t"), F.asc("event_id"))
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_s = staged.withColumn("s", F.sum("delta_c").over(w_run))
    with_bal = with_s.withColumn(
        "bal",
        F.col("s")
        - F.least(F.lit(0).cast("long"), F.min("s").over(w_run)),
    ).withColumn("rn", F.row_number().over(w))
    return (
        with_bal.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max_by("bal", "rn").cast("long").alias("final_balance_c"),
            F.max("bal").cast("long").alias("peak_balance_c"),
        )
        .orderBy("user_id")
    )


SQL_CLAMPED_RUNNING_BALANCE = """
WITH RECURSIVE staged AS (
  SELECT user_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(epoch(ts)) AS BIGINT) ASC, event_id ASC
         ) AS rn,
         CASE WHEN event_type = 'purchase'
              THEN -greatest(CAST(floor(value * 100) AS BIGINT), 0)
              ELSE  greatest(CAST(floor(value * 100) AS BIGINT), 0)
         END AS delta_c
  FROM events
), rec AS (
  SELECT user_id, rn, greatest(delta_c, 0) AS bal
  FROM staged WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, greatest(r.bal + s.delta_c, 0)
  FROM rec r JOIN staged s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(arg_max(bal, rn) AS BIGINT) AS final_balance_c,
       CAST(max(bal) AS BIGINT) AS peak_balance_c
FROM rec
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint — scaled integer cumulative-deviation peak per type
# ---------------------------------------------------------------------------
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift detector per event type: the day where the cumulative
    deviation of daily counts from the type's mean peaks in magnitude.

    Exact integers throughout: with D days observed and T total events,
    stat_t = D·prefix_t − t·T is D times the float CUSUM — same argmax,
    no float mean.  The peak day resolves ties to the EARLIEST day via a
    max-abs aggregate joined back as a filter (both engines express the
    same two-stage pick, so no arg_max-on-float hazards).

    Scale shape: the calendar aggregation bounds everything — per type at
    most 366 cells reach the window, the join-back is a broadcast of ≤25
    rows.
    """
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_type = Window.partitionBy("event_type")
    w_run = w_type.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = daily.select(
        "event_type",
        "day",
        F.sum("cnt").over(w_run).alias("prefix"),
        F.row_number().over(w_type.orderBy("day")).alias("t_idx"),
        F.sum("cnt").over(w_type).alias("total"),
        F.count(F.lit(1)).over(w_type).alias("n_days"),
    ).withColumn(
        "abs_stat",
        F.abs(
            F.col("n_days") * F.col("prefix") - F.col("t_idx") * F.col("total")
        ),
    )
    # no pin on cusum: both consumers (peak aggregate, join-back filter)
    # re-converge on daily's (event_type, day) exchange, which AQE
    # runtime exchange reuse computes once — a localCheckpoint A/B'd
    # neutral-to-worse (0.74 s unpinned vs 0.77/1.05 pinned, r15); the
    # recomputed window above the reused exchange is ≤366×|types| rows
    peaks = cusum.groupBy("event_type").agg(
        F.max("abs_stat").alias("peak_abs_stat"),
        F.max("total").alias("total_events"),
        F.max("n_days").alias("n_days_t"),
    )
    return (
        cusum.join(F.broadcast(peaks), "event_type")
        .where(F.col("abs_stat") == F.col("peak_abs_stat"))
        .groupBy("event_type")
        .agg(
            F.min("day").alias("peak_day"),
            F.max("peak_abs_stat").cast("long").alias("peak_abs_stat"),
            F.max("total_events").cast("long").alias("total_events"),
            F.max("n_days_t").cast("long").alias("n_days"),
        )
        .orderBy("event_type")
    )


SQL_CUSUM_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt
  FROM events GROUP BY event_type, day
), cusum AS (
  SELECT event_type, day,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t_idx,
         sum(cnt) OVER (PARTITION BY event_type) AS total,
         count(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily
), scored AS (
  SELECT *, abs(n_days * prefix - t_idx * total) AS abs_stat FROM cusum
), peaks AS (
  SELECT event_type, max(abs_stat) AS peak_abs_stat,
         max(total) AS total_events, max(n_days) AS n_days_t
  FROM scored GROUP BY event_type
)
SELECT s.event_type,
       min(s.day) AS peak_day,
       CAST(max(p.peak_abs_stat) AS BIGINT) AS peak_abs_stat,
       CAST(max(p.total_events) AS BIGINT) AS total_events,
       CAST(max(p.n_days_t) AS BIGINT) AS n_days
FROM scored s JOIN peaks p
  ON p.event_type = s.event_type AND s.abs_stat = p.peak_abs_stat
GROUP BY s.event_type
ORDER BY s.event_type
"""


# ---------------------------------------------------------------------------
# Seasonal day-of-week profile — engine-proof weekday decomposition
# ---------------------------------------------------------------------------
def q_seasonal_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event type, weekday): how strong is the weekly cycle?  Mean
    daily count in exact micro units plus the scaled residual extremes.

    Weekday = pmod(day_num, 7) with day_num anchored at 2024-01-01 (a
    Monday), because Spark's dayofweek() (1 = Sunday) and DuckDB's
    dayofweek() (0 = Sunday) disagree at the origin — pinned integer
    arithmetic is the only portable weekday.  Residuals stay integers by
    scaling: r_d = cnt_d·dow_days − dow_sum (dow_days times the float
    residual, same sign/ordering).  mean_micro divides non-negative
    integers, so Spark `div` == DuckDB `//` (catalog.py negative-div
    rule).  Calendar-bounded: ≤ 25·366 daily cells, output 25·7 rows.
    """
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            )
            .cast("long")
            .alias("day_num"),
        )
        .groupBy("event_type", "day_num")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("dow", F.pmod(F.col("day_num"), F.lit(7)).cast("long"))
    )
    w_cell = Window.partitionBy("event_type", "dow")
    scored = daily.select(
        "event_type",
        "dow",
        "cnt",
        F.count(F.lit(1)).over(w_cell).alias("nd"),
        F.sum("cnt").over(w_cell).alias("sm"),
    ).withColumn("resid", F.col("cnt") * F.col("nd") - F.col("sm"))
    return (
        scored.groupBy("event_type", "dow")
        .agg(
            F.max("nd").cast("long").alias("dow_days"),
            F.max("sm").cast("long").alias("dow_sum"),
            F.max("resid").cast("long").alias("max_resid"),
            F.min("resid").cast("long").alias("min_resid"),
        )
        .withColumn("mean_micro", F.expr("(dow_sum * 1000000) div dow_days"))
        .select(
            "event_type",
            "dow",
            "dow_days",
            "dow_sum",
            "mean_micro",
            "max_resid",
            "min_resid",
        )
        .orderBy("event_type", "dow")
    )


SQL_SEASONAL_DOW_PROFILE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num,
         count(*) AS cnt
  FROM events GROUP BY event_type, day_num
), keyed AS (
  SELECT event_type, ((day_num % 7) + 7) % 7 AS dow, day_num, cnt FROM daily
), agg AS (
  SELECT event_type, dow,
         count(*) AS dow_days, sum(cnt) AS dow_sum
  FROM keyed GROUP BY event_type, dow
), resid AS (
  SELECT k.event_type, k.dow,
         max(k.cnt * a.dow_days - a.dow_sum) AS max_resid,
         min(k.cnt * a.dow_days - a.dow_sum) AS min_resid
  FROM keyed k JOIN agg a ON a.event_type = k.event_type AND a.dow = k.dow
  GROUP BY k.event_type, k.dow
)
SELECT a.event_type,
       CAST(a.dow AS BIGINT) AS dow,
       CAST(a.dow_days AS BIGINT) AS dow_days,
       CAST(a.dow_sum AS BIGINT) AS dow_sum,
       CAST((a.dow_sum * 1000000) // a.dow_days AS BIGINT) AS mean_micro,
       CAST(r.max_resid AS BIGINT) AS max_resid,
       CAST(r.min_resid AS BIGINT) AS min_resid
FROM agg a JOIN resid r ON r.event_type = a.event_type AND r.dow = a.dow
ORDER BY a.event_type, a.dow
"""


# ---------------------------------------------------------------------------
# Cheapest supplier per part — TPC-H Q2's correlated subquery as join-back
# ---------------------------------------------------------------------------
def q_cheapest_supplier_per_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q2's shape — `WHERE cost = (SELECT min(cost) ... WHERE same
    part AND region)` — expressed Spark-first as a group-min + join-back
    (Catalyst has no correlated-scalar-subquery pushdown worth fighting
    for here; the two-pass form is the plan you'd want anyway).

    This testdata ships no partsupp, so lineitem serves as the observed
    part↔supplier price list (documented stand-in; reference semantics:
    min over the region-eligible offers, then recover who offers it).
    Region gating runs through supplier→nation→region broadcasts before
    any aggregation, so the min is over EUROPE offers only — exactly the
    correlated predicate.  Ties on min cost resolve to the smallest
    supplier key (deterministic across engines).  Output: the 100
    cheapest (cost, part) pairs — TakeOrderedAndProject, no global sort.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cost_c"),
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").where(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    offers = li.join(F.broadcast(sup), "l_suppkey")
    mins = offers.groupBy("l_partkey").agg(F.min("cost_c").alias("min_cost_c"))
    return (
        offers.join(
            mins,
            (offers["l_partkey"] == mins["l_partkey"])
            & (offers["cost_c"] == mins["min_cost_c"]),
        )
        .drop(mins["l_partkey"])
        .groupBy("l_partkey", "min_cost_c")
        .agg(
            F.min("l_suppkey").cast("long").alias("cheapest_suppkey"),
            F.count(F.lit(1)).cast("long").alias("n_min_offers"),
        )
        .orderBy(F.asc("min_cost_c"), F.asc("l_partkey"))
        .limit(100)
    )


SQL_CHEAPEST_SUPPLIER_PER_PART = """
WITH sup AS (
  SELECT s.s_suppkey
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
), offers AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cost_c
  FROM lineitem l JOIN sup ON sup.s_suppkey = l.l_suppkey
), mins AS (
  SELECT l_partkey, min(cost_c) AS min_cost_c FROM offers GROUP BY l_partkey
)
SELECT o.l_partkey,
       m.min_cost_c,
       CAST(min(o.l_suppkey) AS BIGINT) AS cheapest_suppkey,
       CAST(count(*) AS BIGINT) AS n_min_offers
FROM offers o
JOIN mins m ON m.l_partkey = o.l_partkey AND o.cost_c = m.min_cost_c
GROUP BY o.l_partkey, m.min_cost_c
ORDER BY m.min_cost_c ASC, o.l_partkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Weighted median — histogram running-rank with weights
# ---------------------------------------------------------------------------
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted exact median line price per return flag — the
    "median unit actually shipped" statistic, where each price counts
    l_quantity times.

    The round-7 histogram-rank pattern with weights, TWO-PHASED for
    parallelism: reduce the fact table to (flag, cents) → summed weight
    cells (scalable shuffle agg), then instead of one per-flag running
    sum (3 return flags → a 3-task walk over up to ~6·10⁷ domain cells
    at full scale), split the prefix sum:

      1. bucket cells by ``cents div 2^20`` and aggregate per-(flag,
         bucket) weight/count partials — a tiny frame (flags × ≤ ~60
         buckets over the price domain);
      2. a per-flag exclusive running sum over THAT frame yields each
         bucket's starting offset (trivial window over ≤ ~180 rows);
      3. broadcast the offsets back onto the cells and run the running
         weight sum partitioned by (flag, bucket) — parallelism is now
         flags × buckets, each task walking ≤ 2^20 domain cells.

    The weighted lower median is the smallest cents whose cumulative
    weight reaches (W + 1) div 2 — bit-identical to the single-walk
    form.  No per-group array, no float percentile; quantities floor to
    bigints on both engines (CLAUDE.md: DuckDB's double→bigint CAST
    rounds, so the oracle floors explicitly).

    NOT NULL assumption: the inner broadcast join on (flag, bucket)
    would silently drop NULL-cents cells (NULL join keys never match)
    while the oracle's pure-window form keeps them in the per-flag
    walk.  TPC-H l_extendedprice/l_quantity are NOT NULL so the shapes
    agree here; wiring a nullable price source in requires filtering
    ``cents IS NOT NULL`` symmetrically in BOTH the Spark query and
    the oracle SQL.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
    )
    # cells feeds four branches but every one re-converges on the SAME
    # (flag, cents) shuffle, which AQE's runtime exchange reuse computes
    # once — a localCheckpoint pin A/B'd exactly 0 here (2.43/2.41/2.44 s
    # interleaved, r15), unlike boxplot/winsorized whose second branch
    # re-ran the SCAN below a different exchange.  Keep it unpinned.
    cells = li.groupBy("l_returnflag", "cents").agg(
        F.sum("qty").alias("w")
    ).withColumn("bucket", F.expr("cents div 1048576"))
    buckets = cells.groupBy("l_returnflag", "bucket").agg(
        F.sum("w").alias("bw"), F.count(F.lit(1)).alias("bn")
    )
    w_flag = Window.partitionBy("l_returnflag")
    w_prev = w_flag.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = buckets.select(
        "l_returnflag",
        "bucket",
        F.coalesce(F.sum("bw").over(w_prev), F.lit(0)).alias("boff"),
        F.sum("bw").over(w_flag).alias("wtot"),
        F.sum("bn").over(w_flag).alias("ncells"),
    )
    w_inb = (
        Window.partitionBy("l_returnflag", "bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cells.join(
        F.broadcast(offsets), ["l_returnflag", "bucket"]
    ).select(
        "l_returnflag",
        "cents",
        (F.col("boff") + F.sum("w").over(w_inb)).alias("cumw"),
        "wtot",
        "ncells",
    )
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.max("wtot").cast("long").alias("total_weight"),
            F.max("ncells").cast("long").alias("n_cells"),
            F.min(
                F.when(
                    F.col("cumw") >= F.expr("(wtot + 1) div 2"),
                    F.col("cents"),
                )
            )
            .cast("long")
            .alias("wmedian_c"),
        )
        .orderBy("l_returnflag")
    )


SQL_WEIGHTED_MEDIAN_PRICE = """
WITH cells AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
         sum(CAST(floor(l_quantity) AS BIGINT)) AS w
  FROM lineitem GROUP BY l_returnflag, cents
), ranked AS (
  SELECT l_returnflag, cents,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         sum(w) OVER (PARTITION BY l_returnflag) AS wtot,
         count(*) OVER (PARTITION BY l_returnflag) AS ncells
  FROM cells
)
SELECT l_returnflag,
       CAST(max(wtot) AS BIGINT) AS total_weight,
       CAST(max(ncells) AS BIGINT) AS n_cells,
       CAST(min(CASE WHEN cumw >= (wtot + 1) // 2 THEN cents END)
            AS BIGINT) AS wmedian_c
FROM ranked
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# SCD2 point-in-time join — facts against the dimension version at event time
# ---------------------------------------------------------------------------
def q_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE warehouse temporal-correctness pattern: join each fact to the
    dimension VERSION that was valid at the fact's timestamp, never the
    current one (`scd2_history` builds the intervals; this consumes
    them).  Dimension: each user's value band (cents div 2000) as last
    set by their signup/click stream, SCD2-versioned.  Facts: the same
    user's purchases.  A purchase before any band observation keeps a
    null state — left-join semantics, surfaced not dropped.

    Spark-first shape: NOT an inequality join (which would plan a
    per-user fan-out or worse) — the interval containing ts is exactly
    the run with the greatest valid_from <= ts, so the existing
    `operators/temporal.asof_join` (union + one keyed window, ONE
    user_id exchange) answers it; boundary ties (a zero-length version
    at the same timestamp) resolve to the highest version on both
    engines.  The oracle uses the classic
    `valid_from <= ts < valid_to` inequality join + arg_max(version) —
    an independent formulation of the same containment, so the
    differential certifies the asof rewrite.
    """
    from service_alerts_connector_spark.operators.scd import (
        scd2_from_changelog,
    )
    from service_alerts_connector_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    changelog = ev.where(
        F.col("event_type").isin("signup", "click")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "greatest(CAST(floor(value * 100) AS BIGINT), 0L) div 2000"
        ).alias("band"),
    )
    hist = scd2_from_changelog(
        changelog,
        key_col="user_id",
        attr_col="band",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        facts,
        hist.select("user_id", "valid_from", "band", "version"),
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        payload_cols=["band", "version"],
        right_tiebreak="version",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.col("band").cast("long").alias("band"),
        F.col("version").cast("long").alias("band_version"),
    ).orderBy("user_id", "event_id")


SQL_SCD2_TEMPORAL_JOIN = """
WITH changelog AS (
  SELECT user_id, ts, event_id,
         greatest(CAST(floor(value * 100) AS BIGINT), 0) // 2000 AS band
  FROM events WHERE event_type IN ('signup', 'click')
), ordered AS (
  SELECT user_id, band, ts, event_id,
         lag(ts) OVER w AS prev_ts,
         lag(band) OVER w AS prev_band
  FROM changelog
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), points AS (
  SELECT user_id, band, ts, event_id FROM ordered
  WHERE prev_ts IS NULL OR band IS DISTINCT FROM prev_band
), hist AS (
  SELECT user_id, band, ts AS valid_from,
         lead(ts) OVER w2 AS valid_to,
         row_number() OVER w2 AS version
  FROM points
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), facts AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT f.user_id, f.event_id,
       strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       CAST(arg_max(h.band, h.version) AS BIGINT) AS band,
       CAST(max(h.version) AS BIGINT) AS band_version
FROM facts f
LEFT JOIN hist h
  ON h.user_id = f.user_id
 AND h.valid_from <= f.ts
 AND (h.valid_to IS NULL OR f.ts < h.valid_to)
GROUP BY f.user_id, f.event_id, f.ts
ORDER BY f.user_id, f.event_id
"""


# ---------------------------------------------------------------------------
# Delta-join IVM — three-term incremental refresh of a JOIN view
# ---------------------------------------------------------------------------
def q_delta_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view under deltas on BOTH
    inputs — the algebraic rule Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB that
    `ivm_merge` (aggregate partials only) does not exercise.

    The per-nation revenue view orders⋈customer refreshes from four
    partial aggregates: the stored view A⋈B (orders through the cut ×
    long-standing customers), plus the three delta terms (new orders ×
    old customers, old orders × "new" customers — custkey ≡ 0 mod 7
    plays the freshly-ingested dimension slice — and new×new).  Each
    term aggregates map-side BEFORE the merge, so refresh cost is
    delta-dominated; `cents_full` re-derives every group from the
    unsplit join inside the same query, and `ok` pins merged ≡
    recomputed — the self-auditing refresh contract.

    All four joins are broadcast-dim equi-joins (customer side);
    partials merge by nation key.  Money in integer cents.
    """
    cut = F.lit("1996-12-31 23:59:59").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    a_old = orders.where(F.col("o_orderdate") <= cut)
    a_new = orders.where(F.col("o_orderdate") > cut)
    b_old = cust.where(F.col("o_custkey") % 7 != 0)
    b_new = cust.where(F.col("o_custkey") % 7 == 0)

    def term(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.join(F.broadcast(b), "o_custkey")
            .groupBy(F.col("c_nationkey").alias("nation"))
            .agg(
                F.count(F.lit(1)).alias("n_p"),
                F.sum("cents").alias("cents_p"),
            )
        )

    merged = (
        term(a_old, b_old)
        .unionByName(term(a_new, b_old))
        .unionByName(term(a_old, b_new))
        .unionByName(term(a_new, b_new))
        .groupBy("nation")
        .agg(
            F.sum("n_p").cast("long").alias("n_merged"),
            F.sum("cents_p").cast("long").alias("cents_merged"),
        )
    )
    full = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_full"),
            F.sum("cents").cast("long").alias("cents_full"),
        )
    )
    return (
        merged.join(full, "nation")
        .select(
            "nation",
            "n_merged",
            "cents_merged",
            "n_full",
            "cents_full",
            (
                (F.col("n_merged") == F.col("n_full"))
                & (F.col("cents_merged") == F.col("cents_full"))
            ).alias("ok"),
        )
        .orderBy("nation")
    )


SQL_DELTA_JOIN_IVM = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), c AS (
  SELECT c_custkey AS o_custkey, c_nationkey FROM customer
), terms AS (
  SELECT c.c_nationkey AS nation, count(*) AS n_p, sum(o.cents) AS cents_p
  FROM o JOIN c ON c.o_custkey = o.o_custkey
  WHERE o.o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
    AND c.o_custkey % 7 != 0
  GROUP BY nation
  UNION ALL
  SELECT c.c_nationkey, count(*), sum(o.cents)
  FROM o JOIN c ON c.o_custkey = o.o_custkey
  WHERE o.o_orderdate > TIMESTAMP '1996-12-31 23:59:59'
    AND c.o_custkey % 7 != 0
  GROUP BY c.c_nationkey
  UNION ALL
  SELECT c.c_nationkey, count(*), sum(o.cents)
  FROM o JOIN c ON c.o_custkey = o.o_custkey
  WHERE o.o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
    AND c.o_custkey % 7 = 0
  GROUP BY c.c_nationkey
  UNION ALL
  SELECT c.c_nationkey, count(*), sum(o.cents)
  FROM o JOIN c ON c.o_custkey = o.o_custkey
  WHERE o.o_orderdate > TIMESTAMP '1996-12-31 23:59:59'
    AND c.o_custkey % 7 = 0
  GROUP BY c.c_nationkey
), merged AS (
  SELECT nation,
         CAST(sum(n_p) AS BIGINT) AS n_merged,
         CAST(sum(cents_p) AS BIGINT) AS cents_merged
  FROM terms GROUP BY nation
), fullv AS (
  SELECT c.c_nationkey AS nation,
         CAST(count(*) AS BIGINT) AS n_full,
         CAST(sum(o.cents) AS BIGINT) AS cents_full
  FROM o JOIN c ON c.o_custkey = o.o_custkey
  GROUP BY nation
)
SELECT m.nation, m.n_merged, m.cents_merged, f.n_full, f.cents_full,
       (m.n_merged = f.n_full AND m.cents_merged = f.cents_full) AS ok
FROM merged m JOIN fullv f ON f.nation = m.nation
ORDER BY m.nation
"""




# ---------------------------------------------------------------------------
# Ancestor path sum — recursive value rollup in O(log depth) rounds
# ---------------------------------------------------------------------------
def q_ancestor_path_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inherited-cost rollup over the `hierarchy_roots` forest: every
    node's exact sum of a value over its whole ancestor chain (self +
    ancestors + root) — the recursive aggregation (rolled permissions,
    cumulative org budget, BOM path cost) relational engines write as a
    recursive CTE and Spark answers with
    ``operators/graph.pointer_jump_path_sum`` (pointer jumping carrying
    an additive accumulator, O(log depth) node-sized self-joins).

    Node values are data-derived: each user-node weighs its clamped event
    cents total (one keyed agg), so the rollup is a real fact-table
    reduction feeding a real recursion.  The round budget derives from
    the data exactly like `hierarchy_roots`.  The DuckDB oracle walks the
    recurrence step by step (recursive CTE), independently deriving what
    the doubling loop composes in log rounds.
    """
    import math

    from service_alerts_connector_spark.operators.graph import (
        pointer_jump_path_sum,
    )

    ev = _t(spark, sf_dir, "events")
    vals = ev.groupBy(F.col("user_id").alias("node")).agg(
        F.sum(
            F.greatest(
                F.floor(F.col("value") * 100).cast("long"),
                F.lit(0).cast("long"),
            )
        ).alias("value")
    )
    edges = vals.select(
        "node",
        F.when(F.col("node") >= 8, F.col("node") - 8)
        .otherwise(F.col("node"))
        .alias("parent"),
        "value",
    )
    # r16: round budget from the parquet FOOTER max(user_id) statistic
    # (zero-job upper bound — looser only adds provable no-op rounds) and
    # without the former +1 slack round; proof at q_hierarchy_roots
    from service_alerts_connector_spark.catalog import _col_max_upper_bound

    max_node = (
        _col_max_upper_bound(spark, f"{sf_dir}/events.parquet", "user_id")
        or 0
    )
    depth = max(1, max_node // 8)
    iters = max(1, math.ceil(math.log2(depth)))
    # no final orderBy: node-sized output, order-insensitive gate
    # (guide §2.4 — the sort was a rangepartitioning Exchange + Sort)
    return pointer_jump_path_sum(
        edges, "node", "parent", "value", iterations=iters
    )


SQL_ANCESTOR_PATH_SUM = """
WITH RECURSIVE vals AS (
  SELECT user_id AS node,
         sum(greatest(CAST(floor(value * 100) AS BIGINT), 0)) AS value
  FROM events GROUP BY user_id
), edges AS (
  SELECT node,
         CASE WHEN node >= 8 THEN node - 8 ELSE node END AS parent,
         value
  FROM vals
), walk AS (
  SELECT node, node AS cur, value AS s, 0 AS d FROM edges
  UNION ALL
  SELECT w.node, e.parent, w.s + p.value, w.d + 1
  FROM walk w
  JOIN edges e ON e.node = w.cur
  JOIN edges p ON p.node = e.parent
  WHERE e.parent <> e.node
)
SELECT node,
       arg_max(cur, d) AS root_id,
       CAST(max(d) AS BIGINT) AS depth,
       CAST(arg_max(s, d) AS BIGINT) AS path_sum,
       TRUE AS converged
FROM walk
GROUP BY node
ORDER BY node
"""


# ---------------------------------------------------------------------------
# Winsorized mean — robust mean via histogram-rank bounds
# ---------------------------------------------------------------------------
def q_winsorized_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-nation average order value: winsorize at the exact p5
    and p95 LOWER order statistics (clamp, don't drop), then an exact
    integer mean — the outlier-resistant KPI that plain AVG is not,
    without the engine-divergent float percentile.

    Third instance of the round-7 histogram-rank pattern: the bounds are
    the smallest cents whose per-nation running count reaches rank
    greatest(1, (k*(n+1)) div 100) for k in {5, 95}; a 25-row broadcast
    join-back clamps every order and one aggregation emits the
    winsorized mean in exact micro-cents ((sum*1e6) div n on non-negative
    integers — Spark `div` ≡ DuckDB `//`).
    """
    rev = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("o_custkey"), "c_nationkey"
                )
            ),
            "o_custkey",
        )
        .select(
            F.col("c_nationkey").alias("nation"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    # the histogram cells feed BOTH the bound pipeline and the clamp-mean
    # (value-determined: Σ wcents over rows = Σ cnt·clamp(cents) over
    # cells) — pin one evaluation so the fact scan + dim join + histogram
    # shuffle run once (r15, guide §1.2; same cells-reuse as
    # boxplot_stats / range_partition_plan)
    cells = (
        rev.groupBy("nation", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    w_nation = Window.partitionBy("nation")
    w_cum = w_nation.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = cells.select(
        "nation",
        "cents",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_nation).alias("ntot"),
    )
    pick = lambda k: F.min(
        F.when(
            F.col("cum")
            >= F.greatest(
                F.lit(1).cast("long"), F.expr(f"({k} * (ntot + 1)) div 100")
            ),
            F.col("cents"),
        )
    )
    bounds = ranked.groupBy("nation").agg(
        F.max("ntot").alias("n"),
        pick(5).alias("p5_c"),
        pick(95).alias("p95_c"),
    )
    return (
        cells.join(F.broadcast(bounds), "nation")
        .select(
            "nation",
            "n",
            "p5_c",
            "p95_c",
            "cnt",
            F.greatest(
                F.col("p5_c"), F.least(F.col("p95_c"), F.col("cents"))
            ).alias("wcents"),
        )
        .groupBy("nation")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("p5_c").cast("long").alias("p5_c"),
            F.max("p95_c").cast("long").alias("p95_c"),
            # Σ over rows of clamp(cents) ≡ Σ over cells of cnt·clamp —
            # exact integer identity, same 2^63 headroom as the row sum
            F.expr("(sum(wcents * cnt) * 1000000) div max(n)")
            .cast("long")
            .alias("wmean_micro"),
        )
        .orderBy("nation")
    )


SQL_WINSORIZED_MEAN_VALUE = """
WITH rev AS (
  SELECT c.c_nationkey AS nation,
         CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), cells AS (
  SELECT nation, cents, count(*) AS cnt FROM rev GROUP BY nation, cents
), ranked AS (
  SELECT nation, cents,
         sum(cnt) OVER (PARTITION BY nation ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY nation) AS ntot
  FROM cells
), bounds AS (
  SELECT nation, max(ntot) AS n,
         min(CASE WHEN cum >= greatest(1, (5 * (ntot + 1)) // 100)
                  THEN cents END) AS p5_c,
         min(CASE WHEN cum >= greatest(1, (95 * (ntot + 1)) // 100)
                  THEN cents END) AS p95_c
  FROM ranked GROUP BY nation
)
SELECT r.nation,
       CAST(max(b.n) AS BIGINT) AS n,
       CAST(max(b.p5_c) AS BIGINT) AS p5_c,
       CAST(max(b.p95_c) AS BIGINT) AS p95_c,
       CAST((sum(greatest(b.p5_c, least(b.p95_c, r.cents))) * 1000000)
            // max(b.n) AS BIGINT) AS wmean_micro
FROM rev r JOIN bounds b ON b.nation = r.nation
GROUP BY r.nation
ORDER BY r.nation
"""


ROUND7_QUERIES = {
    "clamped_running_balance": q_clamped_running_balance,
    "cusum_changepoint": q_cusum_changepoint,
    "seasonal_dow_profile": q_seasonal_dow_profile,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "weighted_median_price": q_weighted_median_price,
    "scd2_temporal_join": q_scd2_temporal_join,
    "delta_join_ivm": q_delta_join_ivm,
    "ancestor_path_sum": q_ancestor_path_sum,
    "winsorized_mean_value": q_winsorized_mean_value,
}

ROUND7_ORACLES = {
    "clamped_running_balance": SQL_CLAMPED_RUNNING_BALANCE,
    "cusum_changepoint": SQL_CUSUM_CHANGEPOINT,
    "seasonal_dow_profile": SQL_SEASONAL_DOW_PROFILE,
    "cheapest_supplier_per_part": SQL_CHEAPEST_SUPPLIER_PER_PART,
    "weighted_median_price": SQL_WEIGHTED_MEDIAN_PRICE,
    "scd2_temporal_join": SQL_SCD2_TEMPORAL_JOIN,
    "delta_join_ivm": SQL_DELTA_JOIN_IVM,
    "ancestor_path_sum": SQL_ANCESTOR_PATH_SUM,
    "winsorized_mean_value": SQL_WINSORIZED_MEAN_VALUE,
}
