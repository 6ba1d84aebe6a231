"""Catalog — general analytics surface beyond the reference's minimal
aggregate/window usage: multi-level aggregates (ROLLUP), distinct
aggregation, lead/lag/rank windows, exact percentiles.  The reference needs
none of these (SURVEY §2.4/§2.5 note their absence), but an engine claiming
its serving role must offer the standard analytic toolbox; each query is
DuckDB-oracle-verified like the core set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _t


# ---------------------------------------------------------------------------
# ROLLUP — subtotals + grand total in one pass
# ---------------------------------------------------------------------------
def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0).alias(
                "sum_qty"
            ),
        )
    )


SQL_ROLLUP = """
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       count(*) AS n,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Distinct aggregation
# ---------------------------------------------------------------------------
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_DISTINCT = """
SELECT l_returnflag AS returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Lead/lag + rank windows — inter-event gaps per user
# ---------------------------------------------------------------------------
def q_lag_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "gap_s",
            F.col("ts").cast("long") - F.col("prev_ts").cast("long"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("event_id") % 10 == 0)
        .select(
            F.col("event_id").alias("id"),
            F.col("user_id").alias("uid"),
            "gap_s",
            "rn",
        )
    )


SQL_LAG_RANK = """
SELECT event_id AS id, user_id AS uid,
       CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) AS gap_s,
       rn
FROM (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE event_id % 10 = 0
"""


# ---------------------------------------------------------------------------
# Exact percentiles
# ---------------------------------------------------------------------------
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


SQL_PERCENTILES = """
SELECT o_orderstatus AS status,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Frame-spec window — running (cumulative) totals per key
# ---------------------------------------------------------------------------
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn(
            "running_cents",
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w),
        )
        .where(F.col("event_id") % 25 == 0)
        .select(
            F.col("event_id").alias("id"),
            F.col("user_id").alias("uid"),
            (F.col("running_cents") / 100.0).alias("running_value"),
        )
    )


SQL_RUNNING = """
SELECT event_id AS id, user_id AS uid,
       running_cents / 100.0 AS running_value
FROM (
  SELECT event_id, user_id,
         sum(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running_cents
  FROM events
)
WHERE event_id % 25 = 0
"""


# ---------------------------------------------------------------------------
# Pivot — status counts per priority as columns
# ---------------------------------------------------------------------------
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )


SQL_PIVOT = """
SELECT o_orderpriority AS priority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# CUBE + grouping id — all grouping combinations, subtotal-nulls
# disambiguated from data-nulls via GROUPING()
# ---------------------------------------------------------------------------
def q_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .withColumnsRenamed(
            {"l_returnflag": "returnflag", "l_linestatus": "linestatus"}
        )
    )


SQL_CUBE = """
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       count(*) AS n,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum sample (50 orders per o_orderstatus) with
    content-hash ordering — deterministic membership any engine
    reproduces, unlike seeded RNG streams."""
    from service_alerts_connector_spark.operators.topk import (
        stratified_sample_exact,
    )

    orders = _t(spark, sf_dir, "orders")
    out = stratified_sample_exact(
        orders,
        ["o_orderstatus"],
        50,
        F.md5(F.col("o_orderkey").cast("string").cast("binary")),
    )
    return out.select("o_orderstatus", "o_orderkey").orderBy(
        "o_orderstatus", "o_orderkey"
    )


SQL_STRATIFIED = """
WITH ranked AS (
  SELECT o_orderstatus, o_orderkey,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY md5(CAST(o_orderkey AS VARCHAR)) ASC
         ) AS rn
  FROM orders
)
SELECT o_orderstatus, o_orderkey FROM ranked
WHERE rn <= 50
ORDER BY o_orderstatus, o_orderkey
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream (30-min inactivity
    gap), rolled up per session.  Timestamps surface as formatted strings
    and gaps compare floored epoch seconds (catalog determinism rules)."""
    from service_alerts_connector_spark.operators.sessions import sessionize

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, gap_s=1800)
    return (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
        )
        .orderBy("user_id", "session_idx")
    )


SQL_SESSIONIZE = """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), sessed AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sessed GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# KMV distinct sketch — portable deterministic cardinality estimate
# ---------------------------------------------------------------------------
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct-count estimate of l_partkey per return
    flag (k=64), next to the exact count so the estimate is auditable.
    md5-derived, so DuckDB reproduces the identical estimate — unlike
    HLL-based approx_count_distinct (engine-specific by construction).

    Uses the salted two-phase path (``salt_buckets=64``) so the benched
    plan IS the 100 TB plan: the per-group sort never sees more than
    salt_buckets × k rows however hot the group, because phase 1 keeps
    the k smallest per (group, salt) and the global k smallest are a
    subset of that union (exact prune, not an approximation — which is
    why the mirrored two-phase DuckDB oracle returns identical values).
    Pinned by tests/test_plan_shapes.py::test_kmv_salted_window_partitions.
    """
    from service_alerts_connector_spark.operators.sketches import kmv_distinct

    li = _t(spark, sf_dir, "lineitem")
    est = kmv_distinct(li, "l_partkey", ["l_returnflag"], k=64, salt_buckets=64)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return (
        est.join(exact, on="l_returnflag", how="inner")
        .select(
            F.col("l_returnflag").alias("returnflag"),
            "kmv_distinct",
            "exact_distinct",
        )
    )


SQL_KMV = """
WITH h AS (
  SELECT DISTINCT l_returnflag AS returnflag,
                  md5(CAST(l_partkey AS VARCHAR)) AS hh
  FROM lineitem
), p1 AS (
  -- mirror of the Spark salted phase 1: k smallest per (group, salt);
  -- an exact prune of the global k smallest, so the estimate is identical
  SELECT returnflag, hh FROM (
    SELECT returnflag, hh,
           row_number() OVER (
             PARTITION BY returnflag,
                          ('0x' || substr(hh, 25, 4))::BIGINT % 64
             ORDER BY hh
           ) AS rn1
    FROM h
  ) WHERE rn1 <= 64
), ranked AS (
  SELECT returnflag, hh,
         row_number() OVER (PARTITION BY returnflag ORDER BY hh) AS rn
  FROM p1
), topk AS (
  SELECT returnflag,
         count(*) AS n_le_k,
         max(CASE WHEN rn = 64 THEN hh END) AS kth
  FROM ranked WHERE rn <= 64 GROUP BY returnflag
), est AS (
  SELECT returnflag,
         CAST(CASE WHEN n_le_k < 64 THEN n_le_k
              ELSE floor(63.0 / ((('0x' || substr(kth, 1, 8))::BIGINT + 1)
                                 / 4294967296.0))
              END AS BIGINT) AS kmv_distinct
  FROM topk
)
SELECT e.returnflag, e.kmv_distinct, x.exact_distinct
FROM est e
JOIN (SELECT l_returnflag AS returnflag,
             count(DISTINCT l_partkey) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag) x USING (returnflag)
"""


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join semantics: '4-NOT SPECIFIED' priorities become
    NULL (the dirty-dimension pattern) and the label join uses Spark's
    ``eqNullSafe`` (``<=>``) ↔ DuckDB's ``IS NOT DISTINCT FROM`` — the
    NULL bucket matches the dim's NULL row instead of dropping, which a
    plain equi-join would silently do.

    Plan: the 6-row label dim broadcasts and ``<=>`` still plans a
    BroadcastHashJoin (null-safe equality is a hashable key in Catalyst);
    one map-side-combined groupBy(label) after it.
    """
    orders = _t(spark, sf_dir, "orders").withColumn(
        "prio", F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))
    )
    labels = spark.createDataFrame(
        [
            ("1-URGENT", "urgent"),
            ("2-HIGH", "high"),
            ("3-MEDIUM", "medium"),
            ("5-LOW", "low"),
            (None, "unspecified"),
        ],
        "prio_key string, label string",
    )
    return (
        orders.join(
            F.broadcast(labels),
            orders["prio"].eqNullSafe(labels["prio_key"]),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
        .orderBy("label")
    )


SQL_NULL_SAFE_JOIN = """
WITH orders_n AS (
  SELECT nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio, o_totalprice
  FROM orders
), labels(prio_key, label) AS (
  VALUES ('1-URGENT', 'urgent'), ('2-HIGH', 'high'), ('3-MEDIUM', 'medium'),
         ('5-LOW', 'low'), (NULL, 'unspecified')
)
SELECT label, count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders_n JOIN labels ON prio IS NOT DISTINCT FROM prio_key
GROUP BY label
ORDER BY label
"""


def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family window functions not exercised elsewhere in the
    catalog — percent_rank, cume_dist, ntile(4), running nth_value — over
    a fully tiebroken per-status order.

    Cross-engine determinism: the (cents, orderkey) order is total, so
    RANGE and ROWS frames coincide and ntile's remainder distribution is
    identical; percent_rank/cume_dist are single exactly-rounded IEEE
    divisions of small integers, re-encoded as floor(x*1e6) bigints per
    the catalog float rules.  One keyed window exchange; the output
    filter keeps 1/20 of rows but runs AFTER the windows (semantics) —
    at scale you'd push a key-range predicate instead.
    """
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("status").orderBy(F.asc("cents"), F.asc("o_orderkey"))
    return (
        orders.withColumn(
            "pr_micro",
            F.floor(F.percent_rank().over(w) * 1_000_000).cast("long"),
        )
        .withColumn(
            "cd_micro",
            F.floor(F.cume_dist().over(w) * 1_000_000).cast("long"),
        )
        .withColumn("quartile", F.ntile(4).over(w))
        .withColumn("third_key", F.nth_value("o_orderkey", 3).over(w))
        .where(F.col("o_orderkey") % 20 == 0)
        .select(
            "status", "o_orderkey", "cents",
            "pr_micro", "cd_micro", "quartile", "third_key",
        )
        .orderBy("status", "o_orderkey")
    )


SQL_WINDOW_RANK_SUITE = """
SELECT status, o_orderkey, cents, pr_micro, cd_micro, quartile, third_key
FROM (
  SELECT o_orderstatus AS status, o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_micro,
         CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_micro,
         ntile(4) OVER w AS quartile,
         nth_value(o_orderkey, 3) OVER w AS third_key
  FROM orders
  WINDOW w AS (PARTITION BY o_orderstatus
               ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT), o_orderkey)
)
WHERE o_orderkey % 20 = 0
ORDER BY status, o_orderkey
"""


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from bottom-k (KMV) set synopses — the
    planner primitive that prices a join BEFORE running it: estimate the
    overlap of distinct 1996-order customers with distinct 2000-order
    customers from two 256-hash synopses, with the exact intersection
    beside it for the audit.

    Scale story: each synopsis build is distinct → TakeOrderedAndProject
    (per-partition partial bottom-k, never a global sort or unpartitioned
    window); everything after the two builds — merge, membership flags,
    estimator — touches ≤ 2k rows.  The estimator arithmetic is staged
    non-negative integer floor division (Spark ``div`` ≡ DuckDB ``//`` on
    non-negatives), so the oracle reproduces it bit-for-bit.
    """
    from service_alerts_connector_spark.operators.sketches import (
        kmv_set_overlap,
        kmv_synopsis,
    )

    orders = _t(spark, sf_dir, "orders")
    a = orders.where(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-01-01 00:00:00")
    ).select("o_custkey")
    b = orders.where(
        (F.col("o_orderdate") >= "2000-01-01 00:00:00")
        & (F.col("o_orderdate") < "2001-01-01 00:00:00")
    ).select("o_custkey")
    est = kmv_set_overlap(
        kmv_synopsis(a, "o_custkey", k=256),
        kmv_synopsis(b, "o_custkey", k=256),
        k=256,
    )
    exact = (
        a.distinct()
        .join(b.distinct(), "o_custkey", "left_semi")
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    return est.crossJoin(F.broadcast(exact))


SQL_JOIN_SIZE_ESTIMATE = """
WITH a AS (
  SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
), b AS (
  SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
), sa AS (SELECT h FROM a ORDER BY h LIMIT 256),
sb AS (SELECT h FROM b ORDER BY h LIMIT 256),
m AS (
  SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
  ORDER BY h LIMIT 256
), f AS (
  SELECT count(*) AS n_merged,
         CAST(sum(CASE WHEN h IN (SELECT h FROM sa)
                   AND h IN (SELECT h FROM sb) THEN 1 ELSE 0 END)
              AS BIGINT) AS c_common,
         ('0x' || substr(max(h), 1, 8))::BIGINT AS v
  FROM m
), e AS (
  SELECT 256 AS k, n_merged, c_common,
         CASE WHEN n_merged < 256 THEN n_merged
              ELSE (255 * 4294967296) // (v + 1) END AS union_est
  FROM f
), x AS (
  SELECT count(*) AS exact_intersect FROM (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
  )
)
SELECT k, n_merged, c_common, union_est,
       CAST(CASE WHEN n_merged < 256 THEN c_common
            ELSE (c_common * union_est) // 256 END AS BIGINT) AS intersect_est,
       exact_intersect
FROM e, x
"""


# ---------------------------------------------------------------------------
# Deterministic hash split — reproducible train/val/test assignment
# ---------------------------------------------------------------------------
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document split assignment (80/10/10) as a pure md5 function of
    the id: stable under repartitioning, appends, and engine choice, plus
    the per-split size rollup."""
    from service_alerts_connector_spark.operators.sketches import hash_split

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    assigned = hash_split(docs, "doc_id")
    counts = assigned.groupBy("split").agg(F.count(F.lit(1)).alias("split_n"))
    return assigned.join(counts, on="split", how="inner").select(
        "doc_id", "split", "split_n"
    )


def _sql_hash_split() -> str:
    from service_alerts_connector_spark.operators.sketches import (
        hash_split_sql,
    )

    expr = hash_split_sql("doc_id")
    return f"""
WITH assigned AS (
  SELECT doc_id, {expr} AS split FROM documents
), counts AS (
  SELECT split, count(*) AS split_n FROM assigned GROUP BY split
)
SELECT a.doc_id, a.split, c.split_n
FROM assigned a JOIN counts c USING (split)
"""


# ---------------------------------------------------------------------------
# Range-frame rolling aggregate — trailing 1-hour sum per user
# ---------------------------------------------------------------------------
def q_rolling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour event-value sum per user (RANGE frame over floored
    epoch seconds — time-based, not row-based, so gaps behave correctly).
    Values sum in integer cents (catalog money rule).  One exchange on the
    user key; the range frame is a streaming scan within each partition."""
    ev = _t(spark, sf_dir, "events")
    based = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_s"))
        .rangeBetween(-3600, 0)
    )
    return based.select(
        "event_id",
        "user_id",
        "ts_s",
        F.sum("cents").over(w).alias("trailing_1h_cents"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


SQL_ROLLING = """
WITH based AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts_s,
       CAST(sum(cents) OVER w AS BIGINT) AS trailing_1h_cents,
       count(*) OVER w AS trailing_1h_events
FROM based
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts_s
  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
)
"""


# ---------------------------------------------------------------------------
# GROUPING SETS — chosen aggregation levels in one pass
# ---------------------------------------------------------------------------
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly the (returnflag, status), (returnflag), and () levels — no
    cube blow-up — via SQL GROUPING SETS (one Expand, one shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               count(*) AS n,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_cents
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       count(*) AS n,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# ---------------------------------------------------------------------------
# Typed JSON extraction — events.props is a JSON string column
# ---------------------------------------------------------------------------
def q_json_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the semi-structured ``props`` column into a TYPED struct
    (from_json with an explicit schema — scan-speed JVM parsing, no UDF)
    and aggregate on the extracted field."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


SQL_JSON_TYPED = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Per-group linear trend — OLS slope from exact integer sums
# ---------------------------------------------------------------------------
def q_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of n_chars over doc_id per source, computed from
    EXACT bigint sums (Sx, Sy, Sxy, Sxx) in one aggregation — the closed
    form needs a single double division at the end, the same IEEE op in
    any engine, so the slope hash-matches at 6 dp without a tolerance.
    (Built-in regr_slope is avoided: its internal accumulation order is
    engine-specific.)"""
    docs = _t(spark, sf_dir, "documents")
    based = docs.select(
        "source",
        F.col("doc_id").cast("bigint").alias("x"),
        F.col("n_chars").cast("bigint").alias("y"),
    )
    agg = based.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    den = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    return agg.select(
        "source",
        "n",
        F.round(num.cast("double") / den.cast("double"), 6).alias("slope6"),
    )


SQL_LINEAR_TREND = """
WITH agg AS (
  SELECT source, count(*) AS n,
         sum(CAST(doc_id AS BIGINT)) AS sx,
         sum(CAST(n_chars AS BIGINT)) AS sy,
         sum(CAST(doc_id AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxy,
         sum(CAST(doc_id AS BIGINT) * CAST(doc_id AS BIGINT)) AS sxx
  FROM documents GROUP BY source
)
SELECT source, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope6
FROM agg
"""


# ---------------------------------------------------------------------------
# Z-order clustering key — write-time locality (Delta OPTIMIZE ZORDER analogue)
# ---------------------------------------------------------------------------
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (l_partkey, l_suppkey) — the clustering key
    ``operators/layout.py write_zordered`` sorts by; oracled as pure
    integer arithmetic (non-negative keys)."""
    from service_alerts_connector_spark.operators.layout import zorder_key

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key(F.col("l_partkey"), F.col("l_suppkey")).alias("zkey"),
    )


def _sql_zorder() -> str:
    from service_alerts_connector_spark.operators.layout import zorder_key_sql

    return f"""
SELECT l_orderkey, l_linenumber,
       {zorder_key_sql('l_partkey', 'l_suppkey')} AS zkey
FROM lineitem WHERE l_orderkey % 100 = 0
"""


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning — broadcast bitmap instead of a shuffle
# ---------------------------------------------------------------------------
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi-join: a 16 Kbit / k=3 filter built over the
    BUILDING-segment customer keys, probed by every order — per status,
    how many orders pass the filter, how many are true members, and the
    false-positive remainder (no false negatives, ever: n_true equals the
    exact semi-join count by construction).

    Scale story: the probe side is a zero-shuffle narrow pipeline (three
    chained broadcast joins against the ≤512-row bitmap + a scalar
    filter); only the ~KB bitmap moves.  At 100 TB this prunes the fact
    table BEFORE the expensive exact join — the DataFrame analogue of
    Spark's runtime-filter/DPP bloom pushdown, but engine-portable and
    differentially testable (md5 bit math reproduced by DuckDB).
    Pinned by tests/test_plan_shapes.py::test_bloom_probe_zero_shuffle.
    """
    from service_alerts_connector_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    m_bits, k = 1 << 14, 3
    keys = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    # NOT cached: Catalyst re-plans the tiny build per chained probe join,
    # but re-aggregating <=512 rows three times beats cache management for
    # a repeatedly-invoked query (each invocation would pin a fresh copy);
    # cache per the operator docstring only when the build side is big.
    # Round-5 A/B (sf0.1, local[32], alternating 4x4 runs): an eager
    # localCheckpoint of the bitmap measured 1.25 s vs 1.29 s best-warm —
    # a ~3% noise-level delta that doesn't buy the downside (eager
    # checkpointing runs a JOB at plan-construction time, breaking the
    # lazy entry()/plan-shape contract).  Decision: keep the re-aggregate.
    bloom = bloom_build(keys, "c_custkey", m_bits=m_bits, k=k)
    passed = bloom_probe(
        _t(spark, sf_dir, "orders"), bloom, "o_custkey", m_bits=m_bits, k=k
    )
    truth = keys.select(
        F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("_true")
    )
    return (
        passed.join(F.broadcast(truth), "o_custkey", "left")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_bloom_pass"),
            F.sum(F.coalesce(F.col("_true"), F.lit(0))).alias("n_true"),
            (
                F.count(F.lit(1))
                - F.sum(F.coalesce(F.col("_true"), F.lit(0)))
            ).alias("n_false_pos"),
        )
        .orderBy("status")
    )


SQL_BLOOM_SEMI_JOIN = """
WITH keys AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), cells AS (
  SELECT (('0x' || substr(md5('bf' || CAST(j.j AS VARCHAR) || ':'
            || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 16384) AS pos
  FROM keys, range(3) j(j)
), bloom AS (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
  FROM cells GROUP BY word
), probe AS (
  SELECT o.o_orderkey, o.o_orderstatus, o.o_custkey,
         (('0x' || substr(md5('bf' || CAST(j.j AS VARCHAR) || ':'
            || CAST(o.o_custkey AS VARCHAR)), 1, 8))::BIGINT % 16384) AS pos
  FROM orders o, range(3) j(j)
), verdicts AS (
  SELECT p.o_orderkey, p.o_orderstatus, p.o_custkey,
         min(CASE WHEN (coalesce(b.bits, 0)
                        & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INTEGER)))
                       <> 0
             THEN 1 ELSE 0 END) AS ok
  FROM probe p LEFT JOIN bloom b ON b.word = p.pos // 32
  GROUP BY p.o_orderkey, p.o_orderstatus, p.o_custkey
)
SELECT v.o_orderstatus AS status,
       count(*) AS n_bloom_pass,
       CAST(sum(CASE WHEN k.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true,
       CAST(count(*) - sum(CASE WHEN k.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM verdicts v
LEFT JOIN keys k ON k.c_custkey = v.o_custkey
WHERE v.ok = 1
GROUP BY v.o_orderstatus
ORDER BY status
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch — register-based, mergeable, portable
# ---------------------------------------------------------------------------
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type (m=256 registers,
    md5-derived) next to the exact count.  Complements `kmv_distinct`: HLL
    registers are fixed-size and merge by element-wise max (the shape a
    100 TB rollup tree wants — per-partition register pages OR-merge up the
    tree with no re-scan), where KMV keeps k hashes.  Raw estimate only;
    zero_registers column audits the regime (see hll_estimate docstring for
    why linear counting is deliberately left out: ln() is not
    exactly-rounded cross-engine).
    """
    from service_alerts_connector_spark.catalog import _events
    from service_alerts_connector_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = _events(spark, sf_dir)
    regs = hll_registers(ev, "user_id", ["event_type"])
    est = hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, on="event_type", how="inner").select(
        "event_type", "hll_estimate", "zero_registers", "exact_distinct"
    )


def _sql_hll() -> str:
    from service_alerts_connector_spark.operators.sketches import (
        HLL_BUCKET_HEX,
        HLL_M,
        HLL_NUMERATOR,
        HLL_TAIL_BITS,
    )

    tail_hex_len = HLL_TAIL_BITS // 4
    rho_max = HLL_TAIL_BITS + 1
    return f"""
WITH h AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hh FROM events
), mapped AS (
  SELECT event_type,
         ('0x' || substr(hh, 1, {HLL_BUCKET_HEX}))::BIGINT AS bucket,
         {rho_max} - (CASE WHEN ('0x' || substr(hh, {HLL_BUCKET_HEX + 1},
                                               {tail_hex_len}))::BIGINT = 0
                           THEN 0
                           ELSE length(bin(('0x' || substr(hh, {HLL_BUCKET_HEX + 1},
                                                           {tail_hex_len}))::BIGINT))
                      END) AS rho
  FROM h
), regs AS (
  SELECT event_type, bucket, max(rho) AS rho
  FROM mapped GROUP BY event_type, bucket
), agg AS (
  SELECT event_type,
         sum(1::BIGINT << ({rho_max} - rho)) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY event_type
), est AS (
  SELECT event_type,
         CAST(floor(CAST({HLL_NUMERATOR!r} AS DOUBLE) /
                    CAST(s_present + ({HLL_M} - n_present) *
                         (1::BIGINT << {rho_max}) AS DOUBLE)) AS BIGINT)
           AS hll_estimate,
         CAST({HLL_M} - n_present AS BIGINT) AS zero_registers
  FROM agg
)
SELECT e.event_type, e.hll_estimate, e.zero_registers, x.exact_distinct
FROM est e
JOIN (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type) x USING (event_type)
"""


# ---------------------------------------------------------------------------
# Skew-safe two-phase aggregation — hot-key groupBy without a hot reducer
# ---------------------------------------------------------------------------
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic for a join/aggregation column — the measurement
    that decides whether the salted-aggregate / AQE-skew-join mitigations
    are needed: the 10 heaviest l_partkey groups with their exact share of
    all rows (micro units — share_micro = count·1e6 div total, staged
    non-negative integer division), beside the distinct-key count and the
    max/avg group-size ratio (ratio_micro = max·1e6 div avg-as-fraction =
    max·keys·1e6 div total).

    One groupBy(key) shuffle (map-side combined) → TakeOrderedAndProject
    for the top-k; the totals ride along via a broadcast of the 1-row
    summary — no second scan of the fact table.
    """
    li = _t(spark, sf_dir, "lineitem")
    sizes = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    summary = sizes.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("max_rows"),
    )
    return (
        sizes.crossJoin(F.broadcast(summary))
        .select(
            "key",
            "n_rows",
            "total_rows",
            "n_keys",
            F.expr("n_rows * 1000000L div total_rows").alias("share_micro"),
            F.expr("max_rows * n_keys * 1000000L div total_rows").alias(
                "skew_ratio_micro"
            ),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(10)
    )


SQL_SKEW_REPORT = """
WITH sizes AS (
  SELECT l_partkey AS key, count(*) AS n_rows FROM lineitem GROUP BY l_partkey
), summary AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows, count(*) AS n_keys,
         max(n_rows) AS max_rows
  FROM sizes
)
SELECT key, n_rows, total_rows, n_keys,
       (n_rows * 1000000) // total_rows AS share_micro,
       (max_rows * n_keys * 1000000) // total_rows AS skew_ratio_micro
FROM sizes, summary
ORDER BY n_rows DESC, key ASC
LIMIT 10
"""


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event count + value total per event type via ``salted_aggregate``
    (operators/skew.py): phase 1 aggregates on (key, salt∈[0,16)), phase 2
    merges the ≤16 partials — so a key holding 30% of a 100 TB corpus
    spreads over 16 reducers instead of melting one.  The salt is
    ``rand``-derived (engine-private), but both aggregates are algebraic,
    so the merged result equals the plain GROUP BY the oracle runs — that
    equality IS the correctness claim.  Money in integer cents per the
    catalog determinism rules (double sums are order-sensitive)."""
    from service_alerts_connector_spark.catalog import _events
    from service_alerts_connector_spark.operators.skew import salted_aggregate

    ev = _events(spark, sf_dir).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    return salted_aggregate(
        ev,
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("value_cents")],
        [
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        ],
        salt_buckets=16,
    )


SQL_SKEW_SALTED = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Data-quality rule screen — N declarative rules, ONE scan
# ---------------------------------------------------------------------------
def q_dq_rule_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style ingest gate over lineitem: five rules (range, enum,
    cross-column comparison, null, warning-threshold) compiled into one
    conditional-sum aggregation — rule count never adds scans (see
    operators/quality.py).  The generalized form of the reference's
    point quality gates (drop-null Id/date, field coercions)."""
    from service_alerts_connector_spark.operators.quality import rule_screen

    li = _t(spark, sf_dir, "lineitem")
    rules = [
        ("qty_in_1_50", ~F.col("l_quantity").between(1, 50)),
        ("discount_in_0_10pct", ~F.col("l_discount").between(0.0, 0.10)),
        ("returnflag_enum", ~F.col("l_returnflag").isin("A", "N", "R")),
        ("price_below_qty", F.col("l_extendedprice") < F.col("l_quantity")),
        ("warn_high_discount", F.col("l_discount") > 0.05),
    ]
    return rule_screen(li, rules)


SQL_DQ_RULE_SCREEN = """
WITH agg AS (
  SELECT count(*) AS n,
    sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
              OR l_quantity IS NULL THEN 1 ELSE 0 END) AS v0,
    sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.10)
              OR l_discount IS NULL THEN 1 ELSE 0 END) AS v1,
    sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
              OR l_returnflag IS NULL THEN 1 ELSE 0 END) AS v2,
    sum(CASE WHEN l_extendedprice < l_quantity
              OR l_extendedprice IS NULL OR l_quantity IS NULL
             THEN 1 ELSE 0 END) AS v3,
    sum(CASE WHEN l_discount > 0.05
              OR l_discount IS NULL THEN 1 ELSE 0 END) AS v4
  FROM lineitem
)
SELECT r.rule_id, CAST(a.n AS BIGINT) AS n_checked,
       CAST(r.v AS BIGINT) AS n_violations, r.v = 0 AS pass
FROM agg a CROSS JOIN LATERAL (VALUES
  ('qty_in_1_50', a.v0),
  ('discount_in_0_10pct', a.v1),
  ('returnflag_enum', a.v2),
  ('price_below_qty', a.v3),
  ('warn_high_discount', a.v4)) AS r(rule_id, v)
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt — wide metric columns to long (metric, value) rows
# ---------------------------------------------------------------------------
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via the native ``DataFrame.unpivot`` (Spark ≥3.4
    Expand-based — one pass, no per-metric scans): per-returnflag metric
    triple (row count, quantity cents, price cents) melted to
    (returnflag, metric, value).  The API-surface counterpart of the
    expression-level ``stack`` used in `dq_rule_screen`; integer cents per
    the catalog money rules."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
    )
    return wide.unpivot(
        ["returnflag"],
        ["n_rows", "qty_cents", "price_cents"],
        "metric",
        "value",
    )


SQL_UNPIVOT = """
WITH wide AS (
  SELECT l_returnflag AS returnflag,
         count(*) AS n_rows,
         CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
  FROM lineitem GROUP BY l_returnflag
)
SELECT returnflag, 'n_rows' AS metric, CAST(n_rows AS BIGINT) AS value FROM wide
UNION ALL
SELECT returnflag, 'qty_cents', qty_cents FROM wide
UNION ALL
SELECT returnflag, 'price_cents', price_cents FROM wide
"""


# ---------------------------------------------------------------------------
# Classic TPC-H-shaped serving queries — multi-way join + agg patterns
# ---------------------------------------------------------------------------
# Revenue Σ price·(1−discount) is kept EXACT: price in cents (bigint) ×
# discount complement in basis points → c4 units (cents·10⁴); each product
# ≤1e11, 60 k-row sums ≪2^63 — no float accumulation order to disagree.
def _rev_c4() -> F.Column:
    # deferred Column build: module import must not require a live session
    return F.floor(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(10_000) - F.floor(F.col("l_discount") * 10_000).cast("long")
    )
_REV_C4_SQL = (
    "CAST(floor(l_extendedprice * 100) AS BIGINT)"
    " * (10000 - CAST(floor(l_discount * 10000) AS BIGINT))"
)


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (ref: the reference has no multi-way join serving
    tier; this is the standard OLAP pattern an engine must run): top-10
    open-order revenue for one market segment — two selective dim filters
    pushed to the scans, customer broadcast into orders, the o×l join
    AQE-decided, TakeOrderedAndProject for the top-k (never a global
    sort)."""
    cutoff = "1998-01-01 00:00:00"
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.sum(_rev_c4()).alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_Q3 = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority AS priority,
       CAST(sum({_REV_C4_SQL}) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, orderdate, priority
ORDER BY revenue_c4 DESC, l_orderkey ASC
LIMIT 10
"""


def q_q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue inside one region where the
    supplier and customer share the nation — a 6-table snowflake with the
    three dimension chains broadcast and only the fact tables shuffling."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dim = (
        nat.join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(dim), supp["s_nationkey"] == dim["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_rev_c4()).alias("revenue_c4"))
    )


SQL_Q5 = f"""
SELECT n_name AS nation, CAST(sum({_REV_C4_SQL}) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter — selective fact filters at the scans, dims broadcast, top-k
    via TakeOrderedAndProject with the custkey tiebreak."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_rev_c4()).alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = f"""
SELECT c_custkey, c_name, n_name AS nation,
       CAST(sum({_REV_C4_SQL}) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_c4 DESC, c_custkey ASC
LIMIT 20
"""



# ---------------------------------------------------------------------------
# Zone-map pruning — min/max file statistics and scan-skipping estimate
# ---------------------------------------------------------------------------
def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max file statistics) build + data-skipping estimate,
    contrasted across TWO physical layouts — the Delta/Iceberg/row-group
    pruning model as an explicit, auditable query.

    Layout ``insertion``: synthetic files of 4096 contiguous orderkeys
    (arrival order — ship dates are uncorrelated with orderkey, so every
    file's min/max spans the whole table and NOTHING can skip).  Layout
    ``clustered``: files keyed by ship month (the table re-clustered on
    the predicate column — interior months prove ``full``, the two
    boundary months are ``partial``, everything else ``skips``).  Per
    layout ONE narrow map-side-combinable aggregate builds the zone map
    (min/max/count per file — exactly the metadata a table format keeps),
    then a files-sized classify against a ship-date window predicate:
    ``skip`` (stats prove no row matches), ``full`` (stats prove every row
    matches — the scan can also drop the filter), ``partial`` (read +
    filter).

    The two output rows are the scan planner's verdict on why clustering
    matters at 100 TB: identical data, identical predicate, ~0 % vs ~80 %
    of bytes skipped.  Cross-engine determinism: integer ``div`` on
    non-negative orderkeys, ``year*12+month`` integer month keys, raw
    TIMESTAMP comparisons (no epoch arithmetic).
    """
    li = _t(spark, sf_dir, "lineitem")
    lo = F.lit("1997-03-15 00:00:00").cast("timestamp")
    hi = F.lit("1998-06-15 23:59:59").cast("timestamp")

    def layout_stats(file_col: F.Column, tag: str) -> DataFrame:
        zones = (
            li.withColumn("file_id", file_col)
            .groupBy("file_id")
            .agg(
                F.min("l_shipdate").alias("mn"),
                F.max("l_shipdate").alias("mx"),
                F.count(F.lit(1)).cast("long").alias("rows"),
            )
        )
        classified = zones.withColumn(
            "verdict",
            F.when((F.col("mx") < lo) | (F.col("mn") > hi), F.lit("skip"))
            .when((F.col("mn") >= lo) & (F.col("mx") <= hi), F.lit("full"))
            .otherwise(F.lit("partial")),
        )
        return classified.agg(
            F.lit(tag).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(F.col("verdict") == "skip", 1).otherwise(0))
            .cast("long")
            .alias("n_skip"),
            F.sum(F.when(F.col("verdict") == "full", 1).otherwise(0))
            .cast("long")
            .alias("n_full"),
            F.sum(F.when(F.col("verdict") == "partial", 1).otherwise(0))
            .cast("long")
            .alias("n_partial"),
            F.sum("rows").cast("long").alias("rows_total"),
            F.sum(
                F.when(F.col("verdict") == "skip", F.col("rows")).otherwise(0)
            )
            .cast("long")
            .alias("rows_skipped"),
            F.sum(
                F.when(F.col("verdict") == "partial", F.col("rows")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("rows_filter_scanned"),
        )

    insertion = layout_stats(F.expr("l_orderkey div 4096"), "insertion")
    clustered = layout_stats(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).cast("long"),
        "clustered",
    )
    return insertion.unionByName(clustered).orderBy("layout")


SQL_ZONE_MAP_PRUNE = """
WITH li AS (
  SELECT l_orderkey // 4096 AS file_ins,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
           AS file_clu,
         l_shipdate
  FROM lineitem
), zones AS (
  SELECT 'insertion' AS layout, file_ins AS file_id,
         min(l_shipdate) AS mn, max(l_shipdate) AS mx, count(*) AS rows
  FROM li GROUP BY file_id
  UNION ALL
  SELECT 'clustered' AS layout, file_clu AS file_id,
         min(l_shipdate) AS mn, max(l_shipdate) AS mx, count(*) AS rows
  FROM li GROUP BY file_id
), classified AS (
  SELECT layout, rows,
         CASE
           WHEN mx < TIMESTAMP '1997-03-15 00:00:00'
             OR mn > TIMESTAMP '1998-06-15 23:59:59' THEN 'skip'
           WHEN mn >= TIMESTAMP '1997-03-15 00:00:00'
            AND mx <= TIMESTAMP '1998-06-15 23:59:59' THEN 'full'
           ELSE 'partial'
         END AS verdict
  FROM zones
)
SELECT layout,
       count(*) AS n_files,
       CAST(sum(CASE WHEN verdict = 'skip' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_skip,
       CAST(sum(CASE WHEN verdict = 'full' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full,
       CAST(sum(CASE WHEN verdict = 'partial' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_partial,
       CAST(sum(rows) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN verdict = 'skip' THEN rows ELSE 0 END) AS BIGINT)
         AS rows_skipped,
       CAST(sum(CASE WHEN verdict = 'partial' THEN rows ELSE 0 END) AS BIGINT)
         AS rows_filter_scanned
FROM classified
GROUP BY layout
ORDER BY layout
"""


# ---------------------------------------------------------------------------
# Merkle-style table digest — anti-entropy replica comparison
# ---------------------------------------------------------------------------
def q_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-level XOR digest comparison of two table replicas — the
    anti-entropy / merkle-tree primitive for "which shards of a 100 TB
    replica drifted?" without ever shuffling raw rows between sites.

    Each row hashes to a 60-bit integer over its FULL content (key,
    status, price in cents); buckets of 8192 contiguous orderkeys fold
    rows into ``bit_xor`` digests (order-insensitive, mergeable — each
    replica computes its KB-sized digest table independently; only the
    digests travel).  Replica B is replica A with a deterministic fault
    injected (orderkeys ≡ 7 mod 1000 dropped — simulated loss), so the
    output pins both detection (count mismatch) and attribution (digest
    mismatch) per bucket.

    Scale shape: two map-side-combinable groupBys over narrow projections
    plus a broadcast-sized digest join.  Cross-engine exactness: md5-hex
    prefix → non-negative BIGINT (the bloom_semi_join idiom), bit_xor is
    bit-identical, cents via the shared floor rule.
    """
    orders = _t(spark, sf_dir, "orders")

    def digest(df: DataFrame, tag: str) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_orderstatus"),
                        F.floor(F.col("o_totalprice") * 100)
                        .cast("long")
                        .cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return (
            df.withColumn("bucket_id", F.expr("o_orderkey div 8192"))
            .withColumn("_h", h)
            .groupBy("bucket_id")
            .agg(
                F.bit_xor("_h").alias(f"digest_{tag}"),
                F.count(F.lit(1)).cast("long").alias(f"cnt_{tag}"),
            )
        )

    a = digest(orders, "a")
    b = digest(orders.where(F.col("o_orderkey") % 1000 != 7), "b")
    return (
        a.join(b, "bucket_id", "full_outer")
        .where(
            ~(
                F.col("digest_a").eqNullSafe(F.col("digest_b"))
                & F.col("cnt_a").eqNullSafe(F.col("cnt_b"))
            )
        )
        .select(
            "bucket_id",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
            (F.coalesce("cnt_a", F.lit(0)) - F.coalesce("cnt_b", F.lit(0)))
            .cast("long")
            .alias("rows_drifted"),
        )
        .orderBy("bucket_id")
    )


SQL_TABLE_DIGEST = """
WITH hashed AS (
  SELECT o_orderkey // 8192 AS bucket_id, o_orderkey,
         ('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|'
               || CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR)
           ), 1, 15))::BIGINT AS h
  FROM orders
), a AS (
  SELECT bucket_id, bit_xor(h) AS digest_a, count(*) AS cnt_a
  FROM hashed GROUP BY bucket_id
), b AS (
  SELECT bucket_id, bit_xor(h) AS digest_b, count(*) AS cnt_b
  FROM hashed WHERE o_orderkey % 1000 <> 7 GROUP BY bucket_id
)
SELECT coalesce(a.bucket_id, b.bucket_id) AS bucket_id,
       coalesce(cnt_a, 0) AS cnt_a,
       coalesce(cnt_b, 0) AS cnt_b,
       CAST(coalesce(cnt_a, 0) - coalesce(cnt_b, 0) AS BIGINT)
         AS rows_drifted
FROM a FULL OUTER JOIN b ON a.bucket_id = b.bucket_id
WHERE NOT (digest_a IS NOT DISTINCT FROM digest_b
           AND cnt_a IS NOT DISTINCT FROM cnt_b)
ORDER BY bucket_id
"""



# ---------------------------------------------------------------------------
# Bitmap-index intersection — set algebra on packed user bitmaps
# ---------------------------------------------------------------------------
def q_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set algebra: pack each event type's user set into
    32-bit words (word = user div 32, bit = user mod 32, OR-folded per
    word), then answer "users who did A and B / A or B / A but not B"
    with bitwise ops on word-aligned bitmaps — the roaring-bitmap /
    OLAP-bitmap-index pattern that replaces a users×types semi-join
    cascade with KB-sized bitmap algebra.

    Scale shape: ONE map-side-combinable groupBy (type, word) builds every
    bitmap in a single event scan (shuffle carries ≤ types × users/32
    words); the intersection is a word equi-join of two bitmap slices and
    a bit_count sum — cardinality of any boolean combination without
    touching events again.  Exactly how ClickHouse/Druid/Pinot answer
    segment-membership counts at 100 TB.

    Cross-engine: << on BIGINT, bit_or aggregate, bit_count — all
    bit-identical; bits stay in the low 32 of a 64-bit word so sign never
    enters.  Output: one row with exact distinct-user cardinalities for
    click, purchase, and their AND/OR/ANDNOT combinations.
    """
    ev = _t(spark, sf_dir, "events")
    # time-sliced segments keep the sets partial (every user eventually
    # does everything in the synthetic stream): segment A = day-1 clickers,
    # segment B = first-48h purchasers
    sliced = ev.where(
        (
            (F.col("event_type") == "click")
            & (F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        )
        | (
            (F.col("event_type") == "purchase")
            & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
        )
    )
    words = (
        sliced
        .select(
            "event_type",
            F.expr("user_id div 32").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    a = words.where(F.col("event_type") == "click").select(
        "word", F.col("bits").alias("bits_a")
    )
    b = words.where(F.col("event_type") == "purchase").select(
        "word", F.col("bits").alias("bits_b")
    )
    joined = a.join(b, "word", "full_outer").select(
        F.coalesce("bits_a", F.lit(0)).alias("ba"),
        F.coalesce("bits_b", F.lit(0)).alias("bb"),
    )
    return joined.agg(
        F.sum(F.bit_count(F.col("ba"))).cast("long").alias("n_click"),
        F.sum(F.bit_count(F.col("bb"))).cast("long").alias("n_purchase"),
        F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))))
        .cast("long")
        .alias("n_both"),
        F.sum(F.bit_count(F.col("ba").bitwiseOR(F.col("bb"))))
        .cast("long")
        .alias("n_either"),
        F.sum(F.bit_count(F.expr("ba & ~bb")))
        .cast("long")
        .alias("n_click_only"),
    )


SQL_BITMAP_INTERSECT = """
WITH words AS (
  SELECT event_type, user_id // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS bits
  FROM events
  WHERE (event_type = 'click' AND ts < TIMESTAMP '2024-01-02 00:00:00')
     OR (event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03 00:00:00')
  GROUP BY event_type, word
), a AS (
  SELECT word, bits AS bits_a FROM words WHERE event_type = 'click'
), b AS (
  SELECT word, bits AS bits_b FROM words WHERE event_type = 'purchase'
), joined AS (
  SELECT coalesce(bits_a, 0) AS ba, coalesce(bits_b, 0) AS bb
  FROM a FULL OUTER JOIN b ON a.word = b.word
)
SELECT CAST(sum(bit_count(ba)) AS BIGINT) AS n_click,
       CAST(sum(bit_count(bb)) AS BIGINT) AS n_purchase,
       CAST(sum(bit_count(ba & bb)) AS BIGINT) AS n_both,
       CAST(sum(bit_count(ba | bb)) AS BIGINT) AS n_either,
       CAST(sum(bit_count(ba & ~bb)) AS BIGINT) AS n_click_only
FROM joined
"""



# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit — privacy screening for released data
# ---------------------------------------------------------------------------
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit of an event release keyed on quasi-identifiers —
    the aggregate-level complement to row-level PII redaction
    (``text_pii_redact``): before a 100 TB behavioral dataset ships to a
    training pipeline, every quasi-identifier combination must cover
    enough distinct people (k-anonymity) with enough spread in the
    sensitive attribute (l-diversity), or those rows re-identify.

    Quasi-identifier = (event_type, day, value decile-band); sensitive
    attribute = user_id.  ONE map-side-combinable groupBy computes each
    equivalence class's row count and distinct-user count (= both k and
    l here, making the two metrics distinct: a class can have many ROWS
    but one USER — k-anonymous by row count yet fully identifying);
    a class-sized rollup then reports the audit verdict: minimum k,
    minimum l, classes and rows below threshold 5.

    Scale shape: the class groupBy is the only event-sized shuffle
    (count_distinct adds its partial pass); the verdict agg runs on the
    class table.  Decile band via exact integer floor(value*10) div 10 —
    cross-engine floor on non-negative doubles.
    """
    ev = _t(spark, sf_dir, "events")
    classes = (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.floor(
                F.least(F.abs(F.coalesce(F.col("value"), F.lit(0.0))), F.lit(99.0))
                / 10.0
            )
            .cast("long")
            .alias("value_band"),
            "user_id",
        )
        .groupBy("event_type", "day", "value_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("n_users").cast("long").alias("k_min"),
        F.sum(F.when(F.col("n_users") < 5, 1).otherwise(0))
        .cast("long")
        .alias("classes_below_k5"),
        F.sum(F.when(F.col("n_users") < 5, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.sum(F.when(F.col("n_users") == 1, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_identifying"),
        F.sum("n_rows").cast("long").alias("rows_total"),
    )


SQL_K_ANONYMITY = """
WITH classes AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(least(abs(coalesce(value, 0.0)), 99.0) / 10.0) AS BIGINT)
           AS value_band,
         count(*) AS n_rows,
         count(DISTINCT user_id) AS n_users
  FROM events
  GROUP BY event_type, day, value_band
)
SELECT count(*) AS n_classes,
       CAST(min(n_users) AS BIGINT) AS k_min,
       CAST(sum(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k5,
       CAST(sum(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       CAST(sum(CASE WHEN n_users = 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_identifying,
       CAST(sum(n_rows) AS BIGINT) AS rows_total
FROM classes
"""



# ---------------------------------------------------------------------------
# Benford first-digit audit — large-scale numeric forensics
# ---------------------------------------------------------------------------
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic forensic screen for fabricated or truncated numeric
    columns, run as ONE map-side-combinable digit groupBy however large
    the fact table.

    The first digit comes from string arithmetic (``substring(cast(floor
    (x) as string), 1, 1)`` on positive totals — no log10, whose last-ulp
    behaviour differs per libm); expected Benford shares are pinned
    integer micro-constants (301030 ppm for digit 1, …), so the deviation
    column is exact integer arithmetic: observed_ppm = n·10⁶ div total,
    delta_ppm = observed − expected.  A fabricated-uniform column would
    show ~111111 ppm per digit — the |delta| column localizes it.

    Output: one row per digit 1-9 with counts, observed/expected ppm,
    and signed delta.
    """
    benford_ppm = [
        301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
    ]
    li = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digits = li.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").alias("_total"))
    expected = F.element_at(
        F.array(*[F.lit(v) for v in benford_ppm]), F.col("digit").cast("int")
    ).cast("long")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000) div _total").alias("observed_ppm"),
            expected.alias("benford_ppm"),
            (
                F.expr("(n * 1000000) div _total") - expected
            ).alias("delta_ppm"),
        )
        .orderBy("digit")
    )


SQL_BENFORD_AUDIT = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
), counts AS (
  SELECT digit, count(*) AS n FROM digits GROUP BY digit
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS t FROM counts
), exp AS (
  SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
                        (5, 79181), (6, 66947), (7, 57992), (8, 51153),
                        (9, 45757)) e(digit, benford_ppm)
)
SELECT c.digit, c.n,
       (c.n * 1000000) // t.t AS observed_ppm,
       CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
       (c.n * 1000000) // t.t - e.benford_ppm AS delta_ppm
FROM counts c, tot t
JOIN exp e ON e.digit = c.digit
ORDER BY c.digit
"""


# ---------------------------------------------------------------------------
# Sequence integrity audit — missing-key islands without a global window
# ---------------------------------------------------------------------------
def q_seq_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity audit of a supposedly-dense key sequence (order keys):
    how many ids are missing, and how fragmented is the coverage — the
    ingestion-completeness check every CDC/replay pipeline runs.

    The naive islands query is a global row_number window (one task sorts
    everything); here both island and gap counts come from O(n) equi-
    anti-joins on shifted keys: an ISLAND starts at every key k whose
    predecessor k-1 is absent, and a GAP starts at every key k whose
    successor k+1 is absent (except the max).  One scalar row aggregates:
    span, present, missing, islands (= gap count + 1 on a fragmented
    range), plus the largest key.  All shuffles are key equi-joins;
    nothing sorts globally.
    """
    keys = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    pred = keys.select((F.col("k") + 1).alias("k"))
    island_starts = keys.join(pred, "k", "left_anti")
    bounds = keys.agg(
        F.min("k").alias("kmin"),
        F.max("k").alias("kmax"),
        F.count(F.lit(1)).alias("present"),
    )
    n_islands = island_starts.agg(
        F.count(F.lit(1)).cast("long").alias("n_islands")
    )
    return (
        bounds.crossJoin(F.broadcast(n_islands))
        .select(
            F.col("kmin").cast("long").alias("key_min"),
            F.col("kmax").cast("long").alias("key_max"),
            F.col("present").cast("long").alias("n_present"),
            (F.col("kmax") - F.col("kmin") + 1 - F.col("present"))
            .cast("long")
            .alias("n_missing"),
            F.col("n_islands"),
        )
    )


SQL_SEQ_GAP_AUDIT = """
WITH keys AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'
), island_starts AS (
  SELECT k FROM keys
  WHERE k - 1 NOT IN (SELECT k FROM keys)
)
SELECT min(k) AS key_min, max(k) AS key_max,
       count(*) AS n_present,
       max(k) - min(k) + 1 - count(*) AS n_missing,
       (SELECT count(*) FROM island_starts) AS n_islands
FROM keys
"""



# ---------------------------------------------------------------------------
# Joinability profiling — FK-candidate containment discovery
# ---------------------------------------------------------------------------
def q_join_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joinability profile of candidate key pairs — the data-catalog
    discovery primitive ("which columns join, and in which direction?"):
    for each candidate (fact column, dimension column) pair report
    distinct cardinalities, the shared-value count, and directional
    containment in exact ppm.

    Containment ≈ 10⁶ on the fact side with a smaller distinct count is
    the FK signature; symmetric high containment flags mirrored tables;
    low both ways kills the candidate.  Per pair: two distinct
    aggregations + one semi-join count — at 100 TB the distincts are the
    only fact-sized shuffles, and real profilers swap them for the KMV
    synopses (`join_size_estimate`) when even that is too hot; this is
    the exact tier run on the survivors.

    Cross-engine: counts are exact bigints; ppm via non-negative integer
    div.  Output: one row per candidate pair, ordered by pair name.
    """

    def profile(pair: str, a, b) -> DataFrame:
        da = a.distinct()
        db = b.distinct()
        shared = da.join(db, da["k"] == db["k2"], "left_semi")
        na = da.agg(F.count(F.lit(1)).alias("n_a"))
        nb = db.agg(F.count(F.lit(1)).alias("n_b"))
        ns = shared.agg(F.count(F.lit(1)).alias("n_shared"))
        return (
            na.crossJoin(F.broadcast(nb))
            .crossJoin(F.broadcast(ns))
            .select(
                F.lit(pair).alias("pair"),
                F.col("n_a").cast("long").alias("n_distinct_fact"),
                F.col("n_b").cast("long").alias("n_distinct_dim"),
                F.col("n_shared").cast("long").alias("n_shared"),
                F.expr("(n_shared * 1000000) div n_a").alias(
                    "fact_in_dim_ppm"
                ),
                F.expr("(n_shared * 1000000) div n_b").alias(
                    "dim_in_fact_ppm"
                ),
            )
        )

    li = _t(spark, sf_dir, "lineitem")
    pairs = [
        profile(
            "lineitem.l_partkey->part.p_partkey",
            li.select(F.col("l_partkey").alias("k")),
            _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("k2")),
        ),
        profile(
            "lineitem.l_suppkey->supplier.s_suppkey",
            li.select(F.col("l_suppkey").alias("k")),
            _t(spark, sf_dir, "supplier").select(
                F.col("s_suppkey").alias("k2")
            ),
        ),
        profile(
            # deliberately bad candidate: keys collide numerically but the
            # asymmetric containment (low fact-side, total dim-side) is
            # exactly the signature that kills it in triage
            "lineitem.l_partkey->supplier.s_suppkey",
            li.select(F.col("l_partkey").alias("k")),
            _t(spark, sf_dir, "supplier").select(
                F.col("s_suppkey").alias("k2")
            ),
        ),
        profile(
            "orders.o_custkey->customer.c_custkey",
            _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")),
            _t(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("k2")
            ),
        ),
    ]
    out = pairs[0]
    for x in pairs[1:]:
        out = out.unionByName(x)
    return out.orderBy("pair")


SQL_JOIN_PROFILE = """
WITH p1 AS (
  SELECT 'lineitem.l_partkey->part.p_partkey' AS pair,
         (SELECT count(DISTINCT l_partkey) FROM lineitem) AS n_a,
         (SELECT count(DISTINCT p_partkey) FROM part) AS n_b,
         (SELECT count(*) FROM (SELECT DISTINCT l_partkey FROM lineitem) f
           WHERE f.l_partkey IN (SELECT p_partkey FROM part)) AS n_shared
), p2 AS (
  SELECT 'lineitem.l_suppkey->supplier.s_suppkey' AS pair,
         (SELECT count(DISTINCT l_suppkey) FROM lineitem) AS n_a,
         (SELECT count(DISTINCT s_suppkey) FROM supplier) AS n_b,
         (SELECT count(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem) f
           WHERE f.l_suppkey IN (SELECT s_suppkey FROM supplier)) AS n_shared
), p4 AS (
  SELECT 'lineitem.l_partkey->supplier.s_suppkey' AS pair,
         (SELECT count(DISTINCT l_partkey) FROM lineitem) AS n_a,
         (SELECT count(DISTINCT s_suppkey) FROM supplier) AS n_b,
         (SELECT count(*) FROM (SELECT DISTINCT l_partkey FROM lineitem) f
           WHERE f.l_partkey IN (SELECT s_suppkey FROM supplier)) AS n_shared
), p3 AS (
  SELECT 'orders.o_custkey->customer.c_custkey' AS pair,
         (SELECT count(DISTINCT o_custkey) FROM orders) AS n_a,
         (SELECT count(DISTINCT c_custkey) FROM customer) AS n_b,
         (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders) f
           WHERE f.o_custkey IN (SELECT c_custkey FROM customer)) AS n_shared
), u AS (
  SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3
  UNION ALL SELECT * FROM p4
)
SELECT pair,
       CAST(n_a AS BIGINT) AS n_distinct_fact,
       CAST(n_b AS BIGINT) AS n_distinct_dim,
       CAST(n_shared AS BIGINT) AS n_shared,
       (n_shared * 1000000) // n_a AS fact_in_dim_ppm,
       (n_shared * 1000000) // n_b AS dim_in_fact_ppm
FROM u
ORDER BY pair
"""



# ---------------------------------------------------------------------------
# Distribution drift monitor — exact L1 distance between period histograms
# ---------------------------------------------------------------------------
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-drift monitor between two observation periods — the
    ML-ops screen that decides "has this feature's distribution moved
    enough to retrain / investigate?" per feature slice.

    For each event type, the value distribution (10-unit bands) of week 1
    is compared against week 4 as total-variation-style L1 distance in
    exact ppm: per band, share_1 = n·10⁶ div total_1 and share_2
    likewise, drift = Σ|share_1 − share_2|.  Division only by each
    period's own total (non-negative → engine-identical), absolute
    difference of integers — no float, no log, unlike PSI/KL whose libm
    terms don't hash across engines (drift RANKS identically under L1).

    Scale shape: one map-side-combinable groupBy (type, period, band)
    over the filtered scan, then band-table-sized reshaping; a full
    outer band alignment keeps bands present in only one period (their
    entire share counts as drift).  Output: one row per event type with
    the drift, band count, and the single worst-drifting band.
    """
    ev = _t(spark, sf_dir, "events")
    p1 = (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    p2 = (F.col("ts") >= F.lit("2024-01-22 00:00:00").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-01-29 00:00:00").cast("timestamp")
    )
    banded = (
        ev.where(p1 | p2)
        .select(
            "event_type",
            F.when(p1, F.lit(1)).otherwise(F.lit(2)).alias("period"),
            F.floor(
                F.least(
                    F.abs(F.coalesce(F.col("value"), F.lit(0.0))),
                    F.lit(499.0),
                )
                / 10.0
            )
            .cast("long")
            .alias("band"),
        )
        .groupBy("event_type", "period", "band")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = banded.groupBy("event_type", "period").agg(
        F.sum("n").alias("t")
    )
    shares = banded.join(totals, ["event_type", "period"]).select(
        "event_type",
        "period",
        "band",
        F.expr("(n * 1000000) div t").alias("ppm"),
    )
    a = shares.where(F.col("period") == 1).select(
        "event_type", "band", F.col("ppm").alias("ppm_1")
    )
    b = shares.where(F.col("period") == 2).select(
        "event_type", "band", F.col("ppm").alias("ppm_2")
    )
    aligned = (
        a.join(b, ["event_type", "band"], "full_outer")
        .select(
            "event_type",
            "band",
            F.coalesce("ppm_1", F.lit(0)).alias("ppm_1"),
            F.coalesce("ppm_2", F.lit(0)).alias("ppm_2"),
        )
        .withColumn("band_drift", F.abs(F.col("ppm_1") - F.col("ppm_2")))
    )
    sel = F.concat(
        F.lpad((F.lit(999999999999) - F.col("band_drift")).cast("string"), 12, "0"),
        F.lpad(F.col("band").cast("string"), 6, "0"),
    )
    return (
        aligned.withColumn("_sel", sel)
        .groupBy("event_type")
        .agg(
            F.sum("band_drift").cast("long").alias("l1_drift_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_bands"),
            F.min_by("band", F.col("_sel")).cast("long").alias("worst_band"),
            F.max("band_drift").cast("long").alias("worst_band_drift_ppm"),
        )
        .orderBy("event_type")
    )


SQL_DISTRIBUTION_DRIFT = """
WITH banded AS (
  SELECT event_type,
         CASE WHEN ts >= TIMESTAMP '2024-01-01 00:00:00'
                AND ts < TIMESTAMP '2024-01-08 00:00:00' THEN 1 ELSE 2
         END AS period,
         CAST(floor(least(abs(coalesce(value, 0.0)), 499.0) / 10.0)
              AS BIGINT) AS band,
         count(*) AS n
  FROM events
  WHERE (ts >= TIMESTAMP '2024-01-01 00:00:00'
         AND ts < TIMESTAMP '2024-01-08 00:00:00')
     OR (ts >= TIMESTAMP '2024-01-22 00:00:00'
         AND ts < TIMESTAMP '2024-01-29 00:00:00')
  GROUP BY event_type, period, band
), totals AS (
  SELECT event_type, period, sum(n) AS t FROM banded
  GROUP BY event_type, period
), shares AS (
  SELECT b.event_type, b.period, b.band, (b.n * 1000000) // t.t AS ppm
  FROM banded b JOIN totals t
    ON t.event_type = b.event_type AND t.period = b.period
), a AS (
  SELECT event_type, band, ppm AS ppm_1 FROM shares WHERE period = 1
), b AS (
  SELECT event_type, band, ppm AS ppm_2 FROM shares WHERE period = 2
), aligned AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type,
         coalesce(a.band, b.band) AS band,
         abs(coalesce(ppm_1, 0) - coalesce(ppm_2, 0)) AS band_drift
  FROM a FULL OUTER JOIN b
    ON a.event_type = b.event_type AND a.band = b.band
)
SELECT event_type,
       CAST(sum(band_drift) AS BIGINT) AS l1_drift_ppm,
       count(*) AS n_bands,
       CAST(arg_min(band,
            lpad(CAST(999999999999 - band_drift AS VARCHAR), 12, '0')
              || lpad(CAST(band AS VARCHAR), 6, '0')) AS BIGINT)
         AS worst_band,
       CAST(max(band_drift) AS BIGINT) AS worst_band_drift_ppm
FROM aligned
GROUP BY event_type
ORDER BY event_type
"""



# ---------------------------------------------------------------------------
# Incremental view maintenance — mergeable-agg snapshot + delta refresh
# ---------------------------------------------------------------------------
def q_ivm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of an aggregate view: a snapshot
    (orders through 1996-12-31) merges with the delta (orders after) into
    the refreshed view WITHOUT rescanning history — the algebraic-IVM
    contract that sum/count partials are mergeable.

    Both partials here derive from the same table split by a watermark
    date (in production the snapshot is a stored table and only the delta
    scans); the merge is a full-outer key join + coalesce-add, and the
    ``check_full`` column re-derives each group from the unsplit table to
    pin merged ≡ recomputed inside the SAME query — the self-auditing
    refresh a lakehouse scheduler would run.

    Scale shape: delta-sized scan + snapshot-sized join at refresh time;
    the two partial aggs are map-side combinable.  Money in cents per the
    catalog rules.
    """
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1996-12-31 23:59:59").cast("timestamp")

    def part(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(
            F.col("o_orderpriority").alias("priority")
        ).agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias(f"cents_{tag}"),
        )

    snap = part(orders.where(F.col("o_orderdate") <= cut), "snap")
    delta = part(orders.where(F.col("o_orderdate") > cut), "delta")
    full = part(orders, "full")
    merged = (
        snap.join(delta, "priority", "full_outer")
        .select(
            "priority",
            (F.coalesce("n_snap", F.lit(0)) + F.coalesce("n_delta", F.lit(0)))
            .cast("long")
            .alias("n_merged"),
            (
                F.coalesce("cents_snap", F.lit(0))
                + F.coalesce("cents_delta", F.lit(0))
            )
            .cast("long")
            .alias("cents_merged"),
            F.coalesce("n_delta", F.lit(0)).cast("long").alias("n_delta"),
        )
    )
    return (
        merged.join(full, "priority")
        .select(
            "priority",
            "n_merged",
            "cents_merged",
            "n_delta",
            (
                (F.col("n_merged") == F.col("n_full"))
                & (F.col("cents_merged") == F.col("cents_full"))
            ).alias("check_full"),
        )
        .orderBy("priority")
    )


SQL_IVM_MERGE = """
WITH snap AS (
  SELECT o_orderpriority AS priority, count(*) AS n_snap,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents_snap
  FROM orders WHERE o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
  GROUP BY priority
), delta AS (
  SELECT o_orderpriority AS priority, count(*) AS n_delta,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents_delta
  FROM orders WHERE o_orderdate > TIMESTAMP '1996-12-31 23:59:59'
  GROUP BY priority
), fullv AS (
  SELECT o_orderpriority AS priority, count(*) AS n_full,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents_full
  FROM orders GROUP BY priority
), merged AS (
  SELECT coalesce(s.priority, d.priority) AS priority,
         coalesce(n_snap, 0) + coalesce(n_delta, 0) AS n_merged,
         coalesce(cents_snap, 0) + coalesce(cents_delta, 0) AS cents_merged,
         coalesce(n_delta, 0) AS n_delta
  FROM snap s FULL OUTER JOIN delta d ON s.priority = d.priority
)
SELECT m.priority,
       CAST(m.n_merged AS BIGINT) AS n_merged,
       CAST(m.cents_merged AS BIGINT) AS cents_merged,
       CAST(m.n_delta AS BIGINT) AS n_delta,
       (m.n_merged = f.n_full AND m.cents_merged = f.cents_full)
         AS check_full
FROM merged m JOIN fullv f ON f.priority = m.priority
ORDER BY m.priority
"""


# ---------------------------------------------------------------------------
# Daily activity streaks — rank-difference islands on the day grid
# ---------------------------------------------------------------------------
def q_daily_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-active-day streaks — the product-analytics
    staple ("longest streak", "how fragmented is engagement").

    On the integer day grid, islands fall out of the rank-difference
    trick: for each user's DISTINCT active days ordered ascending,
    ``day_num − row_number()`` is constant exactly within a run of
    consecutive days — no running max needed (contrast
    ``interval_coalesce``, where variable interval lengths force one).
    Two keyed aggregations + one keyed window, all on user_id.

    Output per user: active days, streak count, longest/latest streak
    lengths (latest = the island containing the user's last active day).
    """
    ev = _t(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("day_num"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    islands = (
        days.withColumn(
            "grp", F.col("day_num") - F.row_number().over(w)
        )
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("len"),
            F.max("day_num").alias("last_day"),
        )
    )
    last_sel = F.concat(
        F.lpad((F.lit(999999) - F.col("last_day")).cast("string"), 7, "0"),
    )
    return (
        islands.withColumn("_lsel", last_sel)
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("max_streak"),
            F.min_by("len", F.col("_lsel")).cast("long").alias("latest_streak"),
        )
        .orderBy("user_id")
    )


SQL_DAILY_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num
  FROM events
), ranked AS (
  SELECT user_id, day_num,
         day_num - row_number() OVER (
           PARTITION BY user_id ORDER BY day_num) AS grp
  FROM days
), islands AS (
  SELECT user_id, grp, count(*) AS len, max(day_num) AS last_day
  FROM ranked GROUP BY user_id, grp
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       count(*) AS n_streaks,
       CAST(max(len) AS BIGINT) AS max_streak,
       CAST(arg_min(len,
            lpad(CAST(999999 - last_day AS VARCHAR), 7, '0')) AS BIGINT)
         AS latest_streak
FROM islands
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Pareto concentration — who covers 80% of revenue, per segment
# ---------------------------------------------------------------------------
def q_pareto_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration per market segment: how many
    customers, ranked by revenue, cover 80 % of the segment's total —
    the revenue-concentration / whale-detection report.

    Per segment the customer revenue agg shuffles once; the cumulative
    share is a keyed window over the segment's CUSTOMER table (never raw
    orders), ordered by (revenue desc, custkey) for determinism.  The
    80 % membership test stays in exact integers — ``cum·5 < total·4``
    counts customers strictly below the threshold, then +1 for the
    customer that crosses it.  Output: per segment, customer count,
    customers-to-80 %, and their ppm share of the population.
    """
    seg = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .join(seg, "custkey")
    )
    w_cum = (
        Window.partitionBy("segment")
        .orderBy(F.desc("cents"), F.asc("custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = rev.select(
        "segment",
        "custkey",
        "cents",
        F.sum("cents").over(w_cum).alias("cum"),
    )
    totals = staged.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.max("cum").alias("total"),
    )
    return (
        staged.join(totals, "segment")
        .groupBy("segment")
        .agg(
            F.max("n_customers").alias("n_customers"),
            (
                F.sum(
                    F.when(
                        F.col("cum") * 5 < F.col("total") * 4, 1
                    ).otherwise(0)
                )
                + 1
            )
            .cast("long")
            .alias("n_to_80pct"),
        )
        .withColumn(
            "share_of_pop_ppm",
            F.expr("(n_to_80pct * 1000000) div n_customers"),
        )
        .orderBy("segment")
    )


SQL_PARETO = """
WITH rev AS (
  SELECT o.o_custkey AS custkey, c.c_mktsegment AS segment,
         CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY custkey, segment
), staged AS (
  SELECT segment, custkey, cents,
         sum(cents) OVER (PARTITION BY segment
                          ORDER BY cents DESC, custkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
  FROM rev
), totals AS (
  SELECT segment, count(*) AS n_customers, max(cum) AS total
  FROM staged GROUP BY segment
)
SELECT s.segment,
       CAST(max(t.n_customers) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN s.cum * 5 < t.total * 4 THEN 1 ELSE 0 END) + 1
            AS BIGINT) AS n_to_80pct,
       CAST(((sum(CASE WHEN s.cum * 5 < t.total * 4 THEN 1 ELSE 0 END) + 1)
         * 1000000) // max(t.n_customers) AS BIGINT) AS share_of_pop_ppm
FROM staged s JOIN totals t ON t.segment = s.segment
GROUP BY s.segment
ORDER BY s.segment
"""



# ---------------------------------------------------------------------------
# Session path analysis — top navigation paths across sessionized streams
# ---------------------------------------------------------------------------
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: the first three event types of every
    session (30-min gap sessionization via ``operators/sessions``),
    ranked by frequency — the clickstream "how do journeys start"
    report.

    The path assembles WITHOUT an ordered collect_list (whose order
    Spark does not guarantee across partitioner choices): a per-session
    row_number picks steps 1-3, and three conditional ``max(CASE rn)``
    aggregations pin each step deterministically — the same trick works
    verbatim in the oracle.  ``concat_ws`` skips nulls, so shorter
    sessions yield shorter paths instead of dangling separators.

    Scale shape: the sessionize window, the step window, and the
    per-session agg all share the user_id-prefixed partitioning; the
    path groupBy carries one row per session; top-k is
    TakeOrderedAndProject.
    """
    from service_alerts_connector_spark.operators.sessions import sessionize

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, gap_s=1800)
    w = Window.partitionBy("user_id", "session_idx").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    stepped = s.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 3
    )
    per_session = stepped.groupBy("user_id", "session_idx").agg(
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("e1"),
        F.max(F.when(F.col("rn") == 2, F.col("event_type"))).alias("e2"),
        F.max(F.when(F.col("rn") == 3, F.col("event_type"))).alias("e3"),
    )
    return (
        per_session.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


SQL_SESSION_PATHS = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), sessed AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged
), stepped AS (
  SELECT user_id, session_idx, event_type,
         row_number() OVER (PARTITION BY user_id, session_idx
                            ORDER BY ts, event_id) AS rn
  FROM sessed
), per_session AS (
  SELECT user_id, session_idx,
         max(CASE WHEN rn = 1 THEN event_type END) AS e1,
         max(CASE WHEN rn = 2 THEN event_type END) AS e2,
         max(CASE WHEN rn = 3 THEN event_type END) AS e3
  FROM stepped WHERE rn <= 3
  GROUP BY user_id, session_idx
)
SELECT concat_ws('>', e1, e2, e3) AS path, count(*) AS n_sessions
FROM per_session
GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""



# ---------------------------------------------------------------------------
# Functional-dependency check — schema-rule profiling (A → B violations)
# ---------------------------------------------------------------------------
def q_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling: does column A determine column B?
    The schema-discovery sibling of ``join_profile`` (which finds join
    edges) and ``dq_rule_screen`` (which enforces row rules) — FDs decide
    normalization, dedup keys, and whether a "dimension" column is safe
    to collapse.

    For each candidate FD the per-LHS distinct-RHS count comes from ONE
    (lhs, rhs) distinct + LHS rollup; a violating LHS has > 1 RHS.
    Candidates: n_name → n_regionkey (true — nation names are unique),
    p_brand → p_type (false — brands span types),
    o_orderpriority → o_orderstatus (false — priorities span statuses),
    and c_nationkey → c_mktsegment (false).  Output per FD: LHS distinct
    count, violating-LHS count, max RHS-per-LHS, and a holds flag.

    Scale shape: per FD one map-side-combinable distinct on the (lhs,
    rhs) pair (the only input-sized shuffle) and one LHS-sized rollup.
    """

    def check(fd: str, df: DataFrame, lhs: str, rhs: str) -> DataFrame:
        pairs = df.select(
            F.col(lhs).alias("l"), F.col(rhs).alias("r")
        ).distinct()
        per_lhs = pairs.groupBy("l").agg(
            F.count(F.lit(1)).cast("long").alias("n_rhs")
        )
        return per_lhs.agg(
            F.lit(fd).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.max("n_rhs").cast("long").alias("max_rhs_per_lhs"),
            (F.max("n_rhs") == 1).alias("holds"),
        )

    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    out = check("n_name->n_regionkey", nation, "n_name", "n_regionkey")
    out = out.unionByName(check("p_brand->p_type", part, "p_brand", "p_type"))
    out = out.unionByName(
        check(
            "o_orderpriority->o_orderstatus",
            orders,
            "o_orderpriority",
            "o_orderstatus",
        )
    )
    out = out.unionByName(
        check("c_nationkey->c_mktsegment", cust, "c_nationkey", "c_mktsegment")
    )
    return out.orderBy("fd")


SQL_FD_CHECK = """
WITH c0 AS (
  SELECT 'n_name->n_regionkey' AS fd, count(*) AS n_lhs,
         sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating,
         max(n_rhs) AS max_rhs_per_lhs, max(n_rhs) = 1 AS holds
  FROM (SELECT n_name, count(*) AS n_rhs
        FROM (SELECT DISTINCT n_name, n_regionkey FROM nation)
        GROUP BY n_name)
), c1 AS (
  SELECT 'p_brand->p_type' AS fd, count(*) AS n_lhs,
         sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating,
         max(n_rhs) AS max_rhs_per_lhs, max(n_rhs) = 1 AS holds
  FROM (SELECT p_brand, count(*) AS n_rhs
        FROM (SELECT DISTINCT p_brand, p_type FROM part) GROUP BY p_brand)
), c2 AS (
  SELECT 'o_orderpriority->o_orderstatus' AS fd, count(*) AS n_lhs,
         sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating,
         max(n_rhs) AS max_rhs_per_lhs, max(n_rhs) = 1 AS holds
  FROM (SELECT o_orderpriority, count(*) AS n_rhs
        FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        GROUP BY o_orderpriority)
), c3 AS (
  SELECT 'c_nationkey->c_mktsegment' AS fd, count(*) AS n_lhs,
         sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating,
         max(n_rhs) AS max_rhs_per_lhs, max(n_rhs) = 1 AS holds
  FROM (SELECT c_nationkey, count(*) AS n_rhs
        FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
        GROUP BY c_nationkey)
)
SELECT fd, CAST(n_lhs AS BIGINT) AS n_lhs,
       CAST(n_violating AS BIGINT) AS n_violating,
       CAST(max_rhs_per_lhs AS BIGINT) AS max_rhs_per_lhs, holds
FROM (SELECT * FROM c0 UNION ALL SELECT * FROM c1 UNION ALL
      SELECT * FROM c2 UNION ALL SELECT * FROM c3)
ORDER BY fd
"""



# ---------------------------------------------------------------------------
# Keyset pagination — O(1)-per-page serving over a composite sort key
# ---------------------------------------------------------------------------
def q_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three consecutive 100-row pages of the order feed via KEYSET
    pagination — the serving pattern that stays O(page) at any depth,
    where OFFSET N re-scans and re-sorts N rows to throw them away.

    Page k+1 seeks past page k's last row with the composite-key
    predicate ``(date, key) > (last_date, last_key)`` expressed as the
    index-friendly disjunction ``date > d OR (date = d AND key > k)`` —
    the date bound pushes into the parquet scan, and each page plans
    TakeOrderedAndProject (per-partition partial top-k, no global sort).
    The page boundaries are themselves computed as scalar anchors (the
    100th row of the previous page), mirroring how a cursor-based API
    carries the "next page token".

    Output: 300 rows tagged with their page number; identical rows to
    OFFSET pagination, without its O(depth) cost.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("od"),
    )

    def page(after) -> DataFrame:
        df = orders
        if after is not None:
            d, k = after
            df = df.where(
                (F.col("od") > d)
                | ((F.col("od") == d) & (F.col("o_orderkey") > k))
            )
        return df.orderBy(F.asc("od"), F.asc("o_orderkey")).limit(100)

    pages = []
    cursor = None
    for i in range(3):
        p = page(cursor)
        rows = p.collect()  # page-sized (100 rows) — the cursor round-trip
        cursor = (rows[-1]["od"], rows[-1]["o_orderkey"])
        pages.append(
            p.select(
                F.lit(i + 1).cast("long").alias("page"),
                "o_orderkey",
                "od",
            )
        )
    out = pages[0]
    for x in pages[1:]:
        out = out.unionByName(x)
    return out.orderBy("page", "od", "o_orderkey")


SQL_KEYSET_PAGINATION = """
WITH ordered AS (
  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od
  FROM orders
), ranked AS (
  SELECT o_orderkey, od,
         row_number() OVER (ORDER BY od, o_orderkey) AS rn
  FROM ordered
)
SELECT CAST((rn - 1) // 100 + 1 AS BIGINT) AS page, o_orderkey, od
FROM ranked WHERE rn <= 300
ORDER BY page, od, o_orderkey
"""



# ---------------------------------------------------------------------------
# Leave-one-out target encoding — leakage-safe categorical feature
# ---------------------------------------------------------------------------
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value — the categorical-feature transform whose naive form leaks the
    row's own label; LOO subtracts it: enc_i = (Σ_group − x_i)/(n − 1).

    Exact integers end-to-end: cents sums per group come from one
    map-side-combinable aggregate broadcast-joined back (never a window
    over the fact table), the per-row encoding is (sum − own)·1000 div
    (n − 1) in milli-cents (non-negative operands, engine-identical
    div), and singleton groups yield NULL (no peers to encode from)
    rather than a leaked self-mean.  Output: a deterministic 20-row
    sample (smallest orderkeys) plus the group stats that produced it.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    grp = orders.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    enc = orders.join(F.broadcast(grp), "priority").select(
        "o_orderkey",
        "priority",
        "cents",
        "n",
        F.when(
            F.col("n") > 1,
            F.expr("((sum_cents - cents) * 1000) div (n - 1)"),
        ).alias("loo_enc_milli"),
    )
    return enc.orderBy("o_orderkey").limit(20)


SQL_TARGET_ENCODING = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority AS priority,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), grp AS (
  SELECT priority, count(*) AS n, sum(cents) AS sum_cents
  FROM o GROUP BY priority
)
SELECT o.o_orderkey, o.priority, o.cents, CAST(grp.n AS BIGINT) AS n,
       CAST(CASE WHEN grp.n > 1
            THEN ((grp.sum_cents - o.cents) * 1000) // (grp.n - 1)
       END AS BIGINT) AS loo_enc_milli
FROM o JOIN grp ON grp.priority = o.priority
ORDER BY o.o_orderkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Embargoed temporal split — time-series CV with a leakage gap
# ---------------------------------------------------------------------------
def q_temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series train/test split with an EMBARGO: train < cut, a
    2-day embargo absorbs look-ahead leakage (rolling features computed
    at train time peek this far forward), test starts after it.  The
    report also counts users active on BOTH sides — the entity-overlap
    signal that decides between a temporal and a grouped split.

    One pass tags each event's split; the overlap check is two distinct
    user sets + a semi-join count.  All boundaries compare raw
    TIMESTAMPs; counts exact.
    """
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    test_start = F.lit("2024-01-22 00:00:00").cast("timestamp")
    tagged = ev.select(
        "user_id",
        F.when(F.col("ts") < cut, "train")
        .when(F.col("ts") < test_start, "embargo")
        .otherwise("test")
        .alias("split"),
    )
    counts = tagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    train_u = tagged.where(F.col("split") == "train").select("user_id").distinct()
    test_u = tagged.where(F.col("split") == "test").select("user_id").distinct()
    overlap = train_u.join(test_u, "user_id", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("users_in_both")
    )
    return counts.crossJoin(F.broadcast(overlap)).orderBy("split")


SQL_TEMPORAL_SPLIT = """
WITH tagged AS (
  SELECT user_id,
         CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
              WHEN ts < TIMESTAMP '2024-01-22 00:00:00' THEN 'embargo'
              ELSE 'test' END AS split
  FROM events
), counts AS (
  SELECT split, count(*) AS n_events,
         count(DISTINCT user_id) AS n_users
  FROM tagged GROUP BY split
), overlap AS (
  SELECT count(*) AS users_in_both FROM (
    SELECT DISTINCT user_id FROM tagged WHERE split = 'train'
  ) t WHERE t.user_id IN (
    SELECT DISTINCT user_id FROM tagged WHERE split = 'test')
)
SELECT c.split, CAST(c.n_events AS BIGINT) AS n_events,
       CAST(c.n_users AS BIGINT) AS n_users,
       CAST(o.users_in_both AS BIGINT) AS users_in_both
FROM counts c, overlap o
ORDER BY c.split
"""



# ---------------------------------------------------------------------------
# Contribution shares — percent-of-parent across a rollup hierarchy
# ---------------------------------------------------------------------------
def q_contribution_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent contribution analysis down the region → nation
    hierarchy: each nation's revenue as an exact-ppm share of its region
    AND of the grand total — the drill-down share report every OLAP
    frontend derives, computed WITHOUT a global window.

    One fact aggregation at nation grain; the region and grand totals
    re-aggregate the nation table (25 rows) and broadcast back — the
    share denominators never touch the fact table again.  Revenue in
    integer cents; shares via non-negative integer div.
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
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("nation"),
                    "n_regionkey",
                )
            ),
            "c_nationkey",
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").select(
                    F.col("r_regionkey").alias("n_regionkey"),
                    F.col("r_name").alias("region"),
                )
            ),
            "n_regionkey",
        )
        .groupBy("region", "nation")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    # rev is a ~|nation|-row aggregate whose SUBTREE (fact scan + two dim
    # joins + groupBy) fed three consumers (region totals, grand total,
    # final join) — pin one evaluation (r15, guide §1.2)
    rev = rev.localCheckpoint(eager=False)
    region_tot = rev.groupBy("region").agg(
        F.sum("cents").alias("region_cents")
    )
    grand = rev.agg(F.sum("cents").alias("grand_cents"))
    return (
        rev.join(F.broadcast(region_tot), "region")
        .crossJoin(F.broadcast(grand))
        .select(
            "region",
            "nation",
            "cents",
            F.expr("(cents * 1000000) div region_cents").alias(
                "share_of_region_ppm"
            ),
            F.expr("(cents * 1000000) div grand_cents").alias(
                "share_of_total_ppm"
            ),
        )
        .orderBy("region", "nation")
    )


SQL_CONTRIBUTION_SHARE = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY region, nation
), region_tot AS (
  SELECT region, CAST(sum(cents) AS BIGINT) AS region_cents FROM rev GROUP BY region
), grand AS (
  SELECT CAST(sum(cents) AS BIGINT) AS grand_cents FROM rev
)
SELECT rev.region, rev.nation, rev.cents,
       (rev.cents * 1000000) // rt.region_cents AS share_of_region_ppm,
       (rev.cents * 1000000) // g.grand_cents AS share_of_total_ppm
FROM rev JOIN region_tot rt ON rt.region = rev.region, grand g
ORDER BY rev.region, rev.nation
"""



# ---------------------------------------------------------------------------
# Header-detail reconciliation — structural consistency across fact grains
# ---------------------------------------------------------------------------
def q_header_detail_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail structural reconciliation between orders and their
    lineitems — the cross-grain audit every warehouse load runs: childless
    headers (orders with zero lines), orphaned details (lines whose order
    is missing), and the lines-per-order spread.

    (The synthetic generator draws o_totalprice independently of the
    lines, so an AMOUNT reconciliation is vacuous here — the structural
    half is the meaningful audit, and 257 childless headers exist at
    sf0.01.)  Two anti-join counts + one per-order line rollup; all
    shuffles on the order key, scalar verdict row.
    """
    orders = _t(spark, sf_dir, "orders").select("o_orderkey")
    lines = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    per_order = lines.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    childless = orders.join(
        per_order, orders["o_orderkey"] == per_order["l_orderkey"], "left_anti"
    )
    orphans = lines.join(
        orders, lines["l_orderkey"] == orders["o_orderkey"], "left_anti"
    )
    n_orders = orders.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    n_childless = childless.agg(
        F.count(F.lit(1)).cast("long").alias("n_childless_headers")
    )
    n_orphans = orphans.agg(
        F.count(F.lit(1)).cast("long").alias("n_orphan_lines")
    )
    spread = per_order.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders_with_lines"),
        F.sum("n_lines").cast("long").alias("n_lines_total"),
        F.min("n_lines").cast("long").alias("min_lines_per_order"),
        F.max("n_lines").cast("long").alias("max_lines_per_order"),
    )
    return (
        n_orders.crossJoin(F.broadcast(n_childless))
        .crossJoin(F.broadcast(n_orphans))
        .crossJoin(F.broadcast(spread))
    )


SQL_HEADER_DETAIL_RECON = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey
)
SELECT (SELECT count(*) FROM orders) AS n_orders,
       (SELECT count(*) FROM orders o
         WHERE o.o_orderkey NOT IN (SELECT l_orderkey FROM per_order))
         AS n_childless_headers,
       (SELECT count(*) FROM lineitem l
         WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders))
         AS n_orphan_lines,
       (SELECT count(*) FROM per_order) AS n_orders_with_lines,
       (SELECT CAST(sum(n_lines) AS BIGINT) FROM per_order)
         AS n_lines_total,
       (SELECT CAST(min(n_lines) AS BIGINT) FROM per_order)
         AS min_lines_per_order,
       (SELECT CAST(max(n_lines) AS BIGINT) FROM per_order)
         AS max_lines_per_order
"""



# ---------------------------------------------------------------------------
# Market-basket association rules — support + confidence over order baskets
# ---------------------------------------------------------------------------
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: the top co-purchased part
    pairs by support, with directional confidence in exact ppm — the
    market-basket analysis behind "customers who bought X also bought Y".

    Pair expansion is bounded by construction: pairs form WITHIN an
    order (self-join on the order key with part_a < part_b), so the
    blow-up is Σ lines² per order with lines ≤ ~13 — never a
    catalog-wide part×part product.  Supports come from one distinct
    (order, part) projection; confidence_a→b = pair_orders·10⁶ div
    orders_with_a.  Top-20 by (support, pair) via TakeOrderedAndProject.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders_both"))
    )
    part_orders = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    return (
        pairs.join(
            part_orders.select(
                F.col("l_partkey").alias("part_a"),
                F.col("n_orders").alias("n_a"),
            ),
            "part_a",
        )
        .join(
            part_orders.select(
                F.col("l_partkey").alias("part_b"),
                F.col("n_orders").alias("n_b"),
            ),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "n_orders_both",
            "n_a",
            "n_b",
            F.expr("(n_orders_both * 1000000) div n_a").alias(
                "conf_a_to_b_ppm"
            ),
            F.expr("(n_orders_both * 1000000) div n_b").alias(
                "conf_b_to_a_ppm"
            ),
        )
        .orderBy(
            F.desc("n_orders_both"), F.asc("part_a"), F.asc("part_b")
        )
        .limit(20)
    )


SQL_BASKET_RULES = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_orders_both
  FROM li a JOIN li b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
), part_orders AS (
  SELECT l_partkey, count(*) AS n_orders FROM li GROUP BY l_partkey
)
SELECT p.part_a, p.part_b, p.n_orders_both,
       CAST(pa.n_orders AS BIGINT) AS n_a,
       CAST(pb.n_orders AS BIGINT) AS n_b,
       (p.n_orders_both * 1000000) // pa.n_orders AS conf_a_to_b_ppm,
       (p.n_orders_both * 1000000) // pb.n_orders AS conf_b_to_a_ppm
FROM pairs p
JOIN part_orders pa ON pa.l_partkey = p.part_a
JOIN part_orders pb ON pb.l_partkey = p.part_b
ORDER BY p.n_orders_both DESC, p.part_a ASC, p.part_b ASC
LIMIT 20
"""



# ---------------------------------------------------------------------------
# Boxplot stats — exact order statistics per group (no float percentiles)
# ---------------------------------------------------------------------------
def q_boxplot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-number summary of order value per customer nation — the
    boxplot feed, with every quartile an EXACT order statistic via
    sorted-array indexing (index (k·(n+1)) div 4, floored, lower-bounded
    at 1) so both engines pick the identical element — never a float
    percentile whose interpolation differs.

    Two-pass rank-within-group, never a collect_list of raw fact rows:
    pass 1 reduces the fact table to the per-nation VALUE HISTOGRAM
    (groupBy (nation, cents) -> cnt, a scalable shuffle agg whose cell
    count is bounded by the distinct-price domain, not the row count);
    pass 2 runs a per-nation running-sum rank over those cells and picks
    each quartile as the smallest cents whose cumulative count reaches
    rank greatest(1, (k*(n+1)) div 4) — the identical element the old
    array_sort(collect_list(...)) indexing chose, without ever building a
    per-nation array of every order (the 100x scale-killer flagged in
    round 6).  IQR and whisker counts (values beyond q3 + 1.5·IQR, in
    integer form 4·v > 4·q3 + 6·iqr) come along exactly.
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
    # the histogram cells feed BOTH the quartile pipeline and the outlier
    # count (which is value-determined: rows beyond the whisker = Σ cnt
    # over qualifying cells) — pin one evaluation so the fact scan + dim
    # join + histogram shuffle run once, not once per branch (r15, guide
    # §1.2; same cells-reuse as range_partition_plan)
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
    rank_of = lambda k: F.greatest(
        F.lit(1).cast("long"), F.expr(f"({k} * (ntot + 1)) div 4")
    )
    pick = lambda k: F.min(
        F.when(F.col("cum") >= rank_of(k), F.col("cents"))
    )
    # pin the 25-row stats frame too: it is both the broadcast side of the
    # outlier join AND the left side of the final join — unpinned, the
    # whole window pipeline ran twice
    stats = (
        ranked.groupBy("nation")
        .agg(
            F.max("ntot").cast("long").alias("n"),
            F.min("cents").cast("long").alias("lo"),
            pick(1).cast("long").alias("q1"),
            pick(2).cast("long").alias("med"),
            pick(3).cast("long").alias("q3"),
            F.max("cents").cast("long").alias("hi"),
        )
        .localCheckpoint(eager=False)
    )
    outliers = (
        cells.join(F.broadcast(stats.select("nation", "q1", "q3")), "nation")
        .where(
            F.col("cents") * 4 > F.col("q3") * 4 + (F.col("q3") - F.col("q1")) * 6
        )
        .groupBy("nation")
        .agg(F.sum("cnt").cast("long").alias("n_high_outliers"))
    )
    return (
        stats.join(outliers, "nation", "left")
        .select(
            "nation",
            "n",
            "lo",
            "q1",
            "med",
            "q3",
            "hi",
            F.coalesce("n_high_outliers", F.lit(0)).cast("long").alias(
                "n_high_outliers"
            ),
        )
        .orderBy("nation")
    )


SQL_BOXPLOT = """
WITH rev AS (
  SELECT c.c_nationkey AS nation,
         CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), stats AS (
  SELECT nation, count(*) AS n,
         min(cents) AS lo,
         list_sort(list(cents))[
           CAST(greatest(1, (count(*) + 1) // 4) AS INT)] AS q1,
         list_sort(list(cents))[
           CAST(greatest(1, (2 * (count(*) + 1)) // 4) AS INT)] AS med,
         list_sort(list(cents))[
           CAST(greatest(1, (3 * (count(*) + 1)) // 4) AS INT)] AS q3,
         max(cents) AS hi
  FROM rev GROUP BY nation
), outliers AS (
  SELECT r.nation, count(*) AS n_high_outliers
  FROM rev r JOIN stats s ON s.nation = r.nation
  WHERE r.cents * 4 > s.q3 * 4 + (s.q3 - s.q1) * 6
  GROUP BY r.nation
)
SELECT s.nation, CAST(s.n AS BIGINT) AS n,
       CAST(s.lo AS BIGINT) AS lo, CAST(s.q1 AS BIGINT) AS q1,
       CAST(s.med AS BIGINT) AS med, CAST(s.q3 AS BIGINT) AS q3,
       CAST(s.hi AS BIGINT) AS hi,
       CAST(coalesce(o.n_high_outliers, 0) AS BIGINT) AS n_high_outliers
FROM stats s LEFT JOIN outliers o ON o.nation = s.nation
ORDER BY s.nation
"""



# ---------------------------------------------------------------------------
# Aging report — open-order value by age bucket × priority (AR aging)
# ---------------------------------------------------------------------------
def q_aging_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable-style aging of the OPEN order book: value and
    count per 90-day age bucket × priority against a pinned as-of date —
    the finance close-process artifact (30/60/90 buckets at month grain;
    quarters here to fit the data's span).

    Age in whole days via ``datediff`` against the as-of literal (no
    now(): catalog determinism), bucket = age div 90 capped at 8 (the
    ">2 years" tail bucket every aging report has), one
    map-side-combinable groupBy; cents exact.
    """
    asof = F.lit("2002-01-01 00:00:00").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "O"
    )
    aged = orders.select(
        "o_orderpriority",
        F.least(
            F.expr(
                "datediff(CAST('2002-01-01 00:00:00' AS TIMESTAMP),"
                " o_orderdate) div 90"
            ),
            F.lit(8),
        )
        .cast("long")
        .alias("age_bucket"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        aged.groupBy(
            F.col("o_orderpriority").alias("priority"), "age_bucket"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents_outstanding"),
        )
        .orderBy("priority", "age_bucket")
    )


SQL_AGING_REPORT = """
WITH aged AS (
  SELECT o_orderpriority AS priority,
         least(date_diff('day', CAST(o_orderdate AS DATE),
                         DATE '2002-01-01') // 90, 8) AS age_bucket,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'O'
)
SELECT priority, CAST(age_bucket AS BIGINT) AS age_bucket,
       count(*) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS cents_outstanding
FROM aged
GROUP BY priority, age_bucket
ORDER BY priority, age_bucket
"""



# ---------------------------------------------------------------------------
# Status-mix trend — composition share over order months
# ---------------------------------------------------------------------------
def q_status_mix_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status composition per order month with exact-ppm shares —
    the mix-shift trend report (is the open-order share creeping up?)
    that complements `distribution_drift`'s two-period comparison with
    a full time axis.  One map-side-combined (month, status) groupBy;
    month totals re-aggregate the months × statuses cell table.
    """
    orders = _t(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    totals = cells.groupBy("month").agg(F.sum("n").alias("month_total"))
    return (
        cells.join(F.broadcast(totals), "month")
        .select(
            "month",
            "status",
            "n",
            F.expr("(n * 1000000) div month_total").alias("share_ppm"),
        )
        .orderBy("month", "status")
    )


SQL_STATUS_MIX_TREND = """
WITH cells AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         o_orderstatus AS status, count(*) AS n
  FROM orders GROUP BY month, status
), totals AS (
  SELECT month, CAST(sum(n) AS BIGINT) AS month_total FROM cells GROUP BY month
)
SELECT c.month, c.status, CAST(c.n AS BIGINT) AS n,
       (c.n * 1000000) // t.month_total AS share_ppm
FROM cells c JOIN totals t ON t.month = c.month
ORDER BY c.month, c.status
"""


# ---------------------------------------------------------------------------
# Rank movers — biggest rank changes between two periods
# ---------------------------------------------------------------------------
def q_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-rank movers: each nation's rank in the first half of the
    order history vs the second, with the delta — the "biggest
    climbers/fallers" leaderboard report.  Ranks come from a window
    PARTITIONED BY period (25 rows per partition — keyed, never the
    banned global window), ordered by (cents desc, nation) for total
    determinism; the two periods join on the nation.
    """
    cut = F.lit("1998-06-30 23:59:59").cast("timestamp")
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
        .groupBy(
            F.when(F.col("o_orderdate") <= cut, F.lit(1))
            .otherwise(F.lit(2))
            .alias("period"),
            F.col("c_nationkey").alias("nation"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("period").orderBy(
        F.desc("cents"), F.asc("nation")
    )
    ranked = rev.withColumn("rank", F.row_number().over(w))
    h1 = ranked.where(F.col("period") == 1).select(
        "nation", F.col("rank").alias("rank_h1"), F.col("cents").alias("cents_h1")
    )
    h2 = ranked.where(F.col("period") == 2).select(
        "nation", F.col("rank").alias("rank_h2"), F.col("cents").alias("cents_h2")
    )
    return (
        h1.join(h2, "nation")
        .select(
            "nation",
            F.col("rank_h1").cast("long").alias("rank_h1"),
            F.col("rank_h2").cast("long").alias("rank_h2"),
            (F.col("rank_h1") - F.col("rank_h2")).cast("long").alias(
                "rank_delta"
            ),
            "cents_h1",
            "cents_h2",
        )
        .orderBy(F.desc(F.abs(F.col("rank_delta"))), F.asc("nation"))
        .limit(10)
    )


SQL_RANK_MOVERS = """
WITH rev AS (
  SELECT CASE WHEN o.o_orderdate <= TIMESTAMP '1998-06-30 23:59:59'
              THEN 1 ELSE 2 END AS period,
         c.c_nationkey AS nation,
         CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY period, nation
), ranked AS (
  SELECT period, nation, cents,
         row_number() OVER (PARTITION BY period
                            ORDER BY cents DESC, nation ASC) AS rank
  FROM rev
)
SELECT a.nation,
       CAST(a.rank AS BIGINT) AS rank_h1,
       CAST(b.rank AS BIGINT) AS rank_h2,
       CAST(a.rank - b.rank AS BIGINT) AS rank_delta,
       a.cents AS cents_h1, b.cents AS cents_h2
FROM ranked a JOIN ranked b ON b.nation = a.nation
WHERE a.period = 1 AND b.period = 2
ORDER BY abs(a.rank - b.rank) DESC, a.nation ASC
LIMIT 10
"""



# ---------------------------------------------------------------------------
# HHI concentration — Herfindahl–Hirschman index per market
# ---------------------------------------------------------------------------
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per part-type market as the exact-integer
    Herfindahl–Hirschman index: HHI = Σ share² over each supplier's
    revenue share of the market — the antitrust/risk screen ("is this
    part type single-sourced?").

    Shares in ppm (non-negative integer div), HHI as Σ ppm² div 10⁶ —
    micro-units on the standard 0–10 000 HHI scale ×100; a
    single-supplier market scores 1 000 000, perfect 25-way split
    40 000.  Two map-side-combinable aggregations ((market, supplier),
    then market) + a broadcast totals join; the squares stay < 2⁶³.
    Output: top-10 most concentrated markets with supplier counts.
    """
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(
            _t(spark, sf_dir, "part").select(
                F.col("p_partkey").alias("l_partkey"), "p_type"
            )
        ),
        "l_partkey",
    )
    cell = li.groupBy(
        F.col("p_type").alias("market"), F.col("l_suppkey").alias("supplier")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    totals = cell.groupBy("market").agg(
        F.sum("cents").alias("market_cents"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    shares = cell.join(F.broadcast(totals), "market").select(
        "market",
        "n_suppliers",
        F.expr("(cents * 1000000) div market_cents").alias("share_ppm"),
    )
    return (
        shares.groupBy("market")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            F.expr("sum(share_ppm * share_ppm) div 1000000")
            .cast("long")
            .alias("hhi_micro"),
        )
        .orderBy(F.desc("hhi_micro"), F.asc("market"))
        .limit(10)
    )


SQL_HHI = """
WITH cell AS (
  SELECT p.p_type AS market, l.l_suppkey AS supplier,
         sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY market, supplier
), totals AS (
  SELECT market, sum(cents) AS market_cents, count(*) AS n_suppliers
  FROM cell GROUP BY market
), shares AS (
  SELECT c.market, t.n_suppliers,
         (c.cents * 1000000) // t.market_cents AS share_ppm
  FROM cell c JOIN totals t ON t.market = c.market
)
SELECT market,
       CAST(max(n_suppliers) AS BIGINT) AS n_suppliers,
       CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_micro
FROM shares
GROUP BY market
ORDER BY hhi_micro DESC, market ASC
LIMIT 10
"""


ANALYTICS_QUERIES = {
    "kmv_distinct": q_kmv_distinct,
    "join_size_estimate": q_join_size_estimate,
    "window_rank_suite": q_window_rank_suite,
    "skew_report": q_skew_report,
    "null_safe_join": q_null_safe_join,
    "hll_distinct": q_hll_distinct,
    "skew_salted_agg": q_skew_salted_agg,
    "dq_rule_screen": q_dq_rule_screen,
    "unpivot_metrics": q_unpivot_metrics,
    "q3_shipping_priority": q_q3_shipping_priority,
    "q5_region_volume": q_q5_region_volume,
    "q10_returned_items": q_q10_returned_items,
    "hash_split": q_hash_split,
    "cube_grouping": q_cube_grouping,
    "stratified_sample": q_stratified_sample,
    "sessionize": q_sessionize,
    "pivot_status": q_pivot_status,
    "running_total": q_running_total,
    "rollup_pricing": q_rollup_pricing,
    "distinct_agg": q_distinct_agg,
    "lag_rank_window": q_lag_rank_window,
    "percentiles": q_percentiles,
    "rolling_window_agg": q_rolling_window_agg,
    "grouping_sets": q_grouping_sets,
    "json_typed_extract": q_json_typed_extract,
    "linear_trend": q_linear_trend,
    "zorder_key": q_zorder_key,
    "bloom_semi_join": q_bloom_semi_join,
    "zone_map_prune": q_zone_map_prune,
    "table_digest": q_table_digest,
    "bitmap_intersect": q_bitmap_intersect,
    "k_anonymity_audit": q_k_anonymity_audit,
    "benford_audit": q_benford_audit,
    "seq_gap_audit": q_seq_gap_audit,
    "join_profile": q_join_profile,
    "distribution_drift": q_distribution_drift,
    "ivm_merge": q_ivm_merge,
    "daily_streaks": q_daily_streaks,
    "pareto_analysis": q_pareto_analysis,
    "session_paths": q_session_paths,
    "fd_check": q_fd_check,
    "keyset_pagination": q_keyset_pagination,
    "target_encoding": q_target_encoding,
    "temporal_split_embargo": q_temporal_split_embargo,
    "contribution_share": q_contribution_share,
    "header_detail_recon": q_header_detail_recon,
    "basket_rules": q_basket_rules,
    "boxplot_stats": q_boxplot_stats,
    "aging_report": q_aging_report,
    "status_mix_trend": q_status_mix_trend,
    "rank_movers": q_rank_movers,
    "hhi_concentration": q_hhi_concentration,
}

ANALYTICS_ORACLES = {
    "kmv_distinct": SQL_KMV,
    "join_size_estimate": SQL_JOIN_SIZE_ESTIMATE,
    "window_rank_suite": SQL_WINDOW_RANK_SUITE,
    "skew_report": SQL_SKEW_REPORT,
    "null_safe_join": SQL_NULL_SAFE_JOIN,
    "hll_distinct": _sql_hll(),
    "skew_salted_agg": SQL_SKEW_SALTED,
    "dq_rule_screen": SQL_DQ_RULE_SCREEN,
    "unpivot_metrics": SQL_UNPIVOT,
    "q3_shipping_priority": SQL_Q3,
    "q5_region_volume": SQL_Q5,
    "q10_returned_items": SQL_Q10,
    "hash_split": _sql_hash_split(),
    "cube_grouping": SQL_CUBE,
    "stratified_sample": SQL_STRATIFIED,
    "sessionize": SQL_SESSIONIZE,
    "pivot_status": SQL_PIVOT,
    "running_total": SQL_RUNNING,
    "rollup_pricing": SQL_ROLLUP,
    "distinct_agg": SQL_DISTINCT,
    "lag_rank_window": SQL_LAG_RANK,
    "percentiles": SQL_PERCENTILES,
    "rolling_window_agg": SQL_ROLLING,
    "grouping_sets": SQL_GROUPING_SETS,
    "json_typed_extract": SQL_JSON_TYPED,
    "linear_trend": SQL_LINEAR_TREND,
    "zorder_key": _sql_zorder(),
    "bloom_semi_join": SQL_BLOOM_SEMI_JOIN,
    "zone_map_prune": SQL_ZONE_MAP_PRUNE,
    "table_digest": SQL_TABLE_DIGEST,
    "bitmap_intersect": SQL_BITMAP_INTERSECT,
    "k_anonymity_audit": SQL_K_ANONYMITY,
    "benford_audit": SQL_BENFORD_AUDIT,
    "seq_gap_audit": SQL_SEQ_GAP_AUDIT,
    "join_profile": SQL_JOIN_PROFILE,
    "distribution_drift": SQL_DISTRIBUTION_DRIFT,
    "ivm_merge": SQL_IVM_MERGE,
    "daily_streaks": SQL_DAILY_STREAKS,
    "pareto_analysis": SQL_PARETO,
    "session_paths": SQL_SESSION_PATHS,
    "fd_check": SQL_FD_CHECK,
    "keyset_pagination": SQL_KEYSET_PAGINATION,
    "target_encoding": SQL_TARGET_ENCODING,
    "temporal_split_embargo": SQL_TEMPORAL_SPLIT,
    "contribution_share": SQL_CONTRIBUTION_SHARE,
    "header_detail_recon": SQL_HEADER_DETAIL_RECON,
    "basket_rules": SQL_BASKET_RULES,
    "boxplot_stats": SQL_BOXPLOT,
    "aging_report": SQL_AGING_REPORT,
    "status_mix_trend": SQL_STATUS_MIX_TREND,
    "rank_movers": SQL_RANK_MOVERS,
    "hhi_concentration": SQL_HHI,
}
