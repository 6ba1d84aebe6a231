"""Advanced relational serving shapes — the classic decision-support
patterns (TPC-H Q17/Q18/Q19/Q21/Q22) whose SHAPES were not yet in the
catalog: correlated scalar subquery per group, HAVING + join-back,
disjunctive OR-of-ANDs across a join, EXISTS + NOT-EXISTS fact self-joins,
and anti-join + group-threshold subquery.

The reference (cityofcapetown/service-alerts-connector) has no OLAP serving
tier — these queries establish the relational completeness a user switching
engines expects, on the driver's TPC-H-ish tables.  Predicates are adapted
to the testdata schema (no l_commitdate / l_shipmode / c_phone / partsupp):
"lateness" is l_shipdate > o_orderdate + 90 days, Q22's "no recent account
activity" is an anti-join against orders since a cutoff, Q17's container
predicate becomes p_brand.

Money / determinism per the catalog rules (catalog.py docstring): prices in
integer cents via floor(x*100) (the double product is IEEE-identical in
Spark and DuckDB, so the floor is cross-engine exact — including negative
account balances, which floor toward -inf in both), revenue in c4 units
(cents x basis-point complement), quantities as exact bigints, every
output either fully-keyed + tiebroken orderBy or a scalar row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _t
from service_alerts_connector_spark.catalog_analytics import (
    _REV_C4_SQL,
    _rev_c4,
)


def _cents(col: str) -> F.Column:
    return F.floor(F.col(col) * 100).cast("long")


def _cents_sql(col: str) -> str:
    return f"CAST(floor({col} * 100) AS BIGINT)"


def _qty() -> F.Column:
    return F.floor(F.col("l_quantity")).cast("long")


# ---------------------------------------------------------------------------
# Q17 shape — correlated scalar subquery per group (decorrelated)
# ---------------------------------------------------------------------------


def q_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in small-quantity orders — lineitems
    of one brand whose quantity is below 20% of that part's average
    lineitem quantity.

    The correlated scalar subquery (avg qty per part) is expressed as the
    decorrelated plan Catalyst itself would produce: one per-part aggregate
    over the brand-restricted lineitems, joined back.  The brand filter
    lands BEFORE the stats pass (a web-scale corpus computes stats only for
    the ~1/brand-count slice), the per-part stats frame is part-cardinality
    sized so AQE broadcasts it, and the avg comparison is exact integers —
    qty*5*cnt < sum_qty, never a float division.
    """
    parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    stats = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_qty()).alias("sum_qty"),
    )
    small = li.join(stats.withColumnRenamed("l_partkey", "sp"),
                    F.col("l_partkey") == F.col("sp")).where(
        _qty() * F.lit(5) * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.sum(_cents("l_extendedprice")).alias("revenue_cents"),
    )


SQL_Q17 = f"""
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#12'
), pstats AS (
  SELECT l_partkey, count(*) AS cnt,
         sum(CAST(floor(l_quantity) AS BIGINT)) AS sum_qty
  FROM li GROUP BY l_partkey
)
SELECT count(*) AS n_small,
       CAST(sum({_cents_sql('l_extendedprice')}) AS BIGINT) AS revenue_cents
FROM li JOIN pstats USING (l_partkey)
WHERE CAST(floor(l_quantity) AS BIGINT) * 5 * cnt < sum_qty
"""


# ---------------------------------------------------------------------------
# Q18 shape — HAVING on an aggregate, join the qualifying keys back
# ---------------------------------------------------------------------------


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the top large-volume orders — orders whose total
    lineitem quantity exceeds 300, joined back to orders + customer.

    The HAVING aggregate runs FIRST (one groupBy(l_orderkey) shuffle that
    collapses the fact table to qualifying keys — 46 of 15 000 orders at
    sf0.01, similar selectivity at any scale), so the join-back moves a
    tiny frame that AQE broadcasts into orders; customer is a broadcast
    dim.  Top-k is TakeOrderedAndProject on (totalprice cents desc,
    orderkey) — never a global sort.
    """
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(_qty()).alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _cents("o_totalprice").alias("totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice_cents"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       {_cents_sql('o_totalprice')} AS totalprice_cents,
       sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice_cents DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive OR-of-ANDs across a join, with a manual CNF
# envelope so the scans still prune
# ---------------------------------------------------------------------------

_Q19_ENVELOPE_BRANDS = ("Brand#12", "Brand#23", "Brand#34")


def q_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three (brand, size-range, qty-range)
    bundles OR-ed together — the canonical disjunction-across-a-join.

    Catalyst cannot push an OR that references both join sides, so each
    side carries its CNF ENVELOPE explicitly (brand IN the three, size
    1..15; quantity 1..30): the parquet scans prune to the union of the
    branches before the join, and only then does the exact disjunction run
    on the joined pairs.  The part side collapses to a few hundred rows →
    broadcast; the lineitem side never shuffles (scan → broadcast-join →
    partial agg), so the plan is a zero-exchange narrow pipeline at any
    corpus size.
    """
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand").isin(*_Q19_ENVELOPE_BRANDS)
        & F.col("p_size").between(1, 15)
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_rev_c4()).alias("revenue_c4"),
        )
    )


SQL_Q19 = f"""
SELECT count(*) AS n_rows, CAST(sum({_REV_C4_SQL}) AS BIGINT) AS revenue_c4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT EXISTS fact self-joins on one key
# ---------------------------------------------------------------------------


def q_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers (of one nation) who were the SOLE late
    shipper on finished multi-supplier orders — EXISTS (another supplier
    touched the order) + NOT EXISTS (another supplier was ALSO late), both
    as fact-to-fact self-joins.  Lateness is adapted to the testdata schema
    (no l_commitdate): shipped more than 90 days after the order date.

    Scale story: the late set is computed ONCE (fact x orders equi-join,
    lateness as a post-join filter — never a theta join, per the
    engine-wide datediff-BETWEEN ban), then both the semi- and anti-join
    legs hit it / the fact on the SAME key (l_orderkey), so all three
    shuffles co-partition and AQE reuses the exchange; the supplier +
    nation dim chain broadcasts.  Top-k is TakeOrderedAndProject.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").where(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    l1 = late.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    waited = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


SQL_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q22 shape — anti-join + per-group threshold from a scalar subquery
# ---------------------------------------------------------------------------

_Q22_CUTOFF = "2000-01-01 00:00:00"


def q_q22_dormant_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per market segment, the count and total balance of
    above-average-balance customers with NO recent orders (none since
    2000-01-01) — the "global sales opportunity" pattern: a per-group
    threshold from an aggregate subquery plus an anti-join against the
    fact table.

    The threshold compare is exact integers — acctbal_cents * cnt >
    sum_cents per segment (never a float average); the segment stats frame
    is segment-cardinality sized (broadcast), and the anti-join runs on
    o_custkey AFTER the recent-orders filter collapses the fact side.
    """
    cust = _t(spark, sf_dir, "customer").withColumn(
        "acctbal_cents", _cents("c_acctbal")
    )
    seg_stats = (
        cust.where(F.col("acctbal_cents") > 0)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("acctbal_cents").alias("sum_cents"),
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _Q22_CUTOFF)
        .select("o_custkey")
    )
    rich = cust.join(
        F.broadcast(seg_stats), F.col("c_mktsegment") == F.col("seg")
    ).where(F.col("acctbal_cents") * F.col("cnt") > F.col("sum_cents"))
    dormant = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        dormant.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("acctbal_cents").alias("balance_cents"),
        )
        .orderBy("segment")
    )


SQL_Q22 = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         {_cents_sql('c_acctbal')} AS acctbal_cents
  FROM customer
), seg_stats AS (
  SELECT c_mktsegment AS seg, count(*) AS cnt,
         sum(acctbal_cents) AS sum_cents
  FROM cust WHERE acctbal_cents > 0 GROUP BY c_mktsegment
)
SELECT c_mktsegment AS segment,
       count(*) AS n_custs,
       CAST(sum(acctbal_cents) AS BIGINT) AS balance_cents
FROM cust JOIN seg_stats ON c_mktsegment = seg
WHERE acctbal_cents * cnt > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
GROUP BY c_mktsegment
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS semi-join feeding a grouped count
# ---------------------------------------------------------------------------


def q_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders in a quarter
    had at least one LATE lineitem (shipped > 90 days after the order
    date; adapted — no l_commitdate in the testdata).  EXISTS = one
    left-semi join from the date-filtered orders to the late lineitems;
    lateness is a post-equi-join filter computed on the semi-join's own
    condition columns, never a theta join."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (
            li["l_shipdate"]
            > orders["o_orderdate"] + F.expr("INTERVAL 90 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


SQL_Q4 = """
SELECT o_orderpriority AS priority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY priority
"""


# ---------------------------------------------------------------------------
# Q6 shape — pure scan-side filter + single aggregate
# ---------------------------------------------------------------------------


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue effect of a discount-band change — a
    single table, three range predicates ALL pushed to the parquet scan,
    one aggregate, zero joins, zero shuffles of raw rows.  Revenue as
    exact cents × basis points (the discount factor itself, not its
    complement, per Q6)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.floor(F.col("l_extendedprice") * 100).cast("long") * F.floor(
        F.col("l_discount") * 10_000
    ).cast("long")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(rev).alias("discount_revenue_c4"),
    )


SQL_Q6 = """
SELECT count(*) AS n_rows,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
           * CAST(floor(l_discount * 10000) AS BIGINT))
            AS BIGINT) AS discount_revenue_c4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q8 shape — market share as two exact sums per group
# ---------------------------------------------------------------------------


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue per order
    year.  The share division never happens — numerator (target-nation
    supplier revenue) and denominator (all-region revenue) ship as two
    exact c4 bigints from ONE aggregation pass (conditional sum), the
    caller divides.  Dim chains (customer→nation→region, supplier→nation)
    broadcast; only the fact join shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_dim = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg),
                    nat["n_regionkey"] == reg["r_regionkey"],
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_dim = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("snk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_dim), orders["o_custkey"] == cust_dim["c_custkey"])
        .join(F.broadcast(supp_dim), li["l_suppkey"] == supp_dim["s_suppkey"])
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("order_year"))
        .agg(
            F.sum(
                F.when(
                    F.col("supp_nation") == "NATION_5", _rev_c4()
                ).otherwise(F.lit(0))
            ).alias("nation_c4"),
            F.sum(_rev_c4()).alias("total_c4"),
        )
        .orderBy("order_year")
    )


SQL_Q8 = f"""
SELECT strftime(o_orderdate, '%Y') AS order_year,
       CAST(sum(CASE WHEN ns.n_name = 'NATION_5' THEN {_REV_C4_SQL}
                ELSE 0 END) AS BIGINT) AS nation_c4,
       CAST(sum({_REV_C4_SQL}) AS BIGINT) AS total_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY order_year
ORDER BY order_year
"""


# ---------------------------------------------------------------------------
# Q12 shape — join + dual conditional counts
# ---------------------------------------------------------------------------


def q_q12_late_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per lateness class (adapted — no l_shipmode:
    classes are late/on-time at the 90-day mark), how many lineitems
    belong to critical-priority orders vs the rest — the join + dual
    CASE-count pattern.  One broadcast-eligible orders join (AQE decides;
    both are fact tables so it co-partitions at scale), lateness computed
    on the joined row, both counts in ONE aggregation pass."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.when(late, "late").otherwise("on-time").alias("ship_class")
        )
        .agg(
            F.sum(critical.cast("long")).alias("n_critical"),
            F.sum((~critical).cast("long")).alias("n_other"),
        )
        .orderBy("ship_class")
    )


SQL_Q12 = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
            THEN 'late' ELSE 'on-time' END AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_critical,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS n_other
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY ship_class
ORDER BY ship_class
"""


# ---------------------------------------------------------------------------
# Q13 shape — left join + two-level aggregation (count distribution)
# ---------------------------------------------------------------------------


def q_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer — LEFT
    join customers to their (filtered) orders so zero-order customers
    keep a 0 bucket, aggregate per customer, then histogram the counts.
    Two keyed aggregations; the second runs on the customer-sized frame.
    The order filter (non-URGENT) lands on the scan before the join."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"], "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy(F.desc("n_custs"), F.desc("c_count"))
    )


SQL_Q13 = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS n_custs
FROM per_cust GROUP BY c_count
ORDER BY n_custs DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q15 shape — aggregate "view" + join back on its MAX
# ---------------------------------------------------------------------------


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top supplier(s) by quarterly revenue — build
    the per-supplier revenue aggregate (the original's REVENUE view),
    take its max with a 1-row aggregate, and join back with an exact
    integer equality (revenue in c4 units, so "= max" is well-defined —
    the float original needs epsilon games).  The max broadcasts; the
    revenue frame is supplier-sized."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-04-01 00:00:00")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_c4()).alias("total_revenue_c4")
    )
    mx = revenue.agg(F.max("total_revenue_c4").alias("mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(
            F.broadcast(mx), F.col("total_revenue_c4") == F.col("mx")
        )
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_c4")
        .orderBy("s_suppkey")
    )


SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_REV_C4_SQL}) AS BIGINT) AS total_revenue_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_c4
FROM revenue
JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue_c4 = (SELECT max(total_revenue_c4) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q7 shape — symmetric pair predicate + year grouping
# ---------------------------------------------------------------------------


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations, either
    direction, grouped by (supplier nation, customer nation, ship year) —
    the symmetric-pair disjunction over two dimension chains.

    Both nation filters collapse the supplier/customer dims BEFORE the
    fact joins (each broadcast side carries only the two nations' rows);
    the OR-of-directions runs on the joined dim attributes, never as a
    join condition, so both fact joins stay equi.  Year grouping uses
    date_format for cross-engine-stable string years.
    """
    nations = ("NATION_1", "NATION_2")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("cnk"),
                                   F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .where(
            (
                (F.col("supp_nation") == nations[0])
                & (F.col("cust_nation") == nations[1])
            )
            | (
                (F.col("supp_nation") == nations[1])
                & (F.col("cust_nation") == nations[0])
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("ship_year"),
        )
        .agg(F.sum(_rev_c4()).alias("revenue_c4"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


SQL_Q7 = f"""
SELECT supp_nation, cust_nation, ship_year,
       CAST(sum(rev_c4) AS BIGINT) AS revenue_c4
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         strftime(l_shipdate, '%Y') AS ship_year,
         {_REV_C4_SQL} AS rev_c4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
     OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


# ---------------------------------------------------------------------------
# Q14 shape — conditional share without a float division
# ---------------------------------------------------------------------------


def q_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: how much of one month's revenue came from PROMO
    parts.  The classic formulation divides two sums into a percentage;
    to keep the cross-engine oracle exact the division never happens —
    the numerator (promo revenue) and denominator (total revenue) ship as
    two exact c4 bigints and the caller divides (monotone, lossless).

    One month of lineitem (filter pushed to the scan) broadcast-joined to
    part; the CASE-guarded sum and the total sum come out of the SAME
    single aggregation pass — never two scans.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01 00:00:00")
        & (F.col("l_shipdate") < "1997-10-01 00:00:00")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", _rev_c4()).otherwise(
                    F.lit(0)
                )
            ).alias("promo_c4"),
            F.sum(_rev_c4()).alias("total_c4"),
        )
    )


SQL_Q14 = f"""
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_C4_SQL} ELSE 0 END)
            AS BIGINT) AS promo_c4,
       CAST(sum({_REV_C4_SQL}) AS BIGINT) AS total_c4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# Q9 shape — product-line profit by (supplier nation, order year)
# ---------------------------------------------------------------------------
def q_q9_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for a
    product line — the widest join tree in the suite (lineitem × part ×
    supplier × nation × orders) with a signed measure.

    Testdata has no partsupp, so supply cost stands in as 60% of
    p_retailprice in exact integer arithmetic — cost_c = (retail_c · 6)
    div 10 on non-negative cents (documented stand-in, same convention
    as cheapest_supplier_per_part's price list).  Profit in c4 units:
    rev_c4 − cost_c·qty·10⁴, a SIGNED bigint summed per group (exact in
    any engine and any partitioning; |row| ≤ ~10¹¹, far under 2⁶³).

    Plan: the p_name filter collapses part BEFORE anything joins (the
    product line is a small fraction of the part dim → broadcast), the
    supplier→nation chain broadcasts, and the only fact-fact join is
    lineitem ⋈ orders on l_orderkey — co-partitioned SMJ at scale, AQE
    broadcast at test SF; grouping is ≤ nations × years cells,
    map-side combined."""
    part_line = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("red"))
        .select(
            F.col("p_partkey").alias("l_partkey"),
            (
                F.expr("(CAST(floor(p_retailprice * 100) AS BIGINT) * 6) div 10")
            ).alias("cost_c"),
        )
    )
    sup_nat = (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("s_nationkey"), "n_name"
                )
            ),
            "s_nationkey",
        )
        .select("l_suppkey", "n_name")
    )
    ord_year = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.year("o_orderdate").alias("o_year"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        _rev_c4().alias("rev_c4"),
        _qty().alias("qty"),
    )
    return (
        li.join(F.broadcast(part_line), "l_partkey")
        .join(F.broadcast(sup_nat), "l_suppkey")
        .join(ord_year, "l_orderkey")
        .groupBy("n_name", "o_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.col("rev_c4")
                - F.col("cost_c") * F.col("qty") * F.lit(10_000)
            )
            .cast("long")
            .alias("profit_c4"),
        )
        .orderBy("n_name", "o_year")
    )


SQL_Q9 = f"""
WITH part_line AS (
  SELECT p_partkey AS l_partkey,
         (CAST(floor(p_retailprice * 100) AS BIGINT) * 6) // 10 AS cost_c
  FROM part WHERE p_name LIKE '%red%'
), sup_nat AS (
  SELECT s_suppkey AS l_suppkey, n_name
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
)
SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum({_REV_C4_SQL}
                - cost_c * CAST(floor(l_quantity) AS BIGINT) * 10000)
            AS BIGINT) AS profit_c4
FROM lineitem
JOIN part_line USING (l_partkey)
JOIN sup_nat USING (l_suppkey)
JOIN orders ON o_orderkey = l_orderkey
GROUP BY n_name, o_year
ORDER BY n_name, o_year
"""


# ---------------------------------------------------------------------------
# Q11 shape — group value vs a scalar-subquery fraction-of-total threshold
# ---------------------------------------------------------------------------
_Q11_NATIONS = ("NATION_3", "NATION_8")  # both present at every testdata SF


def q_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock) adapted to the testdata schema
    (no partsupp — lineitem value stands in for supply value): per part,
    the summed line value shipped by suppliers of the pinned nations,
    keeping parts whose value exceeds 1/1000 of the national total — the
    HAVING-against-a-scalar-subquery shape, decorrelated as a 1-row
    broadcast.  Integer cents throughout; the threshold compare is
    ``value_c * 1000 > total_c`` (no fractions), share reported in ppm
    via non-negative ``div``.  Scale: the dim chain broadcasts, the fact
    groupBy map-side combines to part cardinality, the total is a 1-row
    stat frame — the one fact shuffle is the per-part aggregation."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _cents("l_extendedprice").alias("val_c")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*_Q11_NATIONS))
        .select("n_nationkey")
    )
    nat_sup = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    per = (
        li.join(F.broadcast(nat_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("val_c").cast("long").alias("value_c"))
    )
    tot = per.agg(F.sum("value_c").cast("long").alias("total_c"))
    return (
        per.crossJoin(F.broadcast(tot))
        .where(F.expr("value_c * 1000 > total_c"))
        .select(
            "l_partkey",
            "value_c",
            F.expr("(value_c * 1000000) div total_c").alias("share_ppm"),
        )
        .orderBy(F.desc("value_c"), "l_partkey")
    )


SQL_Q11 = f"""
WITH nat_sup AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('{_Q11_NATIONS[0]}', '{_Q11_NATIONS[1]}')
), per AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_c
  FROM lineitem JOIN nat_sup ON l_suppkey = s_suppkey
  GROUP BY l_partkey
), tot AS (
  SELECT CAST(sum(value_c) AS BIGINT) AS total_c FROM per
)
SELECT l_partkey, value_c,
       CAST((value_c * 1000000) // total_c AS BIGINT) AS share_ppm
FROM per, tot
WHERE value_c * 1000 > total_c
ORDER BY value_c DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Q16 shape — multi-attribute supplier counts with a NOT-IN exclusion set
# ---------------------------------------------------------------------------
_Q16_SIZES = (1, 4, 9, 14, 19, 24, 29, 34)


def q_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship) adapted: the
    part↔supplier relation comes from DISTINCT lineitem pairs instead of
    partsupp; the complaint exclusion becomes suppliers with negative
    account balance (empty at sf0.001, bites at sf0.01+ — the anti-join
    shape is exercised either way).  Predicates keep Q16's form: brand
    excluded, type excluded, size IN-list.  Scale: both broadcast joins
    sit BELOW the distinct, so the one fact exchange carries only
    filter-surviving (attrs, suppkey) rows after map-side dedup — a 9×
    smaller shuffle than distinct-then-filter (census-measured, 613 460
    → 68 095 records at sf0.1); counts then group at
    attribute-combination cardinality."""
    pf = (
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#2")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(*_Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_Q16 = f"""
WITH rel AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM rel JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#2'
  AND p_type <> 'MEDIUM'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 shape — nested semi-join chain with a correlated aggregate threshold
# ---------------------------------------------------------------------------
def q_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion) adapted: a supplier
    qualifies when, for SOME name-filtered part, their 1997 shipped
    quantity exceeds a quarter of that part's total 1997 shipments
    (partsupp availability → shipped-share threshold; the correlated
    aggregate is decorrelated into two groupBys joined on the part).
    Output is the pinned nations' qualifying suppliers via a left-semi
    join — Q20's nested-IN chain.  Integer quantities; the threshold is
    ``qty_ps * 4 > qty_p`` (no fractions).  Scale: the name filter
    collapses part to a broadcast; both aggregates map-side combine and
    share the (part, supplier)-grain shuffle; supplier×nation is a dim
    broadcast; the semi-join probes a supplier-sized distinct frame."""
    pf = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    l97 = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1998-01-01 00:00:00")
        )
        .select("l_partkey", "l_suppkey", _qty().alias("qty"))
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
    )
    ps = l97.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").cast("long").alias("qty_ps")
    )
    ptot = l97.groupBy("l_partkey").agg(
        F.sum("qty").cast("long").alias("qty_p")
    )
    qual = (
        ps.join(ptot, "l_partkey")
        .where(F.expr("qty_ps * 4 > qty_p"))
        .select("l_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*_Q11_NATIONS))
        .select("n_nationkey", "n_name")
    )
    return (
        sup.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


SQL_Q20 = f"""
WITH l97 AS (
  SELECT l_partkey, l_suppkey, CAST(floor(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
), ps AS (
  SELECT l_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS qty_ps
  FROM l97 GROUP BY l_partkey, l_suppkey
), ptot AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS qty_p
  FROM l97 GROUP BY l_partkey
), qual AS (
  SELECT DISTINCT l_suppkey
  FROM ps JOIN ptot USING (l_partkey)
  WHERE qty_ps * 4 > qty_p
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('{_Q11_NATIONS[0]}', '{_Q11_NATIONS[1]}')
  AND s_suppkey IN (SELECT l_suppkey FROM qual)
ORDER BY s_suppkey
"""


TPCH_QUERIES = {
    "q17_small_quantity": q_q17_small_quantity,
    "q18_large_orders": q_q18_large_orders,
    "q19_disjunctive": q_q19_disjunctive,
    "q21_waiting_suppliers": q_q21_waiting_suppliers,
    "q22_dormant_value": q_q22_dormant_value,
    "q7_nation_volume": q_q7_nation_volume,
    "q14_promo_share": q_q14_promo_share,
    "q4_priority_check": q_q4_priority_check,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q8_market_share": q_q8_market_share,
    "q13_order_distribution": q_q13_order_distribution,
    "q15_top_supplier": q_q15_top_supplier,
    "q12_late_by_priority": q_q12_late_by_priority,
    "q9_profit_rollup": q_q9_profit_rollup,
    "q11_important_stock": q_q11_important_stock,
    "q16_supplier_counts": q_q16_supplier_counts,
    "q20_potential_promotion": q_q20_potential_promotion,
}

TPCH_ORACLES = {
    "q17_small_quantity": SQL_Q17,
    "q18_large_orders": SQL_Q18,
    "q19_disjunctive": SQL_Q19,
    "q21_waiting_suppliers": SQL_Q21,
    "q22_dormant_value": SQL_Q22,
    "q7_nation_volume": SQL_Q7,
    "q14_promo_share": SQL_Q14,
    "q4_priority_check": SQL_Q4,
    "q6_forecast_revenue": SQL_Q6,
    "q8_market_share": SQL_Q8,
    "q13_order_distribution": SQL_Q13,
    "q15_top_supplier": SQL_Q15,
    "q12_late_by_priority": SQL_Q12,
    "q9_profit_rollup": SQL_Q9,
    "q11_important_stock": SQL_Q11,
    "q16_supplier_counts": SQL_Q16,
    "q20_potential_promotion": SQL_Q20,
}
