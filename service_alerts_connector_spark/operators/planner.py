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


def analyze_byte_stats(df: DataFrame, table: str) -> DataFrame:
    """Per-column ANALYZE byte statistics: ONE map-side-combined aggregate
    over the table → a ≤#columns-row frame (tbl, col, n_rows, byte_sum)
    that a versioned stats store persists (``sources/parquet_io
    write_dataset``), so every later join prices any PROJECTION of the
    table from the store without rescanning it — the 100 TB path of
    ``stats_driven_join``'s ``est_bytes`` short-circuit.  String/binary
    columns carry their exact octet sums; fixed-width columns derive
    byte_sum as width × n_rows inside the same single-row aggregate."""
    dt = dict(df.dtypes)
    var_cols = [c for c in df.columns if dt[c] in ("string", "binary")]
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")] + [
        F.sum(
            F.coalesce(F.octet_length(F.col(c)).cast("long"), F.lit(0))
        ).alias(f"_b{i}")
        for i, c in enumerate(var_cols)
    ]
    var_idx = {c: i for i, c in enumerate(var_cols)}
    one = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(table).alias("tbl"),
            F.lit(c).alias("col"),
            F.col("_n").alias("n_rows"),
            (
                F.coalesce(F.col(f"_b{var_idx[c]}"), F.lit(0))
                if c in var_idx
                else F.col("_n") * F.lit(_NUMERIC_WIDTH.get(dt[c], 8))
            ).cast("long").alias("byte_sum"),
        )
        for c in df.columns
    ]
    return one.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def est_ndv_from_store(
    stats_cells: DataFrame, cols: list[str]
) -> dict[str, tuple[int, int]]:
    """{col → (n_rows, ndv)} for the named columns from a persisted
    colstats CELL store (``operators/colstats.column_cells`` layout,
    ledger rows tolerated) — the NDV sibling of ``est_bytes_from_store``.
    The collect touches ≤#columns stat rows, never the analyzed table,
    so a join-order decision consulting the store pays nothing per plan
    (the O(n) DISTINCT shuffle happens ONCE, in the amortized ANALYZE
    ingest — ``incremental_column_stats_ingest``).  Raises on a column
    with no cells: a silent 0 NDV would make the System-R estimator
    divide by the floor guard and wildly over-estimate."""
    from service_alerts_connector_spark.operators.colstats import (
        ndv_from_cells,
    )

    rows = ndv_from_cells(
        stats_cells.where(F.col("col_name").isin(list(cols)))
    ).collect()
    per = {r["col_name"]: (int(r["n_rows"]), int(r["ndv"])) for r in rows}
    missing = [c for c in cols if c not in per]
    if missing:
        raise ValueError(
            f"columns {missing} have no cells in the colstats store"
        )
    return per


def est_ndv_from_hll_store(
    registers: DataFrame, cols: list[str]
) -> dict[str, int]:
    """{col → estimated NDV} from a persisted HLL register store keyed by
    ``col_name`` (built by feeding ``colstats.column_pairs`` through
    ``sketches.incremental_hll_ingest(key_col="val",
    group_cols=["col_name"])``) — the SKETCH path of the ANALYZE tier for
    high-NDV keys, where ``est_ndv_from_store``'s exact cells would cost
    Σ NDV(col) store rows: the register store holds ≤ cols × m rows
    (m = 256) however many distinct values exist, at the price of the raw
    HLL error (~1.04/√m ≈ 6.5% σ; no linear-counting correction — in the
    low-NDV regime use the exact cells, they're small there by
    definition).  Raises on a column with no registers."""
    from service_alerts_connector_spark.operators.sketches import (
        hll_estimate,
    )

    rows = hll_estimate(
        registers.where(F.col("col_name").isin(list(cols))), ["col_name"]
    ).collect()
    per = {r["col_name"]: int(r["hll_estimate"]) for r in rows}
    missing = [c for c in cols if c not in per]
    if missing:
        raise ValueError(
            f"columns {missing} have no registers in the HLL store"
        )
    return per


def join_order_decision(spark, stats: dict[str, int]) -> DataFrame:
    """System-R left-deep order selection for customer ⋈ orders ⋈
    lineitem from ALREADY-COLLECTED exact statistics — the driver-side
    decision a cost-based optimizer makes once the ANALYZE store has
    answered (``est_ndv_from_store``).  Pure integer arithmetic on the 7
    stat values (floor division on non-negative operands, divisors
    floored at 1 — identical semantics to ``catalog_stats
    q_join_order_plan``'s in-engine expressions), folded into a literal
    2-row DataFrame: the returned plan contains NO table scan and NO
    shuffle (pinned in tests/test_plan_shapes.py) — choosing the order
    for a petabyte join costs four stat rows.

    ``stats`` keys: n_l, ndv_l_ok, n_o, ndv_o_ok, ndv_o_ck, n_c,
    ndv_c_ck (the stat frame ``catalog_stats.q_join_order_plan_stored``
    assembles from the cell store)."""
    n_l, n_o, n_c = stats["n_l"], stats["n_o"], stats["n_c"]
    i_lo = (n_l * n_o) // max(stats["ndv_l_ok"], stats["ndv_o_ok"], 1)
    i_oc = (n_o * n_c) // max(stats["ndv_o_ck"], stats["ndv_c_ck"], 1)
    t_lo = (i_lo * n_c) // max(stats["ndv_o_ck"], stats["ndv_c_ck"], 1)
    t_oc = (i_oc * n_l) // max(stats["ndv_o_ok"], stats["ndv_l_ok"], 1)
    c_lo, c_oc = i_lo + t_lo, i_oc + t_oc
    # rows emitted pre-sorted by order_name: an orderBy here would plan a
    # rangepartitioning Exchange on the 2-row literal frame for nothing
    rows = [
        ("lineitem_orders_first", i_lo, t_lo, c_lo, c_lo <= c_oc),
        ("orders_customer_first", i_oc, t_oc, c_oc, c_oc < c_lo),
    ]
    return spark.createDataFrame(
        rows,
        "order_name string, est_intermediate long, est_total long, "
        "cost long, chosen boolean",
    )


def salting_decision_from_cells(
    cells: DataFrame,
    parts: int = 32,
    factor: int = 4,
    tbl: str | None = None,
) -> DataFrame:
    """Per-column skew-salting decision from a colstats CELL frame (raw
    ``column_cells`` output or a persisted store version — ledger rows
    excluded): salt exactly when the hottest value's count exceeds
    ``factor ×`` the average reducer share at ``parts`` partitions, AQE's
    skewedPartitionFactor rule applied at plan time.  The third
    store-fed decision beside ``est_bytes_from_store`` (broadcast) and
    ``est_ndv_from_store`` (join order): against a persisted store the
    input is ≤ Σ NDV(col) cell rows, never the analyzed table.  The MCV
    is derived engine-portably via the padded-selector max
    (lpad(cnt,12,'0')|val — unique per cell, no arg_max tie-break
    trouble); all arithmetic is non-negative integer div with
    greatest(...,1) floors, so the DuckDB oracle of
    ``catalog_stats.q_skew_salting_decision`` certifies this exact
    logic.

    The NULL cell is part of the skew test: in an aggregate-shaped
    shuffle every NULL key hashes to ONE reducer exactly like a hot
    value, so the decision fires on ``hot_cnt = greatest(mcv1_cnt,
    null_cnt)`` and the frame carries ``null_cnt`` beside ``mcv1_cnt``
    so NULL-hot columns stay visible to consumers (a join-shaped caller,
    where NULL keys never match and are usually pruned, can re-test on
    ``mcv1_cnt`` alone from the same row)."""
    from service_alerts_connector_spark.operators.colstats import _LEDGER

    nn = F.col("val").isNotNull()
    stats = (
        cells.where(F.col("col_name") != _LEDGER)
        .groupBy("col_name")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.when(nn, F.lit(1))).cast("long").alias("ndv"),
            F.max(F.when(nn, F.col("cnt"))).cast("long").alias("mcv1_cnt"),
            F.coalesce(F.sum(F.when(~nn, F.col("cnt"))), F.lit(0))
            .cast("long")
            .alias("null_cnt"),
            F.max(
                F.when(
                    nn,
                    F.concat(
                        F.lpad(F.col("cnt").cast("string"), 12, "0"),
                        F.lit("|"),
                        F.col("val"),
                    ),
                )
            ).alias("_sel"),
        )
    )
    head = [F.lit(tbl).alias("tbl")] if tbl is not None else []
    return stats.select(
        *head,
        F.col("col_name").alias("col"),
        "n_rows",
        "ndv",
        F.expr("substring(_sel, 14)").alias("mcv1"),
        "mcv1_cnt",
        "null_cnt",
        F.expr("greatest(coalesce(mcv1_cnt, 0), null_cnt)").alias("hot_cnt"),
        F.expr("n_rows div greatest(ndv, 1)").alias("avg_per_key"),
        F.expr(
            "CAST(greatest(coalesce(mcv1_cnt, 0), null_cnt) * 1000000 "
            "div greatest(n_rows, 1) AS BIGINT)"
        ).alias("hot_share_ppm"),
        F.expr(
            f"CASE WHEN greatest(coalesce(mcv1_cnt, 0), null_cnt) "
            f"> {factor} * greatest(n_rows div {parts}, 1) "
            "THEN 'salt' ELSE 'plain' END"
        ).alias("decision"),
    )


def stats_driven_aggregate(
    df: DataFrame,
    keys: list[str],
    phase1: list[Column],
    phase2: list[Column],
    cells: DataFrame,
    key_cols: list[str] | None = None,
    parts: int = 32,
    factor: int = 4,
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """GroupBy whose physical shape is chosen by the persisted ANALYZE
    cell store — the runtime consumer that closes the stats→plan
    trilogy's third loop, the exact analogue of ``stats_driven_join``'s
    byte-threshold switch: ``salting_decision_from_cells`` against the
    store says ``salt`` → dispatch to ``skew.salted_aggregate``'s
    two-phase plan (hot key spread over ``salt_buckets`` reducers, one
    extra |keys|×buckets partial-row shuffle); ``plain`` → one ordinary
    ``groupBy(*keys).agg(*phase1)``.  Both paths return the same schema
    (``phase2`` merges the phase-1 partials under the same aliases —
    see ``salted_aggregate``'s contract).

    ``key_cols`` names the store columns to consult (default: ``keys``);
    salting fires when ANY consulted column decides ``salt`` —
    conservative-safe for composite keys, since one hot component can
    concentrate a reducer however the other components spread, and a
    needless salt costs only the cheap partial shuffle.  Raises when a
    consulted column has no cells: a silent ``plain`` on an unmeasured
    key is exactly the melted-reducer case the decision exists to
    prevent.  Against a persisted store the decision reads ≤ Σ NDV(col)
    cell rows, never the aggregated table."""
    from service_alerts_connector_spark.operators.skew import (
        salted_aggregate,
    )

    consult = list(key_cols) if key_cols is not None else list(keys)
    rows = salting_decision_from_cells(
        cells.where(F.col("col_name").isin(consult)),
        parts=parts,
        factor=factor,
    ).collect()
    per = {r["col"]: r["decision"] for r in rows}
    missing = [c for c in consult if c not in per]
    if missing:
        raise ValueError(
            f"columns {missing} have no cells in the colstats store"
        )
    if any(per[c] == "salt" for c in consult):
        return salted_aggregate(
            df, keys, phase1, phase2, salt_buckets=salt_buckets, seed=seed
        )
    return df.groupBy(*keys).agg(*phase1)


def est_bytes_from_cells(
    cells: DataFrame, cols: list[str]
) -> tuple[int, int]:
    """(n_rows, est_bytes) for a STRING projection read from a persisted
    colstats CELL store — the byte leg of the one-store trilogy: the
    same ``column_cells`` version that answers NDV (join order,
    ``est_ndv_from_store``) and MCV (salting) also prices broadcasts,
    because each cell carries the value text whose
    ``octet_length × cnt`` is exactly the column's data bytes.  Only
    exact for columns whose cell ``val`` IS the stored representation
    (strings; the cells hold the ANALYZE-time string cast, so a numeric
    column would price its decimal rendering instead of its fixed
    width — use ``analyze_byte_stats``/``est_bytes_from_store`` for
    mixed projections).  Ledger sentinel rows excluded; raises on a
    column with no cells (a silent 0 would broadcast an unmeasured
    side).  NULL cells count toward n_rows and add 0 bytes, matching
    ``row_bytes_expr``'s coalesce-to-0."""
    from service_alerts_connector_spark.operators.colstats import _LEDGER

    rows = (
        cells.where(
            (F.col("col_name") != _LEDGER)
            & F.col("col_name").isin(list(cols))
        )
        .groupBy("col_name")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.octet_length("val").cast("long") * F.col("cnt")),
                F.lit(0),
            ).alias("byte_sum"),
        )
        .collect()
    )
    per = {r["col_name"]: (int(r["n_rows"]), int(r["byte_sum"])) for r in rows}
    missing = [c for c in cols if c not in per]
    if missing:
        raise ValueError(
            f"columns {missing} have no cells in the colstats store"
        )
    n_rows = max(v[0] for v in per.values())
    return n_rows, sum(per[c][1] for c in per)


def est_bytes_from_store(
    stats: DataFrame, table: str, cols: list[str] | None = None
) -> tuple[int, int]:
    """(n_rows, est_bytes) for the projection ``cols`` (default: every
    ANALYZEd column) of ``table``, read from a persisted
    ``analyze_byte_stats`` frame.  The collect touches ≤#columns stat
    rows — never the table — so a planner consulting the store pays
    nothing per join.  Raises if the table (or a requested column) has
    no stats row: a silent 0 estimate would broadcast an unmeasured
    side."""
    rows = stats.where(F.col("tbl") == table).collect()
    per = {r["col"]: (int(r["n_rows"]), int(r["byte_sum"])) for r in rows}
    if not per:
        raise ValueError(f"no ANALYZE byte stats for table {table!r}")
    pick = list(cols) if cols is not None else list(per)
    missing = [c for c in pick if c not in per]
    if missing:
        raise ValueError(
            f"columns {missing} of {table!r} have no ANALYZE stats row"
        )
    n_rows = max(v[0] for v in per.values())
    return n_rows, sum(per[c][1] for c in pick)
