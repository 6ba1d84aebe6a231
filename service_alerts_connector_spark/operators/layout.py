"""Write-time data layout: Z-order (Morton) clustering keys.

Multi-dimensional locality for the lake's big tables: sorting a table by
the bit-interleaved key of two columns co-locates rows that are close in
BOTH dimensions, so min/max parquet zone maps prune scans with predicates
on either column — the engine-side analogue of Delta's OPTIMIZE ZORDER.

The key is a pure integer expression (16 bits per dimension interleaved
into one bigint): JVM-side, codegen-friendly, and bit-identical in any
engine — the catalog oracles the key itself, and ``write_zordered`` is the
writer that applies it (repartitionByRange on the key → sortWithinPartitions
→ parquet, so each output file owns a compact Z-curve segment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1.  Built as a sum
    of masked shifts — every term is exact integer arithmetic."""
    xb = x.cast("bigint") % (1 << bits)
    yb = y.cast("bigint") % (1 << bits)
    total: Column | None = None
    for i in range(bits):
        xbit = F.shiftleft(F.shiftright(xb, i) % 2, 2 * i)
        ybit = F.shiftleft(F.shiftright(yb, i) % 2, 2 * i + 1)
        term = xbit + ybit
        total = term if total is None else total + term
    assert total is not None
    return total


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical key as DuckDB SQL (for oracles and off-engine
    verification)."""
    parts = []
    for i in range(bits):
        parts.append(
            f"(((CAST({x} AS BIGINT) % {1 << bits}) // {1 << i}) % 2) * {1 << (2 * i)}"
        )
        parts.append(
            f"(((CAST({y} AS BIGINT) % {1 << bits}) // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(parts) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files, each owning a compact
    segment of the Z-curve over (x, y): range-partition on the key, sort
    within partitions, drop the key.  Readers filtering on either column
    then skip most files via parquet min/max zone maps."""
    keyed = df.withColumn("_z", zorder_key(F.col(x_col), F.col(y_col), bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Pre-shuffle ONCE at write time: hash-bucket the table on its join
    key so every later join between same-bucketed tables is exchange-free
    — the scan itself reports HashPartitioning(bucket key, n), and with
    ``sort_cols`` the per-bucket sort is on disk too, so a sort-merge
    join needs neither Exchange nor (when sorted) Sort.  This is how a
    lake co-locates its fact↔fact joins at 100 TB: the shuffle is paid
    once per table rewrite, not once per query.

    Registered as an EXTERNAL table at ``path`` (bucket metadata lives in
    the session catalog — Spark's bucketing, unlike partitioning, is not
    self-describing in the files; production lakes keep it in the
    metastore the same way).  Read back with ``spark.table(table)``.
    Pinned by tests/test_layout.py::test_bucketed_join_is_exchange_free.
    """
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer.saveAsTable(table)


def equi_depth_bounds_with_cells(
    df: DataFrame, col: str, k: int = 8, bucket_width: int = 1 << 20
) -> tuple[list[int], DataFrame]:
    """``compute_equi_depth_bounds`` plus the pinned histogram CELLS frame
    (columns ``v``, ``cnt``, ``bucket``) it reduced the input to.  The
    bounds collect has already materialized the cells' localCheckpoint, so
    a caller that must ASSIGN rows to the computed ranges and only needs
    per-value aggregates (counts, spans — anything value-determined) can
    run on the pinned cells instead of re-scanning the fact table: one
    corpus scan + histogram shuffle for the whole plan instead of two
    (guide §1.2; the oracle SQL has always assigned on cells)."""
    cells = (
        df.select(F.col(col).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bucket", F.expr(f"v div {bucket_width}"))
        .localCheckpoint(eager=False)
    )
    buckets = cells.groupBy("bucket").agg(F.sum("cnt").alias("bw"))
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
    from pyspark.sql import Window

    w_inb = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = cells.agg(F.sum("cnt").alias("n"))
    ranked = (
        cells.join(F.broadcast(offsets), "bucket")
        .select("v", (F.col("boff") + F.sum("cnt").over(w_inb)).alias("cum"))
        .crossJoin(F.broadcast(totals))
    )
    # one parsed string per bound instead of ~10 py4j Column calls each
    # (identical expression; see similarity.projection_sql rationale)
    row = ranked.agg(
        *[
            F.expr(
                f"min(CASE WHEN cum >= greatest(CAST(1 AS BIGINT),"
                f" ({q} * n) div {k}) THEN v END)"
            ).alias(f"b{q}")
            for q in range(1, k)
        ],
        F.max("v").alias(f"b{k}"),
    ).collect()[0]
    return [int(row[f"b{q}"]) for q in range(1, k + 1)], cells


def compute_equi_depth_bounds(
    df: DataFrame, col: str, k: int = 8, bucket_width: int = 1 << 20
) -> list[int]:
    """Exact k-quantile upper bounds of an integer column — the split
    points a range layout / global sort needs, via the catalog-certified
    two-phase prefix (``equi_depth_histogram``'s shape: histogram cells,
    domain-bucket offsets from a bounded self-join, bucket-partitioned
    running rank; NEVER an unpartitioned window).  Returns k ascending
    bounds; the k-th is the column max.  The ≤k-row collect is a stat
    frame, not data (same budget as the other driver-side bound joins)."""
    return equi_depth_bounds_with_cells(df, col, k, bucket_width)[0]


def write_range_partitioned(
    df: DataFrame, path: str, col: str, bounds: list[int]
) -> None:
    """Range layout from PRECOMPUTED bounds (``compute_equi_depth_bounds``
    or the versioned stats store): each output file owns one value range,
    sorted — so range predicates prune to the files they touch and a
    downstream merge-sort reads presorted runs.  Unlike
    ``repartitionByRange`` this is deterministic (no sampling): the file
    a row lands in is a pure function of its value and the bound list —
    reproducible across clusters, which is what a 100 TB nightly rewrite
    wants from its layout step."""
    bnds = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("q"),
                F.lit(int(b)).cast("long").alias("ub"),
            )
            for i, b in enumerate(bounds)
        ]
    )
    keyed = (
        df.withColumn("_bnds", bnds)
        .withColumn(
            "_range_id",
            F.coalesce(
                F.expr(f"array_min(filter(_bnds, x -> {col} <= x.ub)).q"),
                F.lit(len(bounds)),  # values past the recorded max
            ),
        )
        .drop("_bnds")
    )
    # hash-repartition on the range id co-locates each range in ONE task,
    # and partitionBy makes the layout self-describing on disk: exactly
    # one sorted file per _range_id directory (a hash collision only
    # means one task writes two directories, never a split range)
    (
        keyed.repartition(len(bounds), "_range_id")
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .partitionBy("_range_id")
        .parquet(path)
    )
