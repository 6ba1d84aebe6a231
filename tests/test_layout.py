"""Z-order clustering key + writer."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.layout import (
    write_zordered,
    zorder_key,
)


def test_zorder_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(3, 1), (0, 0), (1, 0), (0, 1), (65535, 65535)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1   # x bit 0 -> position 0
    assert got[(0, 1)] == 2   # y bit 0 -> position 1
    assert got[(3, 1)] == 7   # 0b0111
    assert got[(65535, 65535)] == (1 << 32) - 1  # all 32 low bits set


def test_zorder_locality_beats_linear_sort(spark):
    # neighbours in (x, y) space are closer in z than in a concat key
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    z = {(r["x"], r["y"]): r["z"] for r in rows}
    # the 4 cells of any aligned 2x2 block occupy 4 CONSECUTIVE z values
    for bx, by in [(0, 0), (2, 4), (14, 14)]:
        block = sorted(z[(bx + dx, by + dy)] for dx in (0, 1) for dy in (0, 1))
        assert block == list(range(block[0], block[0] + 4))


def test_write_zordered_files_and_roundtrip(spark, tmp_path):
    import glob

    df = spark.createDataFrame(
        [(i, (i * 7) % 100, (i * 13) % 100) for i in range(2000)],
        "id long, x long, y long",
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, "x", "y", n_files=8)
    files = glob.glob(f"{path}/part-*.parquet")
    assert 1 <= len(files) <= 8
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert set(back.columns) == {"id", "x", "y"}  # key column dropped


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count must
    sort-merge join with ZERO Exchange (and zero Sort when sortBy matches
    the join key) — the write-once-shuffle-never contract; results must
    equal the plain join."""
    from pyspark.sql import functions as F

    from service_alerts_connector_spark.operators.layout import (
        write_bucketed,
    )

    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
    )
    orders = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
    )
    write_bucketed(li, "li_b", str(tmp_path / "li"), ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_b", str(tmp_path / "ord"), ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: the shuffle was paid at write
        n_bucketed = joined.count()
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        n_plain = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert n_bucketed == n_plain and n_plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_equi_depth_bounds_match_catalog_histogram(spark):
    """compute_equi_depth_bounds on orders cents == the oracled
    equi_depth_histogram's ub_c column (same rank definition, same
    two-phase machinery — the operator is the reusable form)."""
    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.catalog_stats import (
        q_equi_depth_histogram,
    )
    from service_alerts_connector_spark.operators.layout import (
        compute_equi_depth_bounds,
    )

    sf = "/root/testdata/sf0.001"
    cents = _t(spark, sf, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    bounds = compute_equi_depth_bounds(cents, "c", k=8)
    hist = {r["bucket_id"]: r["ub_c"] for r in q_equi_depth_histogram(spark, sf).collect()}
    # the histogram omits empty buckets; every present bucket's ub must
    # equal the operator's bound at that index
    for q, ub in hist.items():
        assert bounds[q - 1] == ub, (q, ub, bounds)
    assert bounds == sorted(bounds)


def test_write_range_partitioned_balanced_and_disjoint(spark, tmp_path):
    """The written layout delivers the histogram's promise: one sorted
    file per range directory, per-range row counts equal to the
    histogram's n_rows, ranges disjoint, and a range predicate prunes to
    the directories it touches (partition filter in the scan)."""
    import glob

    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.catalog_stats import (
        q_equi_depth_histogram,
    )
    from service_alerts_connector_spark.operators.layout import (
        compute_equi_depth_bounds,
        write_range_partitioned,
    )

    sf = "/root/testdata/sf0.001"
    cents = _t(spark, sf, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    bounds = compute_equi_depth_bounds(cents, "c", k=8)
    path = str(tmp_path / "ranged")
    write_range_partitioned(cents, path, "c", bounds)

    # one file per non-empty range directory
    for d in glob.glob(f"{path}/_range_id=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d

    back = spark.read.parquet(path)
    per_range = {
        r["_range_id"]: (r["n"], r["lo"], r["hi"])
        for r in back.groupBy("_range_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("lo"),
            F.max("c").alias("hi"),
        )
        .collect()
    }
    hist = {
        r["bucket_id"]: r for r in q_equi_depth_histogram(spark, sf).collect()
    }
    assert set(per_range) == set(hist)
    ordered = sorted(per_range.items())
    for (q, (n, lo, hi)), (q2, (n2, lo2, _)) in zip(ordered, ordered[1:]):
        assert hi < lo2  # disjoint, ordered ranges
    for q, (n, lo, hi) in per_range.items():
        assert n == hist[q]["n_rows"]
        assert hi <= hist[q]["ub_c"]

    # a range predicate prunes at the directory level
    pruned = back.where(F.col("_range_id") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == hist[3]["n_rows"]
