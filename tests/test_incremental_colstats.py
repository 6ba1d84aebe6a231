"""Incremental ANALYZE maintenance: additive count merges need the
exactly-once ledger (HLL's max-merge tolerates redelivery; counts would
double).  Pins multi-batch ≡ batch-mode equality, committed-redelivery
no-op, crash-before-snapshot convergence WITHOUT double counting, torn
version dirs staying invisible, and store boundedness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import service_alerts_connector_spark.sources.parquet_io as pio
from service_alerts_connector_spark.operators.colstats import (
    COLSTATS_STORE,
    column_cells,
    incremental_column_stats_ingest,
    stats_from_cells,
)
from service_alerts_connector_spark.sources.parquet_io import list_versions


@pytest.fixture()
def crash_before_snapshot(monkeypatch):
    real = pio.write_dataset
    state = {"armed": False}

    def wrapper(df, root, dataset, **kw):
        if state["armed"]:
            state["armed"] = False
            kw["latest_copy"] = False
            real(df, root, dataset, **kw)
            raise RuntimeError("injected crash: died before snapshot refresh")
        return real(df, root, dataset, **kw)

    monkeypatch.setattr(pio, "write_dataset", wrapper)
    return lambda: state.update(armed=True)


def _cols():
    return [
        ("grp", F.col("grp").cast("string")),
        ("parity", (F.col("k") % 2).cast("string")),
    ]


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_multi_batch_equals_batch_mode(spark, tmp_path):
    root = str(tmp_path)
    b1, b2, b3 = (
        _batch(spark, 0, 300),
        _batch(spark, 300, 450),
        _batch(spark, 450, 1_000),
    )
    incremental_column_stats_ingest(spark, root, b1, _cols(), "b1")
    incremental_column_stats_ingest(spark, root, b2, _cols(), "b2")
    stats = incremental_column_stats_ingest(spark, root, b3, _cols(), "b3")

    union = b1.unionByName(b2).unionByName(b3)
    assert _rows(stats) == _rows(stats_from_cells(column_cells(union, _cols())))


def test_committed_redelivery_is_noop(spark, tmp_path):
    root = str(tmp_path)
    b1 = _batch(spark, 0, 500)
    first = incremental_column_stats_ingest(spark, root, b1, _cols(), "b1")
    v_before = list_versions(root, COLSTATS_STORE)
    again = incremental_column_stats_ingest(spark, root, b1, _cols(), "b1")
    assert list_versions(root, COLSTATS_STORE) == v_before  # nothing written
    assert _rows(first) == _rows(again)  # and nothing double-counted


def test_crash_before_snapshot_redelivery_does_not_double_count(
    spark, tmp_path, crash_before_snapshot
):
    """The discriminating case versus the HLL store: the version commit
    SUCCEEDED (counts + ledger atomically), only the snapshot refresh
    died.  The redelivered batch must be recognized via the ledger and
    skipped — an unledgered additive merge would double every b2 cell."""
    root = str(tmp_path)
    b1, b2 = _batch(spark, 0, 400), _batch(spark, 350, 800)
    incremental_column_stats_ingest(spark, root, b1, _cols(), "b1")

    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_column_stats_ingest(spark, root, b2, _cols(), "b2")

    stats = incremental_column_stats_ingest(spark, root, b2, _cols(), "b2")
    union = b1.unionByName(b2)
    assert _rows(stats) == _rows(stats_from_cells(column_cells(union, _cols())))


def test_torn_version_dir_invisible_and_swept(spark, tmp_path):
    root = str(tmp_path)
    b1 = _batch(spark, 0, 300)
    incremental_column_stats_ingest(spark, root, b1, _cols(), "b1")
    good = list_versions(root, COLSTATS_STORE)

    torn = tmp_path / COLSTATS_STORE / "versions" / "99991231T235959999999"
    torn.mkdir(parents=True)
    (torn / "part-00000.parquet").write_bytes(b"\x00garbage")
    assert list_versions(root, COLSTATS_STORE) == good

    b2 = _batch(spark, 300, 600)
    stats = incremental_column_stats_ingest(spark, root, b2, _cols(), "b2")
    union = b1.unionByName(b2)
    assert _rows(stats) == _rows(stats_from_cells(column_cells(union, _cols())))
    assert not torn.exists()  # swept by the successful write's prune


def test_store_stays_cell_bounded(spark, tmp_path):
    """However many rows arrive, the store holds Σ NDV(col) cells plus
    one ledger row per batch — never row-scaled state."""
    from service_alerts_connector_spark.sources.parquet_io import read_dataset

    root = str(tmp_path)
    for i in range(4):
        incremental_column_stats_ingest(
            spark, root, _batch(spark, i * 2_000, (i + 1) * 2_000), _cols(), f"b{i}"
        )
    store = read_dataset(spark, root, COLSTATS_STORE)
    # grp: 3 values, parity: 2 values, ledger: 4 batches
    assert store.count() == 3 + 2 + 4


def test_ndv_from_persisted_store_feeds_join_order_decision(spark, tmp_path):
    """The NDV half of the stats→plan loop (round-11 verdict #2), end to
    end through a REAL versioned store: ingest the join-key cells once
    (the amortized ANALYZE), then derive the System-R order from the
    store alone — est_ndv_from_store touches ≤#columns stat rows, the
    NDVs match live countDistinct exactly, and the resulting decision
    equals the scan-based q_join_order_plan."""
    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.catalog_stats import (
        q_join_order_plan,
    )
    from service_alerts_connector_spark.operators.planner import (
        est_ndv_from_store,
        join_order_decision,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    sf_dir = "/root/testdata/sf0.001"
    root = str(tmp_path / "analyze_store")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")

    incremental_column_stats_ingest(
        spark,
        root,
        li.select("l_orderkey"),
        [("l_orderkey", F.col("l_orderkey").cast("string"))],
        "analyze-li",
    )
    incremental_column_stats_ingest(
        spark,
        root,
        orders.select("o_orderkey", "o_custkey"),
        [
            ("o_orderkey", F.col("o_orderkey").cast("string")),
            ("o_custkey", F.col("o_custkey").cast("string")),
        ],
        "analyze-o",
    )
    incremental_column_stats_ingest(
        spark,
        root,
        cust.select("c_custkey"),
        [("c_custkey", F.col("c_custkey").cast("string"))],
        "analyze-c",
    )

    store = read_dataset(spark, root, COLSTATS_STORE)
    per = est_ndv_from_store(
        store, ["l_orderkey", "o_orderkey", "o_custkey", "c_custkey"]
    )
    # store-fed stats equal live exact aggregates (ledger rows excluded)
    assert per["l_orderkey"] == (
        li.count(),
        li.select("l_orderkey").distinct().count(),
    )
    assert per["o_custkey"][1] == (
        orders.select("o_custkey").distinct().count()
    )

    decision = join_order_decision(
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
    assert sorted(map(tuple, decision.collect())) == sorted(
        map(tuple, q_join_order_plan(spark, sf_dir).collect())
    )

    with pytest.raises(ValueError):
        est_ndv_from_store(store, ["nosuch_col"])


def test_salting_decision_from_persisted_store_matches_catalog(
    spark, tmp_path
):
    """The skew-salting decision's store path: two incremental ANALYZE
    ingests build the cell store, then salting_decision_from_cells over
    the PERSISTED version (ledger rows included in the frame it reads)
    must emit exactly the catalog query's rows for the same column —
    the runtime planner and the oracled catalog query share one
    function, so the DuckDB certificate covers the store path too."""
    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.catalog_stats import (
        q_skew_salting_decision,
    )
    from service_alerts_connector_spark.operators.planner import (
        salting_decision_from_cells,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    sf_dir = "/root/testdata/sf0.001"
    root = str(tmp_path / "analyze_store")
    orders = _t(spark, sf_dir, "orders")
    # two id-split batches: the store must converge to the full table's
    # cells before the decision reads it
    for i, half in enumerate((0, 1)):
        incremental_column_stats_ingest(
            spark,
            root,
            orders.where(F.col("o_orderkey") % 2 == half).select(
                "o_orderstatus"
            ),
            [("o_orderstatus", F.col("o_orderstatus").cast("string"))],
            f"analyze-orders-{i}",
        )

    store = read_dataset(spark, root, COLSTATS_STORE)
    got = sorted(
        map(tuple, salting_decision_from_cells(store, tbl="orders").collect())
    )
    expected = sorted(
        tuple(r)
        for r in q_skew_salting_decision(spark, sf_dir).collect()
        if r["col"] == "o_orderstatus"
    )
    assert got == expected and len(got) == 1


def test_ndv_sketch_path_from_hll_store(spark, tmp_path):
    """The high-NDV half of the ANALYZE tier: column_pairs fed through
    the HLL register store (state ≤ cols × 256 rows regardless of NDV),
    then est_ndv_from_hll_store reads estimates within the raw-HLL error
    of the exact counts.  Two id-split ingests prove the max-merge
    converges to the full table's registers."""
    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.operators.colstats import (
        column_pairs,
    )
    from service_alerts_connector_spark.operators.planner import (
        est_ndv_from_hll_store,
    )
    from service_alerts_connector_spark.operators.sketches import (
        HLL_STORE,
        incremental_hll_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    sf_dir = "/root/testdata/sf0.001"
    root = str(tmp_path / "hll_analyze")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    pairs = [
        ("l_orderkey", F.col("l_orderkey").cast("string")),
        ("price_cents", F.col("price_cents").cast("string")),
        # deliberately low-NDV: the raw estimator's WRONG regime — kept in
        # the store to pin the zero_registers audit signal below
        ("l_partkey", F.col("l_partkey").cast("string")),
    ]
    for i, half in enumerate((0, 1)):
        incremental_hll_ingest(
            spark,
            root,
            column_pairs(li.where(F.col("l_orderkey") % 2 == half), pairs),
            "val",
            ["col_name"],
        )

    store = read_dataset(spark, root, HLL_STORE)
    assert store.count() <= 3 * 256  # m-bounded however many values
    est = est_ndv_from_hll_store(
        store, ["l_orderkey", "price_cents", "l_partkey"]
    )
    for col in ("l_orderkey", "price_cents"):  # NDV ≫ m/2: raw regime
        exact = li.select(col).distinct().count()
        assert abs(est[col] - exact) <= 0.2 * exact, (col, est[col], exact)

    # the low-NDV column is OUT of the raw regime (NDV < m): the estimate
    # is biased high there by design (no ln-based linear counting — engine
    # portability), and the auditable tell is a large zero_registers count
    # — a planner seeing it switches to the exact cells, which are small
    # in exactly that regime
    from service_alerts_connector_spark.operators.sketches import (
        hll_estimate,
    )

    zr = {
        r["col_name"]: r["zero_registers"]
        for r in hll_estimate(store, ["col_name"]).collect()
    }
    assert zr["l_partkey"] > 256 // 4  # loud regime signal
    assert zr["l_orderkey"] < 256 // 4

    with pytest.raises(ValueError):
        est_ndv_from_hll_store(store, ["nosuch_col"])


def test_stats_driven_aggregate_dispatches_from_persisted_store(
    spark, tmp_path
):
    """The runtime consumer of the skew-salting decision (round-12
    verdict #3), the exact analogue of stats_driven_join's
    threshold switch: against one persisted ANALYZE cell-store version,
    a hot-keyed frame dispatches to the salted two-phase plan (the salt
    column appears in the physical plan), a flat frame stays a plain
    one-shuffle groupBy, BOTH return the exact plain-groupBy results,
    and an unmeasured key raises instead of silently running plain."""
    from service_alerts_connector_spark.operators.planner import (
        stats_driven_aggregate,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    root = str(tmp_path)
    n = 4_000
    # 60% of rows share one key; tail spread over ~997 keys → mcv1_cnt
    # 2400 > 4 × (4000 div 32) = 500 → salt
    skewed = spark.range(n).select(
        F.when(F.col("id") % 5 < 3, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 997).cast("string")))
        .alias("grp"),
        (F.col("id") % 7).cast("long").alias("v"),
    )
    # 16 even keys of 250 rows → 250 ≤ 500 → plain
    flat = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % 16).cast("string")).alias("grp"),
        (F.col("id") % 7).cast("long").alias("v"),
    )
    incremental_column_stats_ingest(
        spark, root, skewed.select("grp"),
        [("grp_skew", F.col("grp"))], "analyze-skewed",
    )
    incremental_column_stats_ingest(
        spark, root, flat.select("grp"),
        [("grp_flat", F.col("grp"))], "analyze-flat",
    )
    store = read_dataset(spark, root, COLSTATS_STORE)

    phase1 = [F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s")]
    phase2 = [F.sum("cnt").alias("cnt"), F.sum("s").alias("s")]

    salted = stats_driven_aggregate(
        skewed, ["grp"], phase1, phase2, store, key_cols=["grp_skew"]
    )
    plain = stats_driven_aggregate(
        flat, ["grp"], phase1, phase2, store, key_cols=["grp_flat"]
    )
    assert "_salt" in salted._jdf.queryExecution().toString()
    assert "_salt" not in plain._jdf.queryExecution().toString()
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, skewed.groupBy("grp").agg(*phase1).collect())
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, flat.groupBy("grp").agg(*phase1).collect())
    )

    with pytest.raises(ValueError):
        stats_driven_aggregate(
            flat, ["grp"], phase1, phase2, store, key_cols=["nosuch_col"]
        )


def test_one_store_version_feeds_all_three_decisions(spark, tmp_path):
    """The trilogy's shared-store contract (round-12 verdict #5) in one
    place: a single persisted cell-store version answers ALL THREE
    stats→plan decisions — bytes (est_bytes_from_cells → broadcast in
    stats_driven_join), NDV (est_ndv_from_store → join_order_decision),
    MCV+NULL (salting_decision_from_cells → stats_driven_aggregate) —
    with every decision reading only stat cells, never a table scan."""
    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.catalog_stats import (
        q_join_order_plan,
    )
    from service_alerts_connector_spark.operators.planner import (
        est_bytes_from_cells,
        est_ndv_from_store,
        join_order_decision,
        salting_decision_from_cells,
        stats_driven_aggregate,
        stats_driven_join,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    sf_dir = "/root/testdata/sf0.001"
    root = str(tmp_path / "analyze_store")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    # ONE ANALYZE sweep, one store: join keys (NDV leg), the dim's string
    # payload (byte leg), and the status column (salt leg)
    incremental_column_stats_ingest(
        spark, root, li.select("l_orderkey"),
        [("l_orderkey", F.col("l_orderkey").cast("string"))], "a-li",
    )
    incremental_column_stats_ingest(
        spark, root, orders.select("o_orderkey", "o_custkey", "o_orderstatus"),
        [
            ("o_orderkey", F.col("o_orderkey").cast("string")),
            ("o_custkey", F.col("o_custkey").cast("string")),
            ("o_orderstatus", F.col("o_orderstatus").cast("string")),
        ],
        "a-o",
    )
    incremental_column_stats_ingest(
        spark, root, cust.select("c_custkey"),
        [("c_custkey", F.col("c_custkey").cast("string"))], "a-c",
    )
    incremental_column_stats_ingest(
        spark, root, nation.select("n_name"),
        [("n_name", F.col("n_name"))], "a-n",
    )
    store = read_dataset(spark, root, COLSTATS_STORE)

    # (1) byte leg: cell-priced string bytes equal the live octet sum,
    # and the sub-threshold estimate drives a BroadcastHashJoin
    n_rows, est = est_bytes_from_cells(store, ["n_name"])
    live = nation.agg(
        F.sum(F.octet_length("n_name").cast("long")).alias("b")
    ).first()["b"]
    assert (n_rows, est) == (nation.count(), int(live))
    joined = stats_driven_join(
        cust,
        nation.select(
            F.col("n_nationkey").alias("c_nationkey"), "n_name"
        ),
        "c_nationkey",
        est_bytes=est,
    )
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().toString()

    # (2) NDV leg: store-fed System-R order equals the scan-based catalog
    per = est_ndv_from_store(
        store, ["l_orderkey", "o_orderkey", "o_custkey", "c_custkey"]
    )
    decision = join_order_decision(
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
    assert sorted(map(tuple, decision.collect())) == sorted(
        map(tuple, q_join_order_plan(spark, sf_dir).collect())
    )

    # (3) salt leg: the status column is hot (two values carry ~96% of
    # rows) → decision 'salt', and the runtime consumer dispatches the
    # two-phase plan off the SAME store version
    salt_rows = salting_decision_from_cells(
        store.where(F.col("col_name") == "o_orderstatus")
    ).collect()
    assert [r["decision"] for r in salt_rows] == ["salt"]
    agg = stats_driven_aggregate(
        orders,
        ["o_orderstatus"],
        [F.count(F.lit(1)).alias("cnt")],
        [F.sum("cnt").alias("cnt")],
        store,
    )
    assert "_salt" in agg._jdf.queryExecution().toString()
    assert sorted(map(tuple, agg.collect())) == sorted(
        map(tuple, orders.groupBy("o_orderstatus").count().collect())
    )


def test_stats_driven_aggregate_salts_null_hot_key(spark, tmp_path):
    """The NULL-visibility fix end-to-end through the runtime consumer:
    a column whose dominant shuffle key is NULL (70% of rows) must
    dispatch to the salted plan — in an aggregate shuffle every NULL key
    hashes to ONE reducer exactly like a hot value — and the salted
    result must still equal the plain groupBy (NULL group preserved)."""
    from service_alerts_connector_spark.operators.planner import (
        stats_driven_aggregate,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    root = str(tmp_path)
    n = 4_000
    null_hot = spark.range(n).select(
        F.when(
            F.col("id") % 10 < 7, F.lit(None).cast("string")
        ).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 997).cast("string"))
        ).alias("grp"),
        (F.col("id") % 7).cast("long").alias("v"),
    )
    incremental_column_stats_ingest(
        spark, root, null_hot.select("grp"),
        [("grp", F.col("grp"))], "analyze-nullhot",
    )
    store = read_dataset(spark, root, COLSTATS_STORE)
    phase1 = [F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s")]
    phase2 = [F.sum("cnt").alias("cnt"), F.sum("s").alias("s")]
    agg = stats_driven_aggregate(null_hot, ["grp"], phase1, phase2, store)
    assert "_salt" in agg._jdf.queryExecution().toString()
    # repr-sort: the NULL group key is not orderable against strings
    assert sorted(map(repr, map(tuple, agg.collect()))) == sorted(
        map(repr, map(tuple, null_hot.groupBy("grp").agg(*phase1).collect()))
    )
