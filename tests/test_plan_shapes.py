"""Physical-plan audits: the optimizations we claim must show up in
``explain()`` output — broadcast joins stay broadcast, parquet scans get
pushed filters and pruned schemas, top-k plans TakeOrderedAndProject.
Guards against silent plan regressions at scale."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import (
    q_j1_lookup_join,
    q_p10_topk,
    q_p1_projection,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lookup_join_is_broadcast(spark):
    plan = _plan(q_j1_lookup_join(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dimensions must never sort-merge


def test_filter_pushdown_reaches_parquet(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .where(F.col("o_orderkey") > 100)
        .select("o_orderkey", "o_totalprice")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,100)" in plan


def test_column_pruning_reaches_parquet(spark):
    plan = _plan(q_p1_projection(spark, SF_DIR))
    # only the four needed columns in the read schema — no full-row scan
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_custkey" in read_schema and "c_acctbal" in read_schema
    assert "c_nationkey" not in read_schema


def test_topk_is_take_ordered(spark):
    plan = _plan(q_p10_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_fixer_chain_is_single_projection(spark):
    """The whole F1-F8 cleaning chain must fold into one ProjectExec
    (SURVEY §3.1: 'the entire stage is one job')."""
    from service_alerts_connector_spark.plans.fixer import clean_alerts
    from service_alerts_connector_spark.schemas import RAW_SCHEMA
    from tests.fixtures import RAW_ALERTS

    raw = spark.createDataFrame(RAW_ALERTS, RAW_SCHEMA)
    plan = _plan(clean_alerts(raw))
    assert plan.count("Project") == 1
    assert "Exchange" not in plan  # zero shuffles in the scalar chain


def test_sessionize_single_exchange(spark):
    """Both sessionize windows (lag flag + running sum) share one
    (user, ts) partitioning: exactly one Exchange and one Sort."""
    from datetime import datetime

    from service_alerts_connector_spark.operators.sessions import sessionize

    ev = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1))],
        "event_id long, user_id long, ts timestamp",
    )
    plan = _plan(sessionize(ev))
    assert plan.count("Exchange") == 1
    assert plan.count("Sort") == 1


def test_stratified_sample_single_exchange(spark):
    from pyspark.sql import functions as F

    from service_alerts_connector_spark.operators.topk import (
        stratified_sample_exact,
    )

    df = spark.createDataFrame([(1, "a")], "k long, grp string")
    plan = _plan(
        stratified_sample_exact(
            df, ["grp"], 5,
            F.md5(F.col("k").cast("string").cast("binary")),
        )
    )
    assert plan.count("Exchange") == 1


def test_chunking_is_narrow_zero_shuffle(spark):
    """chunk_documents is projection + explode only — it must pipeline with
    the scan (no Exchange anywhere)."""
    from service_alerts_connector_spark.operators.chunking import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(chunk_documents(df, chunk_tokens=2, overlap_tokens=1))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_scd2_single_exchange(spark):
    """Both SCD2 window passes (change flag, then lead/version) share one
    (key × ts,tiebreak) partitioning: exactly one Exchange."""
    from service_alerts_connector_spark.operators.scd import (
        scd2_from_changelog,
    )

    df = spark.createDataFrame([(1, 1, "A")], "ts long, uid long, st string")
    plan = _plan(scd2_from_changelog(df, "uid", "st", "ts", "ts"))
    assert plan.count("Exchange") == 1


def test_pack_bins_single_exchange(spark):
    from service_alerts_connector_spark.operators.chunking import pack_bins

    df = spark.createDataFrame(
        [(1, "s", 10)], "doc_id long, source string, n_tokens int"
    )
    plan = _plan(pack_bins(df))
    assert plan.count("Exchange") == 1


def test_bloom_probe_zero_shuffle(spark):
    """The Bloom probe side must stay a narrow pipeline: broadcast joins
    against the bitmap only — no Exchange introduced on the fact table
    (the bitmap build aggregates ≤ m/32 rows and may exchange; assert the
    probe's joins are all broadcast and no sort-merge appears)."""
    from service_alerts_connector_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    keys = spark.range(100).select(F.col("id").alias("k"))
    fact = spark.range(10000).select((F.col("id") % 500).alias("k"))
    plan = _plan(bloom_probe(fact, bloom_build(keys, "k"), "k"))
    assert plan.count("BroadcastHashJoin") == 4  # k=4 chained probes
    assert "SortMergeJoin" not in plan
    # hash exchanges may only appear on the bitmap build side (groupBy on
    # `word`, <= m/32 rows; the subtree is re-planned per chained join) —
    # never on the fact side's columns
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "word#" not in ln
    ]
    assert not bad, bad


def _iter_logical_nodes(jplan):
    yield jplan
    it = jplan.children().iterator()
    while it.hasNext():
        yield from _iter_logical_nodes(it.next())


def test_kmv_salted_window_partitions(spark):
    """q_kmv_distinct's benched plan must be the 100 TB plan: phase 1's
    window partitions on (group, _salt) so no sort partition ever exceeds
    salt_buckets × k rows, and the phase-2 window (per group only) exists
    exactly once downstream of that prune."""
    from service_alerts_connector_spark.catalog_analytics import (
        q_kmv_distinct,
    )

    df = q_kmv_distinct(spark, SF_DIR)
    windows = [
        n
        for n in _iter_logical_nodes(df._jdf.queryExecution().optimizedPlan())
        if n.getClass().getSimpleName() == "Window"
    ]
    assert len(windows) == 2
    specs = []
    for n in windows:
        it = n.partitionSpec().iterator()
        cols = []
        while it.hasNext():
            cols.append(it.next().toString().split("#")[0])
        specs.append(cols)
    salted = [s for s in specs if "_salt" in s]
    assert len(salted) == 1, specs  # phase 1 partitions on (group, _salt)
    assert "l_returnflag" in salted[0], specs
    unsalted = [s for s in specs if "_salt" not in s]
    assert unsalted == [["l_returnflag"]], specs  # phase 2: group only


def test_no_unpartitioned_window_in_catalog(spark):
    """No catalog query may plan an unpartitioned Window: a global
    row_number/rank sorts the ENTIRE input in one task at scale.  Global
    top-k must be orderBy().limit() (TakeOrderedAndProject) instead — the
    fix applied to q_cms_heavy_hitters.  Sweeps every registered query's
    optimized logical plan."""
    import __spark_entry__ as entry

    offenders = {}
    for name, fn in entry.queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().optimizedPlan()
        for n in _iter_logical_nodes(plan):
            if (
                n.getClass().getSimpleName() == "Window"
                and n.partitionSpec().isEmpty()
            ):
                offenders.setdefault(name, []).append(
                    n.toString().splitlines()[0][:120]
                )
    assert not offenders, offenders


def test_config_fanout_single_broadcast(spark):
    """1 000 configs must still be ONE broadcast join (SCALE.md claim):
    the fact side never exchanges, the predicate table broadcasts once,
    nothing sort-merges regardless of config cardinality."""
    from service_alerts_connector_spark.catalog import q_config_fanout_1k

    plan = _plan(q_config_fanout_1k(spark, SF_DIR))
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan
    # the only exchange is the broadcast of the config table itself
    assert plan.count("Exchange") == plan.count("BroadcastExchange") == 1


def test_overlay_layer_is_join_side_not_driver_collect(spark, tmp_path):
    """The planar overlay fallback must keep the GIS layer IN the plan as
    a join side — not collect it to the driver and broadcast via closure.
    Pin: the layer's parquet path appears as a scan in the overlay's
    physical plan, the candidate join is on the grid-cell key, and the
    per-alert aggregation is the collect_set objectHashAggregate."""
    from service_alerts_connector_spark.operators.spatial import (
        overlay_inference,
    )

    layer_path = str(tmp_path / "layer.parquet")
    spark.createDataFrame(
        [("A", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
         ("B", "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")],
        "name string, WKT string",
    ).write.parquet(layer_path)
    layer = spark.read.parquet(layer_path)
    alerts = spark.createDataFrame(
        [(1, "POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")],
        "Id long, geospatial_footprint string",
    )
    out = overlay_inference(alerts, layer, "zones", use_sedona=False)
    plan = _plan(out)
    # the layer is a plan participant: its parquet scan (full path is
    # truncated in toString, but the pruned read schema is unique to it)
    assert "ReadSchema: struct<name:string,WKT:string>" in plan
    assert "_cx" in plan and "_cy" in plan  # grid-cell equi-join keys
    # and the result is still correct
    rows = {r["Id"]: r["zones"] for r in out.collect()}
    assert rows == {1: ["A"]}


def test_tfidf_df_join_is_broadcast(spark):
    """The document-frequency lookup joins broadcast at runtime (AQE sees
    the tiny aggregate; a web-scale vocab would legitimately shuffle — the
    operator deliberately does NOT force a broadcast hint)."""
    from service_alerts_connector_spark.operators.tfidf import tfidf_top_terms

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = tfidf_top_terms(df)
    out.collect()  # let AQE finalize the adaptive plan
    plan = _plan(out)
    assert "isFinalPlan=true" in plan
    # AQE's toString appends the pre-conversion "Initial Plan" (which
    # rightly shows SortMergeJoin) — assert on the final section only
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_tpch_trio_broadcast_and_topk(spark):
    """Q3/Q5/Q10 shapes: every dimension joins as BroadcastHashJoin (the
    fact tables are the only shuffle participants) and the top-k queries
    plan TakeOrderedAndProject, never a global Sort+Limit."""
    from service_alerts_connector_spark.catalog_analytics import (
        q_q3_shipping_priority,
        q_q5_region_volume,
        q_q10_returned_items,
    )

    p3 = _plan(q_q3_shipping_priority(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p3
    assert "BroadcastHashJoin" in p3

    p5 = _plan(q_q5_region_volume(spark, SF_DIR))
    # snowflake: customer, supplier, nation+region all broadcast
    assert p5.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p5

    p10 = _plan(q_q10_returned_items(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p10
    # the selective returnflag filter must reach the parquet scan
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in p10


def test_bm25_filter_before_join_and_topk(spark):
    """bm25_rank: the query-term filter must reach the token explode side
    BEFORE the df join (a handful of terms survive, not the corpus), the
    df join must broadcast, and the final top-k must be
    TakeOrderedAndProject — no global sort, no SortMergeJoin."""
    from service_alerts_connector_spark.catalog_corpus import q_bm25_rank

    plan = _plan(q_bm25_rank(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_pmi_vocab_is_broadcast(spark):
    """pmi_top_pairs: the ≤64-row vocab must broadcast to the postings
    (never sort-merge a corpus-sized side against it) and the final top-k
    must be TakeOrderedAndProject."""
    from service_alerts_connector_spark.catalog_corpus import q_pmi_top_pairs

    plan = _plan(q_pmi_top_pairs(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q18_having_join_back_topk(spark):
    """q18_large_orders: the HAVING aggregate must collapse the fact table
    BEFORE the join-back (no SortMergeJoin anywhere — the qualifying-keys
    frame broadcasts), and the top-k must be TakeOrderedAndProject."""
    from service_alerts_connector_spark.catalog_tpch import q_q18_large_orders

    plan = _plan(q_q18_large_orders(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q19_envelope_pushdown_zero_fact_shuffle(spark):
    """q19_disjunctive: the manual CNF envelope must reach BOTH parquet
    scans (brand IN-list on part, quantity bounds on lineitem) and the
    fact side must never shuffle — the only exchanges are the part
    broadcast and the single-row final aggregate."""
    from service_alerts_connector_spark.catalog_tpch import q_q19_disjunctive

    plan = _plan(q_q19_disjunctive(spark, SF_DIR))
    assert "In(p_brand, [Brand#12,Brand#23,Brand#34]" in plan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_self_joins_stay_equi(spark):
    """q21_waiting_suppliers: the EXISTS/NOT-EXISTS legs must plan as
    equi-(semi/anti) joins on l_orderkey with the inequality as a join
    residual — NEVER BroadcastNestedLoopJoin or CartesianProduct (the
    engine-wide theta-join ban) — and the supplier+nation dim chain must
    broadcast with its filters pushed to the scans."""
    from service_alerts_connector_spark.catalog_tpch import (
        q_q21_waiting_suppliers,
    )

    plan = _plan(q_q21_waiting_suppliers(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EqualTo(n_name,NATION_3)" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "TakeOrderedAndProject" in plan


def test_q7_q14_dims_broadcast_no_theta(spark):
    """q7: the symmetric nation-pair disjunction must run as a post-join
    filter on broadcast dim attributes, never a theta join (no BNLJ /
    Cartesian) and the nation filter must reach the scan.  q14: the
    CASE-share aggregation is one pass — a single broadcast join and NO
    hashpartitioning exchange at all."""
    from service_alerts_connector_spark.catalog_tpch import (
        q_q7_nation_volume,
        q_q14_promo_share,
    )

    p7 = _plan(q_q7_nation_volume(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p7
    assert "CartesianProduct" not in p7
    assert "In(n_name, [NATION_1,NATION_2]" in p7

    p14 = _plan(q_q14_promo_share(spark, SF_DIR))
    assert "BroadcastHashJoin" in p14
    assert "SortMergeJoin" not in p14
    assert "Exchange hashpartitioning" not in p14


def test_round5_sketch_graph_queries_plan_shapes(spark):
    """join_size_estimate: both synopsis builds are TakeOrderedAndProject
    (never a global sort / unpartitioned window).  graph_triangles: every
    join is equi (no BNLJ/Cartesian from the wedge or closing joins).
    skew_report / bpe_merge_step: top-k is TakeOrderedAndProject and
    nothing sort-merges."""
    from service_alerts_connector_spark.catalog_analytics import (
        q_join_size_estimate,
        q_skew_report,
    )
    from service_alerts_connector_spark.catalog_corpus import q_bpe_merge_step
    from service_alerts_connector_spark.catalog_events import q_graph_triangles

    p = _plan(q_join_size_estimate(spark, SF_DIR))
    assert p.count("TakeOrderedAndProject") >= 3  # two synopses + merge
    assert "Window" not in p

    p = _plan(q_graph_triangles(spark, SF_DIR))
    # the four 1-row stat frames combine via broadcast nested-loop cross
    # joins (1×1 rows — harmless); the wedge/closing/edge-gen legs must be
    # HASH joins on real keys, and nothing may plan a true CartesianProduct
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 3  # only the stat combines
    assert (
        "SortMergeJoin" in p
        or "ShuffledHashJoin" in p
        or "BroadcastHashJoin" in p
    )

    p = _plan(q_skew_report(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p

    p = _plan(q_bpe_merge_step(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    assert "Exchange hashpartitioning" in p  # the one bounded pair groupBy


def test_round5b_queries_plan_shapes(spark):
    """Late round-5 additions.  weighted_sample: global bottom-k must be
    TakeOrderedAndProject (per-partition partial top-k), never a Window or
    global Sort over the corpus.  zone_map_prune: the zone-map build is one
    hash aggregate on the synthetic file id — partial (map-side) aggregation
    present, no window, no join.  group_mode: two keyed HashAggregates, no
    window.  interval_coalesce: the island agg reuses the window's hash
    partitioning — exactly one hashpartitioning exchange over events.
    table_digest: digest frames hash-join (full outer), never BNLJ or
    cartesian."""
    from service_alerts_connector_spark.catalog_analytics import (
        q_table_digest,
        q_zone_map_prune,
    )
    from service_alerts_connector_spark.catalog_corpus import q_weighted_sample
    from service_alerts_connector_spark.catalog_events import (
        q_group_mode,
        q_interval_coalesce,
    )

    p = _plan(q_weighted_sample(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p
    assert "Exchange" not in p  # narrow projection + partial top-k only

    p = _plan(q_zone_map_prune(spark, SF_DIR))
    assert "Window" not in p and "Join" not in p
    assert "partial" in p  # map-side combine on the file-id aggregate

    p = _plan(q_group_mode(spark, SF_DIR))
    assert "Window" not in p
    assert p.count("Exchange hashpartitioning") <= 2

    p = _plan(q_interval_coalesce(spark, SF_DIR))
    # one exchange for the user_id window; the island groupBy reuses it
    # (orderBy adds a rangepartitioning exchange for presentation only)
    assert p.count("Exchange hashpartitioning") == 1, p

    p = _plan(q_table_digest(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_round5c_queries_plan_shapes(spark):
    """Final round-5 batch.  twap_value: the lead window and the per-user
    agg share ONE hashpartitioning exchange over events.  phrase_search:
    the adjacency join is an equi hash join (term filters bound the
    sides), never BNLJ/cartesian.  quota_allocation: the remainder pick is
    TakeOrderedAndProject.  golden_record / fd_check: aggregation-only —
    no window anywhere.  daily_streaks: the islands window is keyed."""
    from service_alerts_connector_spark.catalog_analytics import (
        q_daily_streaks,
        q_fd_check,
    )
    from service_alerts_connector_spark.catalog_corpus import (
        q_phrase_search,
        q_quota_allocation,
    )
    from service_alerts_connector_spark.catalog_events import q_twap_value
    from service_alerts_connector_spark.catalog_text import q_golden_record

    p = _plan(q_twap_value(spark, SF_DIR))
    # one exchange for the user window; agg reuses it (orderBy adds range)
    assert p.count("Exchange hashpartitioning") == 1, p

    p = _plan(q_phrase_search(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

    p = _plan(q_quota_allocation(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p

    for q in (q_golden_record, q_fd_check):
        assert "Window" not in _plan(q(spark, SF_DIR))

    p = _plan(q_daily_streaks(spark, SF_DIR))
    assert "windowspecdefinition(user_id" in p  # islands window is keyed


def test_round7_queries_plan_shapes(spark):
    """Round-7 tier.  clamped_running_balance: the Lindley closed form is
    keyed windows only — exactly ONE user_id hash exchange feeds them (the
    final orderBy adds a range exchange), no join at all.  The two
    rewritten quantile queries and weighted_median_price must never
    collect per-group arrays (no collect_list in any plan).
    scd2_temporal_join: the point-in-time join is the asof union+window
    rewrite — no BNLJ, no CartesianProduct, and its windows are keyed.
    delta_join_ivm: every join leg hash-joins (broadcast dims), nothing
    sort-merges at this scale, no BNLJ."""
    from service_alerts_connector_spark.catalog_analytics import (
        q_boxplot_stats,
    )
    from service_alerts_connector_spark.catalog_events import (
        q_conversion_delay_profile,
    )
    from service_alerts_connector_spark.catalog_round7 import (
        q_clamped_running_balance,
        q_delta_join_ivm,
        q_scd2_temporal_join,
        q_weighted_median_price,
    )

    p = _plan(q_clamped_running_balance(spark, SF_DIR))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    assert "windowspecdefinition(user_id" in p

    for q in (
        q_boxplot_stats,
        q_conversion_delay_profile,
        q_weighted_median_price,
    ):
        assert "collect_list" not in _plan(q(spark, SF_DIR))

    # the round-8 two-phase rewrite: the running-weight walk must stay
    # partitioned by (l_returnflag, bucket) — parallelism flags × buckets,
    # not a 3-task per-flag walk — with the per-bucket offsets broadcast
    # back (a regression to the single walk or a shuffled offsets join
    # fails here loudly)
    p = _plan(q_weighted_median_price(spark, SF_DIR))
    assert re.search(
        r"windowspecdefinition\(l_returnflag#\d+, bucket#\d+L, cents#\d+L ASC",
        p,
    ), "running-weight window lost its (flag, bucket) partition key"
    assert "BroadcastHashJoin" in p, "offsets join is no longer broadcast"

    p = _plan(q_scd2_temporal_join(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "windowspecdefinition(user_id" in p or "windowspecdefinition(_k" in p

    p = _plan(q_delta_join_ivm(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p

    from service_alerts_connector_spark.catalog_round7 import (
        q_winsorized_mean_value,
    )

    p = _plan(q_winsorized_mean_value(spark, SF_DIR))
    assert "collect_list" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_round9_dedup_queries_plan_shapes(spark):
    """The two round-9 dedup operators keep their scale-safe shapes:

    * dedup_substring_spans — shingles shuffle as md5 DIGESTS (the
      32 B/shingle claim: no k-token chunk text ever reaches an
      exchange), rank + island windows partitioned (hash / doc), no
      quadratic joins;
    * semdedup_fixed — centroid assignment is expression-only (no join
      to a centroid table), candidates come from the capped bucket
      groupBy + pair explode (never a vector self-join), no BNLJ /
      cartesian anywhere.
    """
    from service_alerts_connector_spark.catalog_corpus import (
        q_dedup_substring_spans,
        q_dedup_substring_strip,
    )
    from service_alerts_connector_spark.catalog_text import q_semdedup_fixed

    p = _plan(q_dedup_substring_spans(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # rank window keyed on the digest, islands + final agg on the doc
    assert "windowspecdefinition(_h" in p
    assert "windowspecdefinition(doc_id" in p
    # the digest is hashed BEFORE the explode: md5 must appear inside the
    # Generate input, not downstream of it (chunk text never shuffles)
    gen_line = next(l for l in p.splitlines() if "Generate posexplode" in l)
    assert "md5" in gen_line

    p = _plan(q_dedup_substring_strip(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "windowspecdefinition(_h" in p  # shares the audit's rank window
    # covered-position removal is an ANTI join on (doc, tokpos)
    assert re.search(r"Join LeftAnti, \(\(doc_id#\d+L", p) or "LeftAnti" in p

    from service_alerts_connector_spark.catalog_corpus import (
        q_decontaminate_strip,
    )

    p = _plan(q_decontaminate_strip(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # contamination needs NO rank window: the benchmark collapses to a
    # distinct digest vocabulary and the train shingles semi-join it
    assert "windowspecdefinition(_h" not in p
    assert "LeftSemi" in p and "LeftAnti" in p

    p = _plan(q_semdedup_fixed(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "collect_list" not in p  # capped collect_set only
    # pair generation is the bucket groupBy + explode, never a join of
    # the vector table to itself on a similarity predicate: every join
    # in the plan keys on an id column (verify joins on id_a/id_b, the
    # audit frame's left join on _id)
    for line in p.splitlines():
        if "Join" in line and "Reused" not in line:
            assert re.search(r"\[(?:_id|id_a|id_b)#\d+L\]", line), line


def test_round9_stats_tier_plan_shapes(spark):
    """The optimizer-statistics tier keeps its scale-safe shapes:

    * column_stats_mcv — ONE lineitem scan (the unpivoted pairs explode;
      stats + MCV fold into the same aggregation, no second branch), the
      only window partitions by col_name over post-agg cells;
    * equi_depth_histogram — the fact scan is pinned ONCE behind the
      lazy localCheckpoint (zero parquet scans in the outer plan), the
      running-count window partitions by the domain bucket (never
      global), and the only nested-loop joins are the three bounded
      ones (tiny-frame prefix self-join + two 1-row broadcasts);
    * cohens_kappa — one scan, one aggregation, no window/join at all.
    """
    from service_alerts_connector_spark.catalog_stats import (
        q_cohens_kappa,
        q_column_stats_mcv,
        q_equi_depth_histogram,
    )

    p = _plan(q_column_stats_mcv(spark, SF_DIR))
    assert p.count("Scan parquet") == 1
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p
    assert "windowspecdefinition(col_name" in p
    # exactly one window pass (rank), no second cell branch
    assert p.count("Window") == 1

    p = _plan(q_equi_depth_histogram(spark, SF_DIR))
    # the orders scan lives inside the checkpointed subtree, evaluated once
    assert p.count("Scan parquet") == 0
    assert "ExistingRDD" in p or "LogicalRDD" in p or "Scan ExistingRDD" in p
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 3
    # the running count partitions by the domain bucket, never globally
    assert "windowspecdefinition(bucket" in p
    assert p.count("Window") == 1

    p = _plan(q_cohens_kappa(spark, SF_DIR))
    assert p.count("Scan parquet") == 1
    assert "Join" not in p and "Window" not in p


def test_round9_eval_metrics_plan_shapes(spark):
    """auc_exact / ks_statistic keep the sort-free shapes: the fact scan
    lives inside the checkpointed cell subtree (zero parquet scans in the
    outer plan), the cumulative window partitions by the value-domain
    bucket (never global), no sort-merge join, and the only BNLJ are the
    bounded offset self-join + 1-row broadcasts."""
    from service_alerts_connector_spark.catalog_stats import (
        q_auc_exact,
        q_ks_statistic,
    )

    p = _plan(q_auc_exact(spark, SF_DIR))
    assert p.count("Scan parquet") == 0
    assert "SortMergeJoin" not in p
    assert "windowspecdefinition(bucket" in p
    assert p.count("BroadcastNestedLoopJoin") <= 1

    # ks_statistic (r15): the scored frame — the SAME _bucketed_cum
    # machinery auc_exact's plan just certified, plus the totals cross —
    # is pinned with a lazy localCheckpoint because it is consumed twice
    # (max + argmax join-back).  A localCheckpoint (lazy or eager)
    # rewrites the plan to a LogicalRDD at once, so the outer plan reads
    # the pinned frame: no fact scan, no window, no BNLJ at all — the
    # bucket-window invariant lives in the subtree and is pinned above
    # via the shared helper
    p = _plan(q_ks_statistic(spark, SF_DIR))
    assert p.count("Scan parquet") == 0
    assert "SortMergeJoin" not in p
    assert "windowspecdefinition" not in p  # window ran inside the pin
    assert "Scan ExistingRDD" in p
    assert p.count("BroadcastNestedLoopJoin") == 0


def test_q9_profit_rollup_plan_shape(spark):
    """Q9's join tree: the product-line part filter collapses to a
    broadcast side (never a shuffled dim), supplier→nation broadcasts,
    and nothing plans a nested loop — the only permissible fact-fact
    join is the l_orderkey equi-join (SMJ at scale, AQE broadcast at
    test SF)."""
    from service_alerts_connector_spark.catalog_tpch import (
        q_q9_profit_rollup,
    )

    p = _plan(q_q9_profit_rollup(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 3


def test_stats_driven_join_picks_strategy_from_estimate(spark):
    """The stats→plan loop (round 10): the join strategy must follow the
    MEASURED byte estimate, not Spark's file-size heuristic — a
    sub-threshold dim plans BroadcastHashJoin, an over-threshold dim
    keeps a shuffle join (SortMergeJoin), with the SAME code path."""
    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.operators.planner import (
        estimate_table_bytes,
        stats_driven_join,
    )

    fact = _t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    dim = _t(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    n, est = estimate_table_bytes(dim)
    assert n > 0 and est > 0

    p = _plan(stats_driven_join(fact, dim, "l_partkey", est_bytes=est))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    # same dim declared over-threshold: the broadcast must NOT happen
    p = _plan(
        stats_driven_join(
            fact, dim, "l_partkey", est_bytes=est, threshold_bytes=est - 1
        )
    )
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "BroadcastHashJoin" not in p


def test_broadcast_decision_plan_shape(spark):
    """broadcast_decision: 7 single-row aggregates unioned — every leg is
    a map-side-combined HashAggregate over ONE scan; no join, no window,
    no shuffle of fact rows (the exchanges move 1-row partials)."""
    from service_alerts_connector_spark.catalog_stats import (
        q_broadcast_decision,
    )

    p = _plan(q_broadcast_decision(spark, SF_DIR))
    assert "Join" not in p
    assert "Window" not in p
    assert p.count("Scan parquet") == 7


def test_range_partition_plan_shape(spark):
    """range_partition_plan: the assignment is ONE literal bound array
    (no join against a bound table), the per-range rollup is a plain
    hash aggregate, and nothing plans an unpartitioned window or global
    sort ahead of the final 16-row orderBy."""
    from service_alerts_connector_spark.catalog_stats import (
        q_range_partition_plan,
    )

    df = q_range_partition_plan(spark, SF_DIR)
    p = _plan(df)
    # the balance join against the 1-row total is the only join, and it
    # must be broadcast (BNLJ cross at 16×1 rows is the allowed stat
    # combine, same as the sketch-tier pins)
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" not in p


def test_analyze_store_feeds_join_without_dim_rescan(spark, tmp_path):
    """The 100 TB stats→plan path end-to-end (round-10 verdict #6): the
    ANALYZE pass runs ONCE and persists to the versioned store; a later
    join prices its dim side from the store (≤#columns stat rows) and
    picks the strategy — the joined plan must contain exactly ONE scan
    of the dim, whichever strategy wins (no hidden re-measure scan)."""
    from service_alerts_connector_spark.catalog import _t
    from service_alerts_connector_spark.operators.planner import (
        analyze_byte_stats,
        est_bytes_from_store,
        stats_driven_join,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
        write_dataset,
    )

    root = str(tmp_path / "stats_store")
    # ANALYZE pass: one scan, persisted
    write_dataset(
        analyze_byte_stats(_t(spark, SF_DIR, "supplier"), "supplier"),
        root,
        "analyze_byte_stats",
    )

    # later session path: store → estimate → strategy, no dim rescan
    store = read_dataset(spark, root, "analyze_byte_stats")
    proj = ["s_suppkey", "s_name"]
    n, est = est_bytes_from_store(store, "supplier", cols=proj)
    assert n > 0 and est > 0
    # the projection estimate must undercut the full-width estimate, and
    # the store-derived full-width estimate must equal the live one
    _, est_full = est_bytes_from_store(store, "supplier")
    assert est < est_full
    from service_alerts_connector_spark.operators.planner import (
        estimate_table_bytes,
    )

    assert est_full == estimate_table_bytes(_t(spark, SF_DIR, "supplier"))[1]

    fact = _t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    dim = _t(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )

    p = _plan(stats_driven_join(fact, dim, "l_suppkey", est_bytes=est))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert p.count("supplier.parquet") == 1

    p = _plan(
        stats_driven_join(
            fact, dim, "l_suppkey", est_bytes=est, threshold_bytes=est - 1
        )
    )
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "BroadcastHashJoin" not in p
    assert p.count("supplier.parquet") == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        est_bytes_from_store(store, "nosuch_table")
    with _pytest.raises(ValueError):
        est_bytes_from_store(store, "supplier", cols=["nosuch_col"])


def test_analyze_bytes_plan_shape(spark):
    """analyze_bytes: one single-row aggregate per table exploded to
    per-column rows — no join, no window, exactly 2 scans; nothing
    table-sized reaches an exchange."""
    from service_alerts_connector_spark.catalog_stats import q_analyze_bytes

    p = _plan(q_analyze_bytes(spark, SF_DIR))
    assert "Join" not in p
    assert "Window" not in p
    assert p.count("Scan parquet") == 2


def test_join_order_plan_shape(spark):
    """join_order_plan: three stat scans combined via broadcast-only
    1-row cross joins; the candidate-order rows are an explode of that
    single stat row — no fact-fact join, no window, no sort-merge."""
    from service_alerts_connector_spark.catalog_stats import (
        q_join_order_plan,
    )

    p = _plan(q_join_order_plan(spark, SF_DIR))
    assert p.count("Scan parquet") == 3
    assert "SortMergeJoin" not in p
    assert "Window" not in p
    # 1-row stat combines plan as BNLJ cross — allowed at 1x1 (CLAUDE.md)
    assert p.count("BroadcastNestedLoopJoin") <= 2


def test_round11_tpch_shapes(spark):
    """Q11/Q16/Q20 adapted shapes: dims and exclusion/threshold sets
    broadcast, no cartesian/BNLJ beyond the allowed 1-row stat cross
    (Q11's total), no unpartitioned window anywhere."""
    from service_alerts_connector_spark.catalog_tpch import (
        q_q11_important_stock,
        q_q16_supplier_counts,
        q_q20_potential_promotion,
    )

    p = _plan(q_q11_important_stock(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1  # the 1-row total cross
    assert "Window" not in p

    p = _plan(q_q16_supplier_counts(spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p  # part filter + exclusion set broadcast
    assert "Window" not in p

    p = _plan(q_q20_potential_promotion(spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "LeftSemi" in p  # the qualifying-supplier semi-join
    assert "Window" not in p


def test_join_order_plan_stored_has_no_scan(spark):
    """The store-fed decision (round-11 verdict #2): q_join_order_plan_stored
    consumes ≤4 collected stat rows, so the RETURNED subtree must be a
    literal 2-row relation — no table scan, no join, no exchange of any
    kind.  The O(n) cell work happened in the (amortized) ANALYZE pass at
    build time, never in the decision plan a consumer re-executes."""
    from service_alerts_connector_spark.catalog_stats import (
        q_join_order_plan_stored,
    )

    df = q_join_order_plan_stored(spark, SF_DIR)
    p = _plan(df)
    assert "Scan parquet" not in p and "FileScan" not in p
    assert "Join" not in p
    assert "Exchange" not in p

    # and the decision is bit-identical to the in-engine aggregate variant
    from service_alerts_connector_spark.catalog_stats import (
        q_join_order_plan,
    )

    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, q_join_order_plan(spark, SF_DIR).collect())
    )


def test_skew_salting_decision_plan_shape(spark):
    """skew_salting_decision: one cells pass per table (3 scans), cell
    groupBys only — no join of any kind, no window; nothing table-sized
    shuffles twice."""
    from service_alerts_connector_spark.catalog_stats import (
        q_skew_salting_decision,
    )

    p = _plan(q_skew_salting_decision(spark, SF_DIR))
    assert p.count("Scan parquet") == 3
    assert "Join" not in p
    assert "Window" not in p
