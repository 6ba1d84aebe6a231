import sys, io
sys.path.insert(0, "/root/repo")
from contextlib import redirect_stdout
from service_alerts_connector_spark.session import get_spark
from service_alerts_connector_spark.catalog import CORE_QUERIES
from service_alerts_connector_spark.catalog_fixer import FIXER_QUERIES
from service_alerts_connector_spark.catalog_text import TEXT_QUERIES
from service_alerts_connector_spark.catalog_analytics import ANALYTICS_QUERIES
from service_alerts_connector_spark.catalog_geo import GEO_QUERIES
from service_alerts_connector_spark.catalog_corpus import CORPUS_QUERIES
from service_alerts_connector_spark.catalog_events import EVENTS_QUERIES
from service_alerts_connector_spark.catalog_text import TEXT_QUERIES as TQ2
from service_alerts_connector_spark.catalog_novelty import NOVELTY_QUERIES
from service_alerts_connector_spark.catalog_round7 import ROUND7_QUERIES
from service_alerts_connector_spark.catalog_stats import STATS_QUERIES
from service_alerts_connector_spark.catalog_tpch import TPCH_QUERIES

spark = get_spark(master="local[8]", shuffle_partitions=8)
sf = "/root/testdata/sf0.001"
ALL = {**CORE_QUERIES, **TEXT_QUERIES, **FIXER_QUERIES, **ANALYTICS_QUERIES,
       **GEO_QUERIES, **CORPUS_QUERIES, **EVENTS_QUERIES, **TPCH_QUERIES,
       **ROUND7_QUERIES, **STATS_QUERIES, **NOVELTY_QUERIES}
PICK = ["fixer_chain", "pricing_summary", "j1_lookup_join", "j2_incremental_anti",
        "a3_lastwins_dedup", "p10_topk", "dedup_minhash_lsh", "ann_cosine_topk",
        "config_join_fanout", "w5_windowed_agg", "rollup_pricing",
        "sessionize", "stratified_sample", "geo_overlay_rect",
        "doc_chunking", "scd2_history", "tfidf_top_terms", "pack_bins",
        "dedup_embedding_cosine", "cohort_retention",
        "bloom_semi_join", "ann_sq8",
        "hll_distinct", "dedup_prefix_filter", "dq_rule_screen",
        "vocab_coverage", "q5_region_volume",
        "q19_disjunctive", "q21_waiting_suppliers",
        "zone_map_prune", "interval_coalesce", "weighted_sample",
        "bitmap_intersect", "phrase_search", "twap_value",
        "hierarchy_roots", "user_feature_bundle",
        "clamped_running_balance", "scd2_temporal_join",
        "weighted_median_price", "delta_join_ivm",
        "ancestor_path_sum", "cheapest_supplier_per_part",
        "winsorized_mean_value",
        "dedup_substring_spans", "dedup_substring_strip",
        "decontaminate_strip", "semdedup_fixed",
        "column_stats_mcv", "equi_depth_histogram", "cohens_kappa",
        "auc_exact", "ks_statistic", "q9_profit_rollup",
        "join_cardinality_check", "correlated_column_stats",
        "broadcast_decision", "range_partition_plan",
        "incremental_semdedup_fixed",
        "analyze_bytes", "join_order_plan",
        "q11_important_stock", "q16_supplier_counts",
        "q20_potential_promotion", "join_order_plan_stored",
        "skew_salting_decision", "ngram_novelty", "doc_rarity_score",
        "group_kfold_balance", "rarity_from_store"]
NOTES = {
    "rarity_from_store": "the O(batch) scoring pass a 100 TB pipeline runs: the scored slice tokenizes and reduces to unique (doc, token) pairs; the idf side is a <=vocabulary-sized store scan (version-pinned parquet) joined in, 1-row n_docs anchor through the harmless 1xN BNLJ - the corpus behind the store never rescans",
    "group_kfold_balance": "aggregates the cluster-atomic fold assignment: LSH band mining + CC feed one fold-keyed hash agg (5 groups), doc total is a broadcast 1-row aggregate through the harmless 1x5 BNLJ cross - no unpartitioned window anywhere",
    "ngram_novelty": "ONE shingle-keyed aggregation folds first-owner (min_by) and presence set (collect_set, bounded by #sources); explode of the tiny set + one source-keyed agg - the corpus is shuffled once on the shingle, never joined back",
    "doc_rarity_score": "occurrences reduce ONCE to unique (doc, token) pairs with repeat counts; the doc-freq count is a plain count over the pairs and the idf join probes the SAME reduced frame weighted by the count (2.4x over re-shuffling raw occurrences on a 20x-duplicated corpus); TakeOrderedAndProject top-50, 1-row corpus count through the harmless 1xN BNLJ",
    "skew_salting_decision": "one cells pass per table (the ANALYZE store's frame), per-column 1-row aggregates, broadcast-free union - nothing table-sized shuffles twice",
    "join_order_plan_stored": "NDVs fed from the ANALYZE cell-store layout; the decision subtree is a literal 2-row relation - zero scans, zero exchanges at plan time",
    "clamped_running_balance": "Lindley recursion closed form: ONE user_id hash exchange feeds both running windows, no join, no loop",
    "scd2_temporal_join": "point-in-time dimension join as asof union+window - one keyed exchange where the naive inequality join plans a fan-out",
    "weighted_median_price": "weighted exact median, two-phase: (flag, bucket)-partitioned running rank over histogram cells with per-bucket offsets broadcast back - parallelism flags x buckets, no per-group array",
    "ancestor_path_sum": "pointer jumping with an additive path accumulator: O(log depth) node-sized self-joins, localCheckpoint lineage truncation",
    "cheapest_supplier_per_part": "TPC-H Q2 shape: group-min + join-back, region gating through broadcast dims BEFORE aggregation, top-100 = TakeOrderedAndProject",
    "winsorized_mean_value": "p5/p95 from per-nation histogram running ranks -> 25-row broadcast clamp join-back -> exact integer micro mean",
    "dedup_substring_spans": "rolling shingles hashed to md5 INSIDE the explode (32 B/shingle to the exchange, never chunk text); hash-keyed rank window + doc-keyed island windows, two exchanges total",
    "dedup_substring_strip": "the removal half: audit's digest rank window -> island-merged covered positions (each once, no distinct) -> LeftAnti on (doc, tokpos) -> per-doc ordered reassembly",
    "decontaminate_strip": "benchmark digests collapse to a DISTINCT vocabulary before the semi-join (no rank window); train side only shuffles; island strip tail shared with dedup_substring_strip",
    "semdedup_fixed": "expression-only centroid assignment (no centroid join); within-(cluster, band, bucket) capped pair explode - never a vector self-join; exact-cosine verify joins on the id",
    "delta_join_ivm": "three-term join-view delta refresh: every leg BroadcastHashJoin, partials merge by key",
    "column_stats_mcv": "ANALYZE column stats: ONE unpivoted fact scan -> groupBy(col, val) cells (map-side combined), stats + top-3 MCV fold into one aggregation over a col_name-partitioned rank window",
    "equi_depth_histogram": "global range-partition split points with NO global window: cells pinned once (localCheckpoint), per-domain-bucket offsets from a bounded tiny-frame self-join, running count partitioned by bucket",
    "cohens_kappa": "chance-corrected agreement: one scan, ONE conditional aggregation, signed kappa via explicit floor division (engine-exact on negatives)",
    "auc_exact": "Mann-Whitney AUC with no global sort: score cells -> two-phase cumulative negatives -> one aggregation; ties carried exactly via the doubled integer numerator",
    "ks_statistic": "exact two-sample KS: shared two-phase cumulative CDFs at integer scale n_a*n_b, max + argmax via the cusum-style join-back",
    "q9_profit_rollup": "TPC-H Q9 shape: product-line filter collapses part FIRST (broadcast), supplier-nation chain broadcasts, the only fact-fact join co-partitions on l_orderkey; signed integer c4 profit",
    "join_cardinality_check": "System-R estimator from exact NDVs calibrated against the true join count in one row; the actual leg is the harness, the estimate is two 1-row aggregates",
    "correlated_column_stats": "CREATE STATISTICS shape: one distinct-pair aggregate per pinned pair (map-side combined to combo cardinality); modal pick = min_by complement selector, no window",
    "fixer_chain": "the full F1-F8 cleaning chain: ONE whole-stage-codegen projection over the scan, zero exchanges",
    "pricing_summary": "partial hash-agg inside the scan stage, single exchange of 6 groups, integer-cents sums",
    "j1_lookup_join": "three-level dimension chain: all BroadcastHashJoin, fact side never shuffles",
    "j2_incremental_anti": "the incremental core: broadcast anti-join on (id, checksum)",
    "a3_lastwins_dedup": "the one unavoidable shuffle: window over the key, AQE-coalesced",
    "p10_topk": "TakeOrderedAndProject - per-partition top-k, no global sort",
    "dedup_minhash_lsh": "signatures in one agg, pairs expanded per-bucket from sorted id arrays - no self-join",
    "ann_cosine_topk": "expression-fold cosine + TakeOrderedAndProject",
    "config_join_fanout": "config rows broadcast-joined: plan size independent of config count",
    "w5_windowed_agg": "tumbling event-time window: partial agg before the exchange, AQE-coalesced",
    "rollup_pricing": "ROLLUP via Expand: one scan feeds all grouping levels",
    "sessionize": "lag flag + running sum share ONE exchange + sort (plan-shape pinned)",
    "stratified_sample": "content-hash window rank: one exchange, engine-portable membership",
    "geo_overlay_rect": "WKT build in codegen, grid-pruned Python overlay via mapInPandas, join-back on Id",
    "doc_chunking": "stride-window chunking: projection + Generate only, ZERO exchanges - pipelines with the scan",
    "scd2_history": "both SCD2 window passes share one (key x ts) exchange (plan-shape pinned)",
    "tfidf_top_terms": "tf agg -> df agg broadcast-joined back, per-doc rank window; no vocab broadcast hint (AQE decides)",
    "pack_bins": "per-shard running-sum packing: ONE exchange on the shard key, no global window",
    "dedup_embedding_cosine": "banded sign-LSH over a MATERIALIZED cast column (codegen stays compiled); capped bucket arrays; verify joins on the id",
    "cohort_retention": "two keyed aggs joined on user - no raw-event self-join; AQE picks the join strategy",
    "bloom_semi_join": "bitmap built once per hash fn (<=512 rows), probe = 3 chained BroadcastHashJoins + scalar mask filter - fact side never exchanges (plan-shape pinned)",
    "ann_sq8": "integer-dot scoring over int8 codes (scales cancel in cosine) -> TakeOrderedAndProject; float32 originals never read",
    "hll_distinct": "register build is ONE map-side-combined agg on (group, bucket) - <= groups x 256 rows shuffle however big the input; estimate agg is bounded-cell",
    "dedup_prefix_filter": "df-frequency agg AQE-joined back, per-doc window (partition = one doc), candidate equi-join on PREFIX tokens only, array_intersect verify on candidates",
    "dq_rule_screen": "five rules = ONE partial+final aggregate over ONE scan; stack unpivot runs on the single aggregate row",
    "vocab_coverage": "token groupBy is the only corpus-sized exchange; cumulative distribution is a broadcast self-join of the <=64-row bucket table - no global window",
    "q5_region_volume": "six-table snowflake: every dimension chain a BroadcastHashJoin, only the fact tables shuffle, exact-integer revenue agg",
    "q19_disjunctive": "OR-of-ANDs across the join with a manual CNF envelope: brand IN-list + size bound pushed to the part scan, quantity bound pushed to lineitem, broadcast join, ZERO hashpartitioning exchanges",
    "q21_waiting_suppliers": "EXISTS + NOT-EXISTS as equi-semi/anti joins with inequality residuals on ONE key (l_orderkey); lateness is a post-join filter, never a theta join; dim chain broadcast",
    "zone_map_prune": "two map-side-combined zone-map builds (insertion + clustered layouts) unioned; no join, no window — the stats table is files-sized metadata",
    "interval_coalesce": "running-max island window + island-extent agg share ONE hashpartitioning exchange (grouping key has the window key as prefix)",
    "weighted_sample": "zero-exchange narrow projection + TakeOrderedAndProject: global weighted bottom-k with per-partition partial top-k",
    "bitmap_intersect": "one map-side-combined (type, word) groupBy builds every bitmap; set algebra is a word equi-join + bit_count - events never re-shuffle",
    "phrase_search": "positional postings; term filters land BEFORE the (doc, pos+1) equi-join so both sides are posting-list-sized",
    "twap_value": "lead window + per-user agg share ONE hashpartitioning exchange; cents x seconds partials mergeable",
    "hierarchy_roots": "O(log depth) pointer jumping: node-sized self-joins per round with localCheckpoint lineage truncation - plan stays flat however deep the tree",
    "user_feature_bundle": "four independent user-keyed aggregates joined on the entity key - the feature-store materialization pattern, no window",
    "broadcast_decision": "the stats side of stats_driven_join: seven scans each map-side combine to ONE (tbl, rows, bytes) row - the 7-row union never shuffles fact rows",
    "range_partition_plan": "TeraSort-shape audit: equi-depth bounds from the two-phase cell prefix (k-row collect), assignment via ONE literal bound array (no join), 16-row balance agg",
    "incremental_semdedup_fixed": "batch-anchored incremental SemDeDup: shares _assign_cells (checkpointed once) + capped candidate machinery with semdedup_fixed; store side capped per bucket to the max_bucket smallest ids",
    "analyze_bytes": "ANALYZE byte stats: one single-row aggregate per table, per-column rows via explode of that 1-row frame - no join, no window, nothing table-sized shuffles",
    "join_order_plan": "System-R order pick: three stat scans (count + exact NDVs), 1-row broadcast combines, candidate orders exploded from the single stat row - the decision costs three stat lookups at any scale",
    "q11_important_stock": "TPC-H Q11 shape: nation slice broadcast, per-part value groupBy is the only fact shuffle, fraction-of-total HAVING as a 1-row broadcast integer compare",
    "q16_supplier_counts": "TPC-H Q16 shape: part filter + complaint anti-join broadcast BELOW the distinct - the exchange carries filter-surviving deduped rows (9x fewer, census-measured)",
    "q20_potential_promotion": "TPC-H Q20 shape: two aggregates share the (part, supplier) shuffle of the name+year slice; integer share threshold; left-semi probe of a supplier-sized frame",
}
out = ["# PLANS — captured physical plans for the flagship queries",
       "",
       "Generated by `python tools/gen_plans.py` (explain('formatted') at",
       "sf0.001, local[8]); regenerate after plan-affecting changes.  Annotations",
       "state what to look for; the plan-shape tests in tests/test_plan_shapes.py",
       "enforce the load-bearing properties in CI.", ""]
for name in PICK:
    df = ALL[name](spark, sf)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # keep the operator tree part, trim the verbose per-node details to 60 lines
    lines = plan.splitlines()
    cut = next((i for i, l in enumerate(lines) if l.strip() == "" and i > 5), len(lines))
    tree = "\n".join(lines[:cut])
    out += [f"## {name}", "", f"*{NOTES[name]}*", "", "```", tree, "```", ""]
open("/root/repo/PLANS.md", "w").write("\n".join(out))
print("written", len(out), "lines-ish")
