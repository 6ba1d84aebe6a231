"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's operator catalog
(service_alerts_connector_spark.catalog) — every SURVEY §2 operator mapped
onto the driver's TPC-H-ish tables with a DuckDB-equivalent oracle.
"""

from __future__ import annotations

import os
import sys

# importable no matter how the harness loaded this file (spec-from-path,
# different cwd, scrubbed env)
_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from service_alerts_connector_spark.catalog import (
    CORE_ORACLES,
    CORE_QUERIES,
    q_pricing_summary,
)
from service_alerts_connector_spark.catalog_analytics import (
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)
from service_alerts_connector_spark.catalog_corpus import (
    CORPUS_ORACLES,
    CORPUS_QUERIES,
)
from service_alerts_connector_spark.catalog_events import (
    EVENTS_ORACLES,
    EVENTS_QUERIES,
)
from service_alerts_connector_spark.catalog_extras import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
)
from service_alerts_connector_spark.catalog_fixer import (
    FIXER_ORACLES,
    FIXER_QUERIES,
)
from service_alerts_connector_spark.catalog_geo import (
    GEO_ORACLES,
    GEO_QUERIES,
)
from service_alerts_connector_spark.catalog_round7 import (
    ROUND7_ORACLES,
    ROUND7_QUERIES,
)
from service_alerts_connector_spark.catalog_novelty import (
    NOVELTY_ORACLES,
    NOVELTY_QUERIES,
)
from service_alerts_connector_spark.catalog_stats import (
    STATS_ORACLES,
    STATS_QUERIES,
)
from service_alerts_connector_spark.catalog_temporal import (
    TEMPORAL_ORACLES,
    TEMPORAL_QUERIES,
)
from service_alerts_connector_spark.catalog_text import (
    TEXT_ORACLES,
    TEXT_QUERIES,
)
from service_alerts_connector_spark.catalog_tpch import (
    TPCH_ORACLES,
    TPCH_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


# Keys the external harness has already differential-checked (it samples the
# first 50 dict-order entries each round, so without a nudge the same 50
# would be re-checked forever while newer operators only ever get the local
# sf0.01 oracle run).  queries() rotates these to the back so the
# not-yet-sampled tail gets driver coverage.  All entries pass the same
# local oracle regardless of position.
#
# SAMPLE-CADENCE POLICY (keep this invariant every round): the lead tuple
# below must contain, in order, (a) queries whose code changed this round
# — derive mechanically with `python tools/changed_oracles.py
# <prev-round-end-rev>` (rendered-oracle byte diff; catches shared-CTE
# refactors the file diff hides) PLUS the module diff for
# Spark-side-only changes,
# then (b) oracled queries that have never appeared in any
# CORRECTNESS_r*.json (none remain as of round 10 — the books closed),
# then (c) STEADY-STATE: oldest-certificate-first re-certification — rank
# every query by the LATEST round it appears in across CORRECTNESS_r*.json
# and fill the 50-query window with the stalest, so every certificate
# refreshes on a bounded cycle instead of round-1 certificates aging
# forever.  At the END of a round, fold the just-certified lead into
# _DRIVER_SAMPLED and rebuild the lead for the next round — a short round
# must never silently re-certify stale keys (the round-8 failure mode:
# _R7_LEAD stayed pinned and the driver burned its 50-query sample
# re-checking round 7's already-green set).
_DRIVER_SAMPLED = frozenset(
    (
        # rounds 1-4
        # (the next nine were certified in CORRECTNESS_r01.json but were
        # missing from this set until round 10 — recorded now so the
        # "fresh" middle section truly contains only never-sampled keys)
        "cube_grouping", "dedup_embedding_cosine", "distinct_agg",
        "fixer_chain", "lag_rank_window", "percentiles", "pivot_status",
        "rollup_pricing", "running_total",
        "p1_projection", "p4_time_window", "feed_current_urgent",
        "p6_predicate_engine", "p10_topk", "j1_lookup_join",
        "j2_incremental_anti", "j8_cdc_diff", "a1_collect_list",
        "a3_lastwins_dedup", "a5_guards", "w3_best_per_group",
        "pricing_summary", "f9_checksum", "f1_zeropad", "f6_time_repair",
        "f4_date_arith", "f12_fuzzy_join", "f15_json_extract",
        "u1_union_distinct", "f8_location_coalesce", "f16_templates",
        "a2_all_window_anchor", "u2_difference_by_key", "f17_array_ops",
        "config_join_fanout", "w5_windowed_agg", "j4_composite_lookup",
        "text_pii_redact", "text_boilerplate", "text_repetition",
        "text_ngram_repetition", "embedding_project", "text_vocab_topk",
        "text_length_histogram", "text_stats", "text_lang_id",
        "text_quality", "text_fingerprint", "dedup_exact",
        "dedup_minhash_lsh", "dedup_clusters", "dedup_near_keep",
        "contamination", "corpus_curation", "dedup_jaccard",
        "dedup_simhash", "ann_cosine_topk", "ann_bucketed", "ann_ivf_fixed",
        # rounds 5-6 (identical 50-query window both rounds)
        "abandonment_rate", "aging_report", "ann_recall_eval",
        "anomaly_days", "basket_rules", "benford_audit", "bitmap_intersect",
        "boxplot_stats", "burst_windows", "cohort_ltv", "containment_pairs",
        "contribution_share", "daily_streaks", "dau_new_vs_returning",
        "distribution_drift", "dow_hour_heatmap", "fd_check",
        "feature_hashing", "gap_fill_interp", "geo_zone_rollup",
        "golden_record", "group_mode", "growth_accounting",
        "header_detail_recon", "hierarchy_roots", "interval_coalesce",
        "ivm_merge", "join_profile", "k_anonymity_audit",
        "keyset_pagination", "language_mix", "lift_chart",
        "multitouch_attribution", "pareto_analysis", "peak_concurrency",
        "phrase_search", "quota_allocation", "repurchase_intervals",
        "rule_eval_confusion", "seq_gap_audit", "session_paths",
        "sorted_neighborhood", "status_mix_trend", "stickiness_ratio",
        "table_digest", "target_encoding", "temporal_split_embargo",
        "twap_value", "weighted_sample", "zone_map_prune",
        # rounds 7-8 (identical 50-query window both rounds: the former
        # _R7_LEAD — TPC-H, media decoders, sketches, graph, ANN,
        # high-value analytics)
        "q3_shipping_priority", "q4_priority_check", "q5_region_volume",
        "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
        "q10_returned_items", "q12_late_by_priority",
        "q13_order_distribution", "q14_promo_share", "q15_top_supplier",
        "q17_small_quantity", "q18_large_orders", "q19_disjunctive",
        "q21_waiting_suppliers", "q22_dormant_value",
        "multimodal_decode_png", "multimodal_decode_gif",
        "multimodal_decode_jpeg", "multimodal_audio",
        "multimodal_video_frames",
        "hll_distinct", "cms_heavy_hitters", "kmv_distinct",
        "bloom_semi_join", "rolling_distinct_hll", "length_quantile_sketch",
        "event_pagerank", "graph_triangles",
        "ann_rerank", "ann_pq_fixed", "ann_sq8", "ann_batch",
        "embedding_sq8", "kmeans_update", "label_centroid_similarity",
        "embedding_center_stats", "embedding_normalize",
        "embedding_dim_stats",
        "asof_join", "range_join_agg", "window_rank_suite",
        "null_safe_join", "sessionize", "rolling_window_agg",
        "grouping_sets", "scd2_history", "ohlc_downsample",
        "funnel_ordered_3step", "conversion_delay_profile",
        # round 9 (the certified 50 of _R9_LEAD: CORRECTNESS_r09.json —
        # substring/semantic dedup, stats tier, round-7 tier, corpus,
        # multimodal closed-form, events/analytics head)
        "dedup_substring_spans", "dedup_substring_strip",
        "decontaminate_strip", "semdedup_fixed", "column_stats_mcv",
        "equi_depth_histogram", "cohens_kappa", "auc_exact",
        "ks_statistic", "q9_profit_rollup", "join_cardinality_check",
        "correlated_column_stats",
        "clamped_running_balance", "cusum_changepoint",
        "seasonal_dow_profile", "cheapest_supplier_per_part",
        "weighted_median_price", "scd2_temporal_join", "delta_join_ivm",
        "ancestor_path_sum", "winsorized_mean_value", "geo_overlay_rect",
        "tfidf_top_terms", "bm25_rank", "pmi_top_pairs", "bpe_merge_step",
        "text_bpe_tokens", "passage_dedup", "dedup_prefix_filter",
        "leakage_safe_split", "ngram_decontamination", "vocab_coverage",
        "doc_chunking", "pack_bins", "source_quota", "source_mixing",
        "quality_deciles", "hash_split", "stratified_sample",
        "inverted_index", "assign_seq_ids",
        "multimodal_decode", "multimodal_resize",
        "cohort_retention", "funnel_conversion", "attribution_join",
        "event_value_quantiles", "event_throttle", "json_typed_extract",
        "linear_trend",
        # round 10 (the certified 17 of the retired _R10_LEAD:
        # CORRECTNESS_r10.json)
        "broadcast_decision", "range_partition_plan",
        "incremental_semdedup_fixed",
        "zorder_key", "skew_salted_agg", "dq_rule_screen",
        "unpivot_metrics", "rank_movers", "hhi_concentration",
        "join_size_estimate", "skew_report", "user_feature_bundle",
        "type_cooccurrence", "type_transitions",
        "config_fanout_1k", "gap_fill_locf", "length_outlier_filter",
        # round 11 (the certified keys of the retired _R11_LEAD not
        # already above: CORRECTNESS_r11.json)
        "geo_overlay", "analyze_bytes", "join_order_plan",
        "q11_important_stock", "q16_supplier_counts",
        "q20_potential_promotion",
        # round 12 (the certified keys of the retired _R12_LEAD not
        # already above: CORRECTNESS_r12.json — the refresh cohorts and
        # the changed-code re-certifications were already listed, so
        # only the two genuinely new keys land here;
        # skew_salting_decision is deliberately ABSENT: its code changed
        # in round 13 (NULL-aware hot_cnt), so it leads again per
        # policy (a))
        "join_order_plan_stored", "dedup_lsh_recall",
        # round 13 (the certified keys of the retired _R13_LEAD not
        # already above: CORRECTNESS_r13.json 50/50 green — the (c)
        # round-8 cohort was already listed, so only the changed + new
        # keys land here)
        "skew_salting_decision", "ngram_novelty", "doc_rarity_score",
        "stratified_kfold", "group_kfold",
        # round 14 (the certified keys of the retired _R14_LEAD not
        # already above: CORRECTNESS_r14.json 50/50 green — the (a)
        # shingle-hoist re-certifications and the (c) r8/r9 cohorts
        # were already listed, so only the one new key lands here)
        "group_kfold_balance",
    )
)

# Round-15 lead: per the cadence policy above.  Category (a) — "changed
# this round", derived from `python tools/changed_oracles.py d5d4558`
# (rendered-oracle byte diff) plus the module diff: four ADDED oracles
# (the three X-tier enrichment stubs graduating from rows-only to hash
# certificates after draft_posts' admission cap was made deterministic,
# plus the new store-fed rarity query); no existing oracle rendered
# differently, and the novelty.py edit touched only
# incremental_docfreq_ingest, which no previously-certified query
# executes.  (b) never-certified: rarity_from_store (also in (a)).
# (c) steady-state staleness rotation per `python tools/cert_ages.py`:
# the 11 round-9 stragglers that didn't fit last round, then the
# round-10 cohort oldest-first (tool order, minus the x-stubs already
# in (a)) fills the remaining 35 slots; the 9 round-10 names that
# didn't fit (skew_salted_agg … zorder_key) head the round-16 fill.
_R15_LEAD = (
    # Round 15 is the first OPTIMIZATION round and category (a) — queries
    # whose code path changed since the r14 end (module diff over catalog
    # AND operators/functions per the round-11 similarity.py lesson) —
    # SATURATES the 50-slot window: the optimization sessions restructured
    # plans across the text/dedup, histogram-stats, embedding/ANN, graph,
    # geo, multimodal and fixer tiers (plus a reader-plan cache in
    # catalog.py touching every query).  The lead is therefore ALL (a)+(b)
    # — every query with a STRUCTURAL code-path change this round, each
    # already re-oracled locally at sf0.01 after its change — and the (c)
    # stale-certificate rotation pauses for one round (resume with
    # tools/cert_ages.py next round: the r9/r10 cohorts are next).
    # (b) new this round (rarity_from_store never driver-certified) +
    # new X-stub oracles:
    "rarity_from_store", "x1_stub_drafts", "x2_stub_locations",
    "x3_stub_geocode",
    # (a) exact-collapse-before-fuzzy (collapsed_assignment) consumers —
    # rendered SQL byte-equal, plan changed:
    "dedup_clusters", "dedup_near_keep", "leakage_safe_split",
    "group_kfold", "group_kfold_balance",
    # (a) text/dedup restructures (single-pass gates, one-pass overlap,
    # split_contamination, SQL-text simhash, lazy CC rounds):
    "contamination", "corpus_curation", "ngram_decontamination",
    "dedup_simhash", "dedup_lsh_recall", "dedup_minhash_lsh",
    "length_outlier_filter",
    # (a) histogram-cell pins / pinned-cells aggregation:
    "boxplot_stats", "winsorized_mean_value", "ks_statistic",
    "contribution_share", "range_partition_plan", "equi_depth_histogram",
    # (a) fixer/graph (bronze-scan spread; pagerank edge pin; lazy
    # pointer-jump checkpoints):
    "fixer_chain", "event_pagerank", "ancestor_path_sum",
    "hierarchy_roots",
    # (a) geo overlay (pair-level clip memo, dropped final sorts):
    "geo_overlay_rect", "geo_zone_rollup", "geo_overlay",
    # (a) embedding/ANN family (SQL-text expression construction,
    # staged argmin):
    "dedup_embedding_cosine", "semdedup_fixed",
    "incremental_semdedup_fixed", "kmeans_update", "embedding_project",
    "embedding_center_stats", "embedding_sq8", "ann_cosine_topk",
    "ann_sq8", "ann_batch", "ann_pq_fixed", "ann_rerank",
    "ann_recall_eval", "ann_ivf", "ann_pq",
    # (a) multimodal codec stages (hash-spread before mapInPandas):
    "multimodal_decode", "multimodal_resize", "multimodal_decode_png",
    "multimodal_decode_gif", "multimodal_decode_jpeg",
    "multimodal_video_frames",
)

# Canonical export the lockstep gate validates (tools/round_check.py):
# exactly 50 unique names, every one a key of the merged query dict, and
# positionally equal to the first 50 keys queries() returns — a typo'd
# or duplicated lead entry fails the gate instead of silently shrinking
# the driver-sampled window.
DRIVER_LEAD = _R15_LEAD


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data pipeline operators (dedup/similarity/text analysis)."""
    merged = {
        **CORE_QUERIES,
        **TEXT_QUERIES,
        **FIXER_QUERIES,
        **ANALYTICS_QUERIES,
        **GEO_QUERIES,
        **TEMPORAL_QUERIES,
        **CORPUS_QUERIES,
        **EVENTS_QUERIES,
        **TPCH_QUERIES,
        **EXTRA_QUERIES,
        **ROUND7_QUERIES,
        **STATS_QUERIES,
        **NOVELTY_QUERIES,
    }
    lead = {k: merged[k] for k in _R15_LEAD if k in merged}
    fresh = {
        k: v
        for k, v in merged.items()
        if k not in _DRIVER_SAMPLED and k not in lead
    }
    seen = {k: v for k, v in merged.items() if k in _DRIVER_SAMPLED}
    return {**lead, **fresh, **seen}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query.  A few
    EXTRA_QUERIES (trained-kmeans ANN, planar overlay geometry,
    encoded-byte sha256 features) intentionally have no oracle — the
    driver records the weaker rows-only check — but the multimodal
    decode/resize family is oracled via closed-form pixel recipes and,
    since r15, the X-tier enrichment stubs via their md5-of-prompt
    algebra."""
    return {
        **CORE_ORACLES,
        **TEXT_ORACLES,
        **FIXER_ORACLES,
        **ANALYTICS_ORACLES,
        **GEO_ORACLES,
        **TEMPORAL_ORACLES,
        **CORPUS_ORACLES,
        **EVENTS_ORACLES,
        **TPCH_ORACLES,
        **EXTRA_ORACLES,
        **ROUND7_ORACLES,
        **STATS_ORACLES,
        **NOVELTY_ORACLES,
    }
