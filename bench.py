"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced through the built-in `noop` sink (computes and
consumes EVERY output column, no driver-side collect).  Through round 6
the force was `count()`, which lets Catalyst prune everything the row
count doesn't need — window/aggregate VALUE computation included
(measured under-reporting up to 6x on `boxplot_stats`, 2.7x on
`clamped_running_balance`); round-7 totals are therefore higher than and
NOT comparable to earlier rounds' — see SCALE.md "Bench forcing action".
Times include plan + execution but share one warm session, mirroring how
a resident engine would serve these.
"""

from __future__ import annotations

import gc
import json
import os
import time

from service_alerts_connector_spark.catalog import CORE_QUERIES as _CORE
from service_alerts_connector_spark.catalog_analytics import ANALYTICS_QUERIES as _AN
from service_alerts_connector_spark.catalog_corpus import CORPUS_QUERIES as _CORP
from service_alerts_connector_spark.catalog_events import EVENTS_QUERIES as _EV
from service_alerts_connector_spark.catalog_extras import EXTRA_QUERIES as _EX
from service_alerts_connector_spark.catalog_fixer import FIXER_QUERIES as _FIX
from service_alerts_connector_spark.catalog_geo import GEO_QUERIES as _GEO
from service_alerts_connector_spark.catalog_round7 import (
    ROUND7_QUERIES as _R7,
)
from service_alerts_connector_spark.catalog_temporal import (
    TEMPORAL_QUERIES as _TMP,
)
from service_alerts_connector_spark.catalog_novelty import (
    NOVELTY_QUERIES as _NOV,
)
from service_alerts_connector_spark.catalog_stats import STATS_QUERIES as _ST
from service_alerts_connector_spark.catalog_text import TEXT_QUERIES as _TEXT
from service_alerts_connector_spark.catalog_tpch import TPCH_QUERIES as _TPCH
from service_alerts_connector_spark.session import get_spark

CORE_QUERIES = {
    **_CORE, **_TEXT, **_FIX, **_AN, **_GEO, **_CORP, **_EV, **_EX, **_TMP,
    **_TPCH, **_R7, **_ST, **_NOV,
}


HEADLINE = [
    "fixer_chain",
    "pricing_summary",
    "j1_lookup_join",
    "j2_incremental_anti",
    "a3_lastwins_dedup",
    "j8_cdc_diff",
    "a5_guards",
    "f9_checksum",
    "w3_best_per_group",
    "p10_topk",
    "feed_current_urgent",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "ann_cosine_topk",
    "w5_windowed_agg",
    "rollup_pricing",
    "distinct_agg",
    "lag_rank_window",
    "percentiles",
    # round-2 additions: make the two round-1 scale-flagged operators
    # (spatial overlay, embedding near-dup LSH) measurable round-over-round
    "geo_overlay_rect",
    "dedup_embedding_cosine",
    # round-2 training-pipeline operators
    "sessionize",
    "stratified_sample",
    "corpus_curation",
    "contamination",
    "dedup_clusters",
    # round-2 corpus-prep batch
    "doc_chunking",
    "tfidf_top_terms",
    "scd2_history",
    "pack_bins",
    "cms_heavy_hitters",
    "source_mixing",
    "quality_deciles",
    "text_bpe_tokens",
    "length_outlier_filter",
    "text_ngram_repetition",
    "embedding_center_stats",
    "embedding_project",
    "event_throttle",
    "cohort_retention",
    "funnel_conversion",
    "rolling_window_agg",
    "grouping_sets",
    "json_typed_extract",
    # round-4 additions: bloom pruning, sketch quantiles, SQ8 tier, and the
    # real-decode multimodal pipeline
    "bloom_semi_join",
    "length_quantile_sketch",
    "embedding_sq8",
    "ann_sq8",
    "multimodal_decode",
    "multimodal_resize",
    "passage_dedup",
    # round-9 additions: rolling-shingle substring-span dedup (audit +
    # strip halves), SemDeDup
    "dedup_substring_spans",
    "dedup_substring_strip",
    "decontaminate_strip",
    "semdedup_fixed",
    # round-9 optimizer-statistics + evaluation-metrics tier
    "column_stats_mcv",
    "equi_depth_histogram",
    "cohens_kappa",
    "auc_exact",
    "ks_statistic",
    "q9_profit_rollup",
    "join_cardinality_check",
    "correlated_column_stats",
    # round-10 additions: stats→plan feedback + incremental SemDeDup rule
    "broadcast_decision",
    "range_partition_plan",
    "incremental_semdedup_fixed",
    # round-11 additions: ANALYZE byte stats + System-R order pick + the
    # three partsupp-adapted TPC-H shapes that complete the 22-query suite
    "analyze_bytes",
    "join_order_plan",
    # round-12 additions: the decision with NDVs fed from the ANALYZE
    # cell-store layout (zero-scan decision subtree) + the MCV-driven
    # salting decision
    "join_order_plan_stored",
    "skew_salting_decision",
    "dedup_lsh_recall",
    "q11_important_stock",
    "q16_supplier_counts",
    "q20_potential_promotion",
    "ann_batch",
    "event_value_quantiles",
    # round-5 additions
    "attribution_join",
    "multimodal_decode_png",
    "ann_pq_fixed",
    "config_fanout_1k",
    "hll_distinct",
    "skew_salted_agg",
    "dedup_prefix_filter",
    "ngram_decontamination",
    "vocab_coverage",
    "label_centroid_similarity",
    "dq_rule_screen",
    "event_pagerank",
    "gap_fill_locf",
    "rolling_distinct_hll",
    "unpivot_metrics",
    "q3_shipping_priority",
    "q5_region_volume",
    "q10_returned_items",
    "multimodal_audio",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_video_frames",
    "bm25_rank",
    "pmi_top_pairs",
    "kmeans_update",
    "leakage_safe_split",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive",
    "q21_waiting_suppliers",
    "q22_dormant_value",
    "q7_nation_volume",
    "q14_promo_share",
    "join_size_estimate",
    "window_rank_suite",
    "graph_triangles",
    "skew_report",
    "bpe_merge_step",
    "ann_rerank",
    "ohlc_downsample",
    "funnel_ordered_3step",
    "null_safe_join",
    "q4_priority_check",
    "q6_forecast_revenue",
    "q8_market_share",
    "q13_order_distribution",
    "q15_top_supplier",
    "q12_late_by_priority",
    "interval_coalesce",
    "group_mode",
    "zone_map_prune",
    "table_digest",
    "weighted_sample",
    "sorted_neighborhood",
    "hierarchy_roots",
    "bitmap_intersect",
    "k_anonymity_audit",
    "benford_audit",
    "seq_gap_audit",
    "gap_fill_interp",
    "join_profile",
    "distribution_drift",
    "golden_record",
    "twap_value",
    "ivm_merge",
    "daily_streaks",
    "pareto_analysis",
    "session_paths",
    "quota_allocation",
    "phrase_search",
    "ann_recall_eval",
    "fd_check",
    "keyset_pagination",
    "abandonment_rate",
    "anomaly_days",
    "feature_hashing",
    "target_encoding",
    "temporal_split_embargo",
    "rule_eval_confusion",
    "contribution_share",
    "cohort_ltv",
    "header_detail_recon",
    "multitouch_attribution",
    "dau_new_vs_returning",
    "stickiness_ratio",
    "repurchase_intervals",
    "basket_rules",
    "burst_windows",
    "lift_chart",
    "geo_zone_rollup",
    "containment_pairs",
    "boxplot_stats",
    "aging_report",
    "peak_concurrency",
    "dow_hour_heatmap",
    "language_mix",
    "growth_accounting",
    "status_mix_trend",
    "rank_movers",
    "hhi_concentration",
    "user_feature_bundle",
    "conversion_delay_profile",
    # round-7 additions
    "clamped_running_balance",
    "cusum_changepoint",
    "seasonal_dow_profile",
    "cheapest_supplier_per_part",
    "weighted_median_price",
    "scd2_temporal_join",
    "delta_join_ivm",
    "ancestor_path_sum",
    "winsorized_mean_value",
    # round-13 additions
    "ngram_novelty",
    "doc_rarity_score",
    "stratified_kfold",
    "group_kfold",
    # round-14 additions
    "group_kfold_balance",
    # round-15 additions
    "rarity_from_store",
]

_missing = [q for q in HEADLINE if q not in CORE_QUERIES]
if _missing:
    raise SystemExit(f"HEADLINE names missing from catalog merge: {_missing}")


def _tier_of(name: str) -> str:
    """Bucket a headline query into a coarse tier for the compact
    stdout summary (the full per-query map lives in BENCH_LOCAL.json)."""
    if name.startswith("q") and name[1].isdigit():
        return "tpch"
    if name.startswith("multimodal"):
        return "media"
    if name.startswith(("ann_", "embedding_", "kmeans", "semdedup")):
        return "ann"
    if name.startswith(("dedup_", "text_", "bpe", "ngram", "passage",
                        "contamination", "corpus", "vocab", "doc_",
                        "tfidf", "bm25", "pmi", "phrase", "sorted_",
                        "decontaminate")):
        return "text_dedup"
    if name.startswith(("hll", "cms", "kmv", "bloom", "length_quantile",
                        "rolling_distinct", "zone_map", "table_digest",
                        "bitmap")):
        return "sketch"
    return "analytics"


def trust_verdict(
    timings: dict[str, float],
    crosscheck: dict[str, float] | None,
    anchor_regressions: dict[str, list[float]],
) -> tuple[bool | None, str]:
    """The consumer-facing trust verdict, pure so tests can pin it:
    (trusted, basis).  trusted is True iff a same-HEAD full crosscheck
    run reproduces the best-warm total within 1% with no per-query >2x
    divergence AND the anchor pre-flight found no regressions; False
    when the crosscheck contradicts; None (unknown) with no crosscheck.
    """
    if crosscheck is None:
        return None, (
            "no crosscheck run supplied — set $SPARK_GRAFT_BENCH_CROSSCHECK "
            "to a same-HEAD full-run artifact to earn a trusted verdict"
        )
    shared = sorted(set(timings) & set(crosscheck))
    if set(timings) != set(crosscheck) or not shared:
        return False, (
            f"crosscheck query set mismatch ({len(crosscheck)} vs "
            f"{len(timings)} queries) — crosscheck must be a "
            "same-HEAD FULL run"
        )
    cc_total = sum(crosscheck[q] for q in shared)
    my_total = sum(timings[q] for q in shared)
    delta = abs(my_total - cc_total) / cc_total if cc_total else 1.0
    # a zero on exactly one side IS divergent (0.0-vs-slow must fail
    # the per-query gate, not slip past a min>0 guard and merely
    # dampen the total delta); a both-zero pair agrees trivially
    divergent = sorted(
        q
        for q in shared
        if max(timings[q], crosscheck[q]) > 0
        and (
            min(timings[q], crosscheck[q]) == 0
            or max(timings[q], crosscheck[q])
            > 2 * min(timings[q], crosscheck[q])
        )
    )
    trusted = delta <= 0.01 and not divergent and not anchor_regressions
    return trusted, (
        f"cross-run best-warm total delta {delta * 100:.2f}% "
        f"({my_total:.2f}s vs {cc_total:.2f}s over {len(shared)} "
        f"queries, threshold 1%); per-query >2x divergences: "
        f"{divergent or 'none'}; anchor_regressions: "
        f"{sorted(anchor_regressions) or 'none'}"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    # validate the subset filter BEFORE paying session startup: a typo'd
    # name must fail loudly, not silently shrink the bench run
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        requested = [s for s in subset.split(",") if s]
        unknown = sorted(set(requested) - set(HEADLINE))
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_QUERIES names not in HEADLINE: {unknown}"
                f" (valid: {sorted(HEADLINE)})"
            )
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # warm the JVM, parquet footers, and page cache for every input table —
    # the bench measures query execution of a resident engine, not cold I/O
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # best-of-n per query (default 5, override $SPARK_GRAFT_BENCH_N): the
    # first ("cold") run pays one-time plan compilation and whole-stage-
    # codegen JIT; the best warm run reflects the steady-state query time a
    # resident engine serves — the quantity comparable across rounds.  The
    # per-query cold time and warm spread are emitted alongside so round-
    # over-round deltas can be told apart from harness noise (a real plan
    # regression moves `best`; GC/JIT/sandbox pressure moves `spread`).
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_N", "5"))
    # optional subset filter (comma-separated names): lets round-over-round
    # investigations re-run an earlier round's exact headline set in an
    # otherwise identical session
    headline = (
        [q for q in HEADLINE if q in set(subset.split(","))]
        if subset
        else HEADLINE
    )
    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name in headline:
        fn = CORE_QUERIES[name]
        # settle the session between queries: a full collection on both
        # sides of the Py4J bridge so the previous query's garbage (shuffle
        # buffers, broadcast blocks, Arrow batches) is not charged to this
        # one — round-5/6 bench tails drifted ~1.17x and spiked 10x spreads
        # purely from end-of-run memory pressure.
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        warm = runs[1:] or runs
        best = min(warm)
        timings[name] = round(best, 3)
        stats[name] = {
            # best_warm duplicated from `queries` so the FULL artifact is
            # self-contained per query: the driver's PERF diff reads the
            # compact record (worst-5 only), which left cross-round
            # per-query comparisons with n_common=1 in r15 — query_stats
            # now carries everything needed to diff all entries
            "best_warm": round(best, 3),
            "cold": round(runs[0], 3),
            "median_warm": round(sorted(warm)[len(warm) // 2], 3),
            "spread": round((max(warm) - best) / best, 3) if best else 0.0,
        }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Contention pre-flight: median_warm exceeding cold is physically
    # backwards on a quiet host (the cold run pays plan compilation +
    # codegen JIT on top of execution) — it is the documented tell of
    # host-level vCPU contention during the warm runs (SCALE.md round-10
    # geo investigation).  A 10% margin keeps epsilon ties on
    # sub-second queries from firing the gate (measured: a quiet-ish run
    # shows several median≈cold±5% pairs, a contended one shows 2-4×
    # inversions).  More than 2 such queries marks the WHOLE recording as
    # a contended sample: the artifact says so explicitly, so a
    # round-over-round comparison never mistakes host noise for a plan
    # regression.  Re-record in a quiet window when this fires.
    polluted = sorted(
        name
        for name, s in stats.items()
        if s["median_warm"] > s["cold"] * 1.1
    )
    # Anchor pre-flight (round-12 lesson: one bad 2.9× sample slipped into
    # a committed anchor because the inversion gate above only catches
    # median>cold contention, not a single slow BEST-warm).  Compare each
    # query's best-warm against the previous quiet anchor's value: >2× is
    # flagged as an anchor regression — either a real plan change (then a
    # SCALE.md row should explain it) or a bad sample (then re-record in a
    # quiet window before committing the artifact as the next anchor).
    anchor_path = os.environ.get("SPARK_GRAFT_BENCH_ANCHOR")
    if anchor_path is None:
        import glob as _glob

        quiets = sorted(
            _glob.glob(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_r*_quiet.json",
                )
            )
        )
        anchor_path = quiets[-1] if quiets else None
    anchor_regressions: dict[str, list[float]] = {}
    if anchor_path and os.path.exists(anchor_path):
        prev: dict[str, float] = {}
        this_sf = float(sf) if sf.replace(".", "").isdigit() else sf
        try:
            with open(anchor_path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    if rec.get("sf") != this_sf:
                        continue  # cross-SF comparisons are meaningless
                    q = rec.get("queries") or {}
                    # prefer the full per-query record (carries
                    # query_stats); a compact record only lists worst-5
                    if rec.get("query_stats") or len(q) > len(prev):
                        prev = q
        except (OSError, ValueError):
            prev = {}
        anchor_regressions = {
            name: [prev[name], secs]
            for name, secs in timings.items()
            if name in prev and prev[name] > 0 and secs > 2 * prev[name]
        }
    # Salvage re-pass (r15, mechanizing the r14 bm25_rank A/B protocol):
    # host contention arrives in waves that inflate a CONTIGUOUS block of
    # the headline order (five r15 daytime recordings: disjoint >2x sets,
    # each a consecutive slice — the bad-sample signature, never a plan
    # change).  Re-measure ONLY the flagged queries minutes later in the
    # same session: best-warm is a MINIMUM statistic, so folding in
    # n_runs more warm samples can only sharpen it toward the true floor
    # — it cannot manufacture a fast value a quiet host wouldn't
    # reproduce, and the crosscheck pair still enforces cross-run
    # reproducibility on the FINAL numbers.  The artifact records which
    # queries were salvaged (before/after) and keeps the main pass's
    # pollution verdict, so a consumer sees that a wave hit the run.
    # Skipped when the flagged set is large (>24: a storm that big needs
    # a fresh window, not patching) or SPARK_GRAFT_BENCH_SALVAGE=0.
    # The crosscheck artifact is read BEFORE the salvage pass: a wave
    # hitting an ANCHOR-UNCOVERED query (no BENCH_r*_quiet value yet)
    # shows up only as a cross-run >2x divergence, so those names
    # join the re-measure set — otherwise the pair can never converge
    # on queries added since the last quiet anchor (hit by the first
    # r15 pair: group_kfold/group_kfold_balance/rarity_from_store).
    crosscheck_path = os.environ.get("SPARK_GRAFT_BENCH_CROSSCHECK")
    cc = None
    if crosscheck_path and os.path.exists(crosscheck_path):
        cc = {}
        try:
            with open(crosscheck_path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    if rec.get("sf") != (
                        float(sf) if sf.replace(".", "").isdigit() else sf
                    ):
                        continue
                    q = rec.get("queries") or {}
                    if rec.get("query_stats") or len(q) > len(cc):
                        cc = q
        except (OSError, ValueError):
            cc = {}
    salvage_repass: dict[str, list[float]] = {}
    cc_divergent = set()
    if cc:
        cc_divergent = {
            name
            for name, secs in timings.items()
            if name in cc
            and max(secs, cc[name]) > 0
            and (
                min(secs, cc[name]) == 0
                or max(secs, cc[name]) > 2 * min(secs, cc[name])
            )
        }
    salvage_set = set(anchor_regressions) | cc_divergent
    if (
        salvage_set
        and len(salvage_set) <= 24
        and os.environ.get("SPARK_GRAFT_BENCH_SALVAGE", "1") != "0"
    ):
        for name in sorted(salvage_set):
            fn = CORE_QUERIES[name]
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            rebest = timings[name]
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                rebest = min(rebest, time.perf_counter() - t0)
            if round(rebest, 3) < timings[name]:
                salvage_repass[name] = [timings[name], round(rebest, 3)]
                timings[name] = round(rebest, 3)
                stats[name]["best_warm"] = round(rebest, 3)
        if anchor_regressions:
            anchor_regressions = {
                name: [prev[name], secs]
                for name, secs in timings.items()
                if name in prev and prev[name] > 0 and secs > 2 * prev[name]
            }
    # Consumer-facing trust verdict (round-13 lesson: ~5 median>cold
    # inversions is this host's noise floor for the MEDIAN statistic —
    # `contended_sample` fires there while three cross-validated runs
    # reproduce the best-warm total to 0.03%, so the flag alone misleads
    # a consumer).  The verdict the repo actually wants consumers to use
    # is computed here so it lives in the artifact, not in SCALE.md
    # prose: cross-run BEST-WARM reproducibility (supply a same-HEAD
    # full-run artifact via $SPARK_GRAFT_BENCH_CROSSCHECK; best-warm is
    # a minimum statistic, immune to the median's inversion noise) plus
    # an empty anchor-regression list ⇒ trusted: true.  Without a
    # crosscheck run, trusted stays null — unknown, not false.
    trusted, trust_basis = trust_verdict(timings, cc, anchor_regressions)
    # ONE pollution verdict, carried identically by both emitted records
    # (the round-12 anchor held `polluted: []` beside `polluted_count: 2`
    # — self-contradicting): `polluted` is always the full inversion list,
    # `contended_sample` the >2 verdict on it.
    verdict = {
        "polluted": polluted,
        "contended_sample": len(polluted) > 2,
        "anchor": os.path.basename(anchor_path) if anchor_path else None,
        "anchor_regressions": anchor_regressions,
        "salvage_repass": salvage_repass,
        "trusted": trusted,
        "trust_basis": trust_basis,
        # basename only when the file existed AND parsed — a missing/
        # unreadable crosscheck must not leave a `crosscheck: <name>`
        # beside a "no crosscheck run supplied" basis (self-
        # contradicting artifact, the r12 polluted/polluted_count class)
        "crosscheck": (
            os.path.basename(crosscheck_path) if cc is not None else None
        ),
    }
    payload = {
        # distinct metric name: exactly one record per run carries the
        # headline metric (the compact, tail-window-safe line below)
        "metric": "headline_queries_full",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "bench_meta": {"n_runs": n_runs, "timing": "best_warm", "action": "noop_write"},
        "query_stats": stats,
        **verdict,
    }
    full_line = json.dumps(payload)
    # The external harness keeps only a bounded TAIL of stdout (~2000
    # chars): rounds 5-6 recorded "parsed": null because the single full
    # line (160+ queries x stats) overflows it.  So: (1) persist the full
    # payload next to this script, (2) print the full line first for
    # anyone capturing complete stdout, (3) END with a compact line —
    # total, per-tier subtotals, worst-5 — guaranteed to fit the tail
    # window and parse.
    # subset runs (SPARK_GRAFT_BENCH_QUERIES) must never clobber the
    # full-catalog artifact that BENCH_r*.json's full_artifact points at —
    # they get a suffixed scratch path instead
    artifact = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_LOCAL.subset.json"
        if os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
        else "BENCH_LOCAL.json",
    )
    try:
        with open(artifact, "w") as f:
            f.write(full_line + "\n")
    except OSError:
        artifact = None
    tiers: dict[str, float] = {}
    for name, secs in timings.items():
        tiers[_tier_of(name)] = round(tiers.get(_tier_of(name), 0.0) + secs, 3)
    worst5 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    )
    print(full_line)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": payload["value"],
                "unit": "sec",
                "sf": payload["sf"],
                "n_queries": len(timings),
                "queries": worst5,
                "tiers": tiers,
                "bench_meta": {
                    "n_runs": n_runs,
                    "timing": "best_warm",
                    "action": "noop_write",
                    "queries_truncated_to_worst5": True,
                    "full_artifact": artifact,
                },
                **verdict,
            }
        )
    )


if __name__ == "__main__":
    main()
