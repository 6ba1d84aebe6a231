"""Measured shuffle census: execute headline queries and read the ACTUAL
shuffle volumes from Spark's SQL metrics store, so SCALE.md's shuffle
claims are measurements, not guesses.

Usage: python tools/shuffle_census.py [query ...]
  (default: a representative subset; SPARK_GRAFT_SF_DIR picks the scale,
  default /root/testdata/sf0.1)

For each query prints the summed "shuffle records written" / "shuffle
bytes written" across every exchange in the execution, plus the largest
single exchange — read from SQLAppStatusStore for the execution the
query actually ran (the plan-tree metrics of a fresh queryExecution are
empty, and ``count()`` runs its own wrapped execution, so the status
store is the one reliable source).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CORE_QUERIES  # noqa: E402
from service_alerts_connector_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "pricing_summary", "a3_lastwins_dedup", "dedup_minhash_lsh",
    "tfidf_top_terms", "q19_disjunctive", "q21_waiting_suppliers",
    "join_size_estimate", "graph_triangles", "hll_distinct",
    "bloom_semi_join", "kmeans_update", "leakage_safe_split",
    # round-9 stats tier
    "column_stats_mcv", "equi_depth_histogram", "auc_exact",
    "ks_statistic", "cohens_kappa", "q9_profit_rollup",
    "join_cardinality_check", "correlated_column_stats",
]

_SIZE = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30}


def _parse_total(formatted: str) -> float:
    """SQLMetric display strings are 'total (min, med, max (stageId:...))'
    blocks like '1234' / '24.3 KiB' / '1,234\\n(...)'. Take the leading
    total and normalize sizes to bytes."""
    head = formatted.strip().splitlines()[0].strip()
    head = head.split("(")[0].strip()
    m = re.match(r"^([\d.,]+)\s*(B|KiB|MiB|GiB)?$", head)
    if not m:
        return 0.0
    val = float(m.group(1).replace(",", ""))
    return val * _SIZE.get(m.group(2) or "B", 1)


def measure(spark, df) -> dict:
    # noop sink, NOT count(): count lets Catalyst prune every column the
    # row count doesn't need — including the window/agg machinery whose
    # shuffles this census exists to measure (count-forced runs showed
    # 1.5k records where the real plan shuffles 100k)
    df.write.format("noop").mode("overwrite").save()
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    last = execs.apply(execs.size() - 1)
    values = store.executionMetrics(last.executionId())
    metrics = last.metrics()
    recs, bts, peak = 0.0, 0.0, 0.0
    # last.metrics() lists metric DESCRIPTORS for every AQE plan version,
    # so one physical exchange's accumulator appears once per replan —
    # summing raw descriptors overcounted an AQE-heavy query 7× (caught on
    # equi_depth_histogram: planGraph shows ONE 149k exchange, the
    # descriptor sweep counted seven).  Dedupe by accumulatorId.
    seen: set[int] = set()
    it = metrics.iterator()
    while it.hasNext():
        mtr = it.next()
        name = mtr.name()
        if name not in ("shuffle records written", "shuffle bytes written"):
            continue
        if mtr.accumulatorId() in seen:
            continue
        seen.add(mtr.accumulatorId())
        opt = values.get(mtr.accumulatorId())
        if opt.isEmpty():
            continue
        total = _parse_total(opt.get())
        if name == "shuffle records written":
            recs += total
            peak = max(peak, total)
        else:
            bts += total
    return {
        "shuffle_records": int(recs),
        "shuffle_mib": round(bts / (1 << 20), 2),
        "peak_exchange_records": int(peak),
    }


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="shuffle-census",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    report = {}
    for name in names:
        report[name] = measure(spark, CORE_QUERIES[name](spark, sf_dir))
        print(name, json.dumps(report[name]))
    print(json.dumps({"sf_dir": sf_dir, "census": report}))


if __name__ == "__main__":
    main()
