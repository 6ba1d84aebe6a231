"""Quickstart #3: a data-platform audit day in ~40 lines.

Run:  python examples/analytics_audit_pipeline.py [sf_dir]
      (default /root/testdata/sf0.001)

The checks a platform team runs before promoting a dataset: profiling
(joinability, functional dependencies), integrity (sequence gaps, replica
digests), layout (zone-map skippability), privacy (k-anonymity), numeric
forensics (Benford), and drift — every stage a catalog query with a DuckDB
oracle behind it — plus the statistics tier: the ANALYZE pass (column
stats, equi-depth histogram, per-column byte stats) and the evaluation
metrics (kappa, exact AUC, two-sample KS), and the stats→plan loop the
optimizer closes (broadcast decision, range-partition audit, System-R
join-order pick).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from service_alerts_connector_spark.catalog_analytics import (
    q_benford_audit,
    q_distribution_drift,
    q_fd_check,
    q_join_profile,
    q_k_anonymity_audit,
    q_seq_gap_audit,
    q_table_digest,
    q_zone_map_prune,
)
from service_alerts_connector_spark.catalog_stats import (
    q_analyze_bytes,
    q_auc_exact,
    q_broadcast_decision,
    q_cohens_kappa,
    q_column_stats_mcv,
    q_correlated_column_stats,
    q_equi_depth_histogram,
    q_join_cardinality_check,
    q_join_order_plan,
    q_join_order_plan_stored,
    q_ks_statistic,
    q_skew_salting_decision,
    q_range_partition_plan,
)
from service_alerts_connector_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[4]", shuffle_partitions=4)

    for title, q in [
        ("Joinability profile (FK discovery)", q_join_profile),
        ("Functional dependencies", q_fd_check),
        ("Sequence integrity (open-status orderkeys)", q_seq_gap_audit),
        ("Replica digest comparison (drifted buckets)", q_table_digest),
        ("Zone-map skippability by layout", q_zone_map_prune),
        ("k-anonymity of the event release", q_k_anonymity_audit),
        ("Benford first-digit forensics", q_benford_audit),
        ("Value-distribution drift week1 vs week4", q_distribution_drift),
        ("Optimizer column stats + MCVs (ANALYZE)", q_column_stats_mcv),
        ("Equi-depth histogram / range-partition bounds", q_equi_depth_histogram),
        ("Correlated-column dependence audit", q_correlated_column_stats),
        ("Join-cardinality estimator calibration", q_join_cardinality_check),
        ("Per-column byte stats (join pricing input)", q_analyze_bytes),
        ("Broadcast-vs-shuffle decision table", q_broadcast_decision),
        ("Range-partition balance audit", q_range_partition_plan),
        ("System-R join-order pick", q_join_order_plan),
        ("Same pick, NDVs from the ANALYZE cell store", q_join_order_plan_stored),
        ("Skew-salting decision (MCV cell histogram)", q_skew_salting_decision),
        ("Labeler agreement (Cohen's kappa)", q_cohens_kappa),
        ("Score ranking quality (exact AUC)", q_auc_exact),
        ("Purchase-vs-view KS drift test", q_ks_statistic),
    ]:
        print(f"\n=== {title} ===")
        q(spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
