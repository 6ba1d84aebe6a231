"""Quickstart #3: a data-platform audit day in ~40 lines.

Run:  python examples/analytics_audit_pipeline.py [sf_dir]
      (default /root/testdata/sf0.001)

The checks a platform team runs before promoting a dataset: profiling
(joinability, functional dependencies), integrity (sequence gaps, replica
digests), layout (zone-map skippability), privacy (k-anonymity), numeric
forensics (Benford), and drift — every stage a catalog query with a DuckDB
oracle behind it.
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
    ]:
        print(f"\n=== {title} ===")
        q(spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
