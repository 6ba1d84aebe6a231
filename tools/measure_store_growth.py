"""Growth-curve evidence for the saturation stores' O(store) snapshot
rewrite (VERDICT r13 #4): per-ingest wall time vs store size over >=20
sequential ingests of a 20x corpus, so the cost curve is committed
measurement, not a docstring claim.

Two regimes, deliberately:

* NOVELTY store, WORST case — every slice's tokens are salted with the
  slice tag, so every shingle is new and the store grows by a full
  slice's shingle count per ingest (the unbounded-growth regime the
  O(store)-rewrite caveat is about).
* DOCFREQ store, BOUNDED case — slices are the same sf corpus with
  shifted doc_ids (disjoint docs, shared vocabulary), so the store
  saturates at the corpus vocabulary and per-ingest cost should go
  flat (the bounded-state regime).

Usage: python tools/measure_store_growth.py [n_slices]
Prints one JSON line per ingest:
  {"i": k, "novelty_s": .., "novelty_store_rows": ..,
   "docfreq_s": .., "docfreq_store_rows": ..}
and a final summary line, which is ALSO persisted to STORE_GROWTH.json
at the repo root (env STORE_GROWTH_ARTIFACT overrides) — the committed
drift-gate artifact: tools/round_check.py flags any recorded regime
whose tail-mean exceeds head-mean x2, so a store regression (e.g. an
accidental unpinned read re-scanning all versions) is caught
mechanically instead of by re-reading SCALE.md ("Saturation-store
growth curve").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from service_alerts_connector_spark.operators.novelty import (  # noqa: E402
    DOCFREQ_STORE,
    NOVELTY_STORE,
    incremental_docfreq_ingest,
    incremental_novelty_ingest,
)
from service_alerts_connector_spark.session import get_spark  # noqa: E402
from service_alerts_connector_spark.sources.parquet_io import (  # noqa: E402
    list_versions,
    read_dataset,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    n_slices = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(
        app_name="store-growth",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    root = tempfile.mkdtemp(prefix="store_growth_")
    rows = []
    settle = os.environ.get("STORE_GROWTH_SETTLE", "1") != "0"
    try:
        for i in range(n_slices):
            if settle:
                # bench.py discipline: collect BOTH sides of the Py4J
                # bridge between ingests so earlier ingests' pinned
                # localCheckpoint blocks (store-sized, freed only when
                # their Python frames are GC'd and the ContextCleaner
                # runs) are not charged to this ingest — without it the
                # tail shows a 5-12x spike that is cleanup debt, not
                # store growth (see SCALE.md row)
                import gc

                gc.collect()
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
            shifted = docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * max_id)
            )
            # all-new shingles per slice: suffix EVERY token with the
            # slice tag (worst-case store growth)
            salted = shifted.withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1_s{i}"),
            )
            t0 = time.perf_counter()
            incremental_novelty_ingest(spark, root, salted, f"n{i}", k=3)
            t_nov = time.perf_counter() - t0
            t0 = time.perf_counter()
            incremental_docfreq_ingest(spark, root, shifted, f"d{i}")
            t_df = time.perf_counter() - t0
            rec = {
                "i": i,
                "novelty_s": round(t_nov, 2),
                "novelty_store_rows": read_dataset(
                    spark,
                    root,
                    NOVELTY_STORE,
                    version=list_versions(root, NOVELTY_STORE)[-1],
                ).count(),
                "docfreq_s": round(t_df, 2),
                "docfreq_store_rows": read_dataset(
                    spark,
                    root,
                    DOCFREQ_STORE,
                    version=list_versions(root, DOCFREQ_STORE)[-1],
                ).count(),
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    tail = rows[-5:]
    head = rows[1:6]  # skip the warmup sample
    summary = {
        "sf_dir": sf_dir,
        "n_slices": n_slices,
        "novelty_s_head_mean": round(
            sum(r["novelty_s"] for r in head) / len(head), 2
        ),
        "novelty_s_tail_mean": round(
            sum(r["novelty_s"] for r in tail) / len(tail), 2
        ),
        "novelty_rows_final": rows[-1]["novelty_store_rows"],
        "docfreq_s_head_mean": round(
            sum(r["docfreq_s"] for r in head) / len(head), 2
        ),
        "docfreq_s_tail_mean": round(
            sum(r["docfreq_s"] for r in tail) / len(tail), 2
        ),
        "docfreq_rows_final": rows[-1]["docfreq_store_rows"],
    }
    # the drift verdicts live IN the artifact (self-describing, the
    # bench.py trusted-field lesson): flat == tail-mean <= head-mean x2
    for regime in ("novelty", "docfreq"):
        summary[f"{regime}_flat"] = (
            summary[f"{regime}_s_tail_mean"]
            <= 2 * summary[f"{regime}_s_head_mean"]
        )
    line = json.dumps({"summary": summary})
    print(line)
    artifact = os.environ.get(
        "STORE_GROWTH_ARTIFACT",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "STORE_GROWTH.json",
        ),
    )
    with open(artifact, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
