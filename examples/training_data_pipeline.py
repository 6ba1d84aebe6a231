"""Quickstart #2: an LLM training-data curation pipeline in ~50 lines.

Run:  python examples/training_data_pipeline.py [sf_dir]
      (default /root/testdata/sf0.001)

Flow: documents → quality gate → saturation audit (per-source n-gram
novelty + rare-token noise scoring) → substring-span screen
(rolling-shingle Lee-et-al dedup audit) → exact dedup → near dedup
(MinHash+LSH) → leakage-safe train/val/test split → chunk → pack into
fixed token budgets.  Every stage is the same operator the catalog exposes (and the
DuckDB oracle checks); this file just strings them together the way a
pipeline team would.  (The embedding-side variant of stage 2/3 is
``operators/similarity.semantic_dedup`` — SemDeDup — exposed as the
``semdedup_fixed`` catalog query.)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _t
from service_alerts_connector_spark.catalog_text import q_leakage_safe_split
from service_alerts_connector_spark.functions.text import token_count
from service_alerts_connector_spark.operators.chunking import (
    chunk_documents,
    pack_bins,
)
from service_alerts_connector_spark.operators.novelty import (
    doc_rarity_scores,
    ngram_novelty_by_source,
)
from service_alerts_connector_spark.operators.textdedup import (
    duplicate_substring_spans,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dedup_keep,
)
from service_alerts_connector_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[4]", shuffle_partitions=4)

    docs = _t(spark, sf_dir, "documents")
    print(f"ingested: {docs.count()} docs")

    # 1. quality gate (real pipelines: functions/text.py quality scores
    #    thresholded at the quality_deciles cutoffs)
    gated = docs.where(token_count(F.col("text")) >= 5)
    print(f"after quality gate: {gated.count()}")

    # 1b. saturation audit: which sources still contribute unseen
    #     n-grams (the collect-more signal — a near-zero novelty_ppm
    #     source adds nothing new), and which docs are rare-token-heavy
    #     noise.  At 100 TB the same scores come from the persistent
    #     stores (incremental_novelty_ingest / rarity_scores_from_store)
    #     instead of a full recompute.
    print("per-source n-gram novelty:")
    ngram_novelty_by_source(gated).show(5)
    print("rare-token-heaviest docs (noise candidates):")
    doc_rarity_scores(gated, top_n=3).show()

    # 1c. the incremental form of the same signal — the collect-more
    #     decision as a pipeline would actually run it: ingest arriving
    #     batches into the persistent first-occurrence store and read
    #     the saturation curve OFF THE STORE.  A flattening novelty_ppm
    #     says new data from this feed is mostly repeats — stop paying
    #     for it; a high tail says keep collecting.
    import shutil
    import tempfile

    from service_alerts_connector_spark.operators.novelty import (
        NOVELTY_STORE,
        incremental_novelty_ingest,
        novelty_curve,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    store_root = tempfile.mkdtemp(prefix="novelty_example_")
    try:
        for i in range(3):
            batch = gated.where(F.pmod("doc_id", F.lit(3)) == i)
            stats = incremental_novelty_ingest(
                spark, store_root, batch, f"batch-{i}", k=3
            ).collect()[0]
            print(
                f"ingest batch-{i}: {stats['n_shingles']} shingles, "
                f"{stats['n_novel']} novel "
                f"({stats['novelty_ppm'] / 10_000:.1f}%)"
            )
        print("saturation curve (from the store alone):")
        novelty_curve(
            read_dataset(spark, store_root, NOVELTY_STORE)
        ).show()
    finally:
        shutil.rmtree(store_root, ignore_errors=True)

    # 2. substring-span screen: drop docs that are mostly duplicated
    #    spans of earlier docs (>50% of tokens inside repeated 8-token
    #    shingles) — catches boilerplate-heavy and partially-copied docs
    #    that whole-doc dedup below would keep
    spans = duplicate_substring_spans(gated, k=8)
    screened = gated.join(
        spans.where(F.col("dup_ratio_ppm") <= 500_000).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    print(f"after substring-span screen: {screened.count()}")

    # 3. exact dedup, then near-dedup keep-representative over LSH pairs
    exact_kept = exact_dedup(screened, "text", "doc_id")
    sigs = minhash_signatures(exact_kept, num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    kept = near_dedup_keep(exact_kept, pairs, "doc_id")
    print(f"after exact+near dedup: {kept.count()}")

    # 4. leakage-safe split (cluster-aware: near-dups never straddle
    #    train and held-out), plus cluster-atomic CV folds for the
    #    evaluation loop (same discipline at fold granularity)
    split = q_leakage_safe_split(spark, sf_dir).join(
        kept, "doc_id", "left_semi"
    )
    split.groupBy("split").count().orderBy("split").show()
    from service_alerts_connector_spark.catalog_novelty import q_group_kfold

    folds = q_group_kfold(spark, sf_dir).join(kept, "doc_id", "left_semi")
    folds.groupBy("fold").count().orderBy("fold").show()

    # 5. chunk to 64-token windows (16 overlap), pack into 256-token bins
    #    across 4 shards (packing parallelizes per shard)
    chunks = chunk_documents(
        kept, "doc_id", "text", chunk_tokens=64, overlap_tokens=16
    ).withColumn("shard", F.pmod("doc_id", F.lit(4))).withColumn(
        "chunk_uid", F.col("doc_id") * 10_000 + F.col("chunk_idx")
    )
    packed = pack_bins(
        chunks,
        shard_col="shard",
        id_col="chunk_uid",
        tokens_col="n_chunk_tokens",
        capacity=256,
    )
    print(f"chunks: {chunks.count()}; example bins:")
    packed.groupBy("shard", "bin_idx").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("bin_tokens"),
    ).orderBy("shard", "bin_idx").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
