"""Document chunking, per-source quota, TF-IDF, inverted index."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.chunking import (
    chunk_documents,
    pack_bins,
    source_quota,
)
from service_alerts_connector_spark.operators.tfidf import (
    inverted_index,
    tfidf_top_terms,
)


def _txt(n: int) -> str:
    return " ".join(f"t{i}" for i in range(n))


def test_chunk_windows_cover_without_redundant_tail(spark):
    df = spark.createDataFrame(
        [(1, _txt(10)), (2, _txt(3)), (3, ""), (4, _txt(5))],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=5, overlap_tokens=2)
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in out.collect()
    }
    # doc 1: 10 tokens, step 3 -> chunks at 0,3,6 (last covers to the end)
    assert rows[(1, 0)] == ("t0 t1 t2 t3 t4", 5)
    assert rows[(1, 1)] == ("t3 t4 t5 t6 t7", 5)
    assert rows[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert (1, 3) not in rows
    # short doc -> single chunk; empty doc -> no chunks; exact fit -> one
    assert rows[(2, 0)] == ("t0 t1 t2", 3)
    assert not any(d == 3 for d, _ in rows)
    assert rows[(4, 0)] == ("t0 t1 t2 t3 t4", 5)
    assert (4, 1) not in rows


def test_chunk_overlap_reconstructs_document(spark):
    df = spark.createDataFrame([(7, _txt(100))], "doc_id long, text string")
    out = (
        chunk_documents(df, chunk_tokens=16, overlap_tokens=4)
        .orderBy("chunk_idx")
        .collect()
    )
    step = 12
    rebuilt: list[str] = []
    for r in out:
        toks = r["chunk_text"].split(" ")
        rebuilt.extend(toks if r["chunk_idx"] == 0 else toks[4:])
    # overlapping windows stitch back to the original token stream
    assert rebuilt == _txt(100).split(" ")
    assert out[0]["chunk_idx"] == 0 and len(out) == 1 + -(-(100 - 16) // step)


def test_source_quota_deterministic_cap(spark):
    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_quota(df, "source", "doc_id", quota=4)
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"s0": 4, "s1": 4, "s2": 4}
    # stable across runs (hash order, not partition order)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in source_quota(df, quota=4).collect())
    assert a == b
    assert out.where(F.col("quota_rank") > 4).count() == 0


def test_tfidf_ranks_distinctive_terms_first(spark):
    df = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common yak yak"),
            (3, "common plain"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # the corpus-wide 'common' term never outranks a doc-unique term
    assert top == {1: "zebra", 2: "yak", 3: "plain"}


def test_inverted_index_cap_and_df(spark):
    df = spark.createDataFrame(
        [(i, "shared unique%d" % i) for i in range(30)],
        "doc_id long, text string",
    )
    out = inverted_index(df, min_df=2, posting_cap=10).collect()
    assert len(out) == 1  # only 'shared' reaches min_df
    row = out[0]
    assert row["term"] == "shared" and row["df"] == 30
    assert row["posting_preview"] == ",".join(str(i) for i in range(10))


def test_chunking_properties_generated(spark):
    """Property batch (seeded): for 60 random (n_tokens, chunk, overlap)
    shapes, the chunk count matches the closed form, windows reconstruct
    the document exactly, and only the last window may be short."""
    import random

    rng = random.Random(7)
    for chunk, overlap in [(2, 0), (5, 2), (16, 4), (16, 15), (33, 7), (40, 0)]:
        step = chunk - overlap
        sizes = {cid: rng.randrange(0, 200) for cid in range(10)}
        df = spark.createDataFrame(
            [(cid, _txt(n) if n else "") for cid, n in sizes.items()],
            "doc_id long, text string",
        )
        got: dict[int, list] = {cid: [] for cid in sizes}
        for r in chunk_documents(
            df, chunk_tokens=chunk, overlap_tokens=overlap
        ).collect():
            got[r["doc_id"]].append(r)
        for cid, n in sizes.items():
            rows = sorted(got[cid], key=lambda r: r["chunk_idx"])
            exp = 0 if n == 0 else (1 if n <= chunk else 1 + -(-(n - chunk) // step))
            assert len(rows) == exp, (cid, chunk, overlap, n)
            rebuilt: list[str] = []
            for r in rows:
                toks = r["chunk_text"].split(" ")
                rebuilt.extend(toks if r["chunk_idx"] == 0 else toks[overlap:])
                assert r["n_chunk_tokens"] == len(toks)
            if rows:
                assert rebuilt == _txt(n).split(" "), (cid, chunk, overlap, n)
                for r in rows[:-1]:  # only the last window may be short
                    assert r["n_chunk_tokens"] == chunk


def test_pack_bins_offsets_bounded_property(spark):
    import random

    rng = random.Random(11)
    # docs under the capacity: each start advances the running sum by < 256,
    # so bin indices advance by at most 1 -> contiguity must hold.  (Docs
    # LONGER than a bin legitimately straddle and may skip bins entirely.)
    rows = [
        (i, f"s{rng.randrange(4)}", rng.randrange(0, 256)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = pack_bins(df, capacity=256).collect()
    assert all(0 <= r["offset_in_bin"] < 256 for r in out)
    by_shard: dict[str, set] = {}
    for r in out:
        by_shard.setdefault(r["source"], set()).add(r["bin_idx"])
    for shard, bins in by_shard.items():
        assert bins == set(range(max(bins) + 1)), shard


def test_assign_sequential_ids_dense_and_stable(spark):
    from service_alerts_connector_spark.operators.chunking import (
        assign_sequential_ids,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    out = assign_sequential_ids(df, "k", n_buckets=16)
    ids = sorted(r["seq_id"] for r in out.collect())
    assert ids == list(range(500))  # dense 0..n-1, no gaps or dups
    again = sorted(
        (r["k"], r["seq_id"]) for r in assign_sequential_ids(df, "k", n_buckets=16).collect()
    )
    first = sorted((r["k"], r["seq_id"]) for r in out.collect())
    assert again == first  # stable across runs
    # repartitioning the input does not change the assignment
    re = sorted(
        (r["k"], r["seq_id"])
        for r in assign_sequential_ids(df.repartition(7), "k", n_buckets=16).collect()
    )
    assert re == first


def test_assign_sequential_ids_matches_global_hash_order(spark):
    """With ANY n_buckets, ids must equal the rank in plain global
    (md5, key) order — the monotone range-bucket invariant."""
    import hashlib

    from service_alerts_connector_spark.operators.chunking import (
        assign_sequential_ids,
    )

    keys = list(range(300))
    expect = {
        k: i
        for i, k in enumerate(
            sorted(keys, key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k))
        )
    }
    for nb in (1, 16, 256):
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = {
            r["k"]: r["seq_id"]
            for r in assign_sequential_ids(df, "k", n_buckets=nb).collect()
        }
        assert got == expect, nb


def test_bpe_merge_step_matches_pure_python(spark, tmp_path):
    """The distributed adjacent-pair count equals a pure-Python count over
    the same corpus (seeded random), including the (freq desc, a, b)
    ordering of the merge candidates."""
    import collections
    import random

    from service_alerts_connector_spark.catalog_corpus import (
        q_bpe_merge_step,
    )

    rng = random.Random(11)
    vocab = ["ab", "cd", "ef", "gh", "ij"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(60)
    ]
    spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "source", F.lit("s")
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [
        ((r["a"], r["b"]), r["freq"])
        for r in q_bpe_merge_step(spark, str(tmp_path)).collect()
    ]
    counts = collections.Counter()
    for _, text in docs:
        toks = text.split()
        for i in range(len(toks) - 1):
            counts[(toks[i], toks[i + 1])] += 1
    want = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:20]
    assert got == want


def test_quota_allocation_sums_to_budget(spark):
    """Largest-remainder apportionment must hit the budget EXACTLY and
    never deviate from a source's fair share by more than one slot."""
    from service_alerts_connector_spark.catalog_corpus import (
        q_quota_allocation,
    )

    rows = q_quota_allocation(spark, "/root/testdata/sf0.001").collect()
    total_alloc = sum(r["allocation"] for r in rows)
    assert total_alloc == 10000
    n_total = sum(r["n"] for r in rows)
    for r in rows:
        fair = r["n"] * 10000 / n_total
        assert abs(r["allocation"] - fair) < 1.0
        assert r["allocation"] - r["base"] in (0, 1)
