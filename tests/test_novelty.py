"""Corpus-saturation operators: per-source n-gram novelty attribution,
integer-idf rarity scoring, and the incremental first-occurrence shingle
store.  Pins the telescoping invariant (Σ per-batch novel ≡ distinct
total), sequential ≡ batch store equality, committed-redelivery
idempotence (original stats re-derived, no new version), the
irreversible shingle-k guard, and hand-computed batch-op results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.novelty import (
    NOVELTY_STORE,
    batch_shingle_digests,
    doc_rarity_scores,
    incremental_novelty_ingest,
    ngram_novelty_by_source,
)
from service_alerts_connector_spark.sources.parquet_io import list_versions


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_ngram_novelty_attributes_first_occurrence(spark):
    # doc 1 (src a): shingles {x y z}, {y z w}
    # doc 2 (src b): shingle {x y z} (seen) — contributes nothing new
    # doc 3 (src b): shingle {p q r} (new)
    df = _docs(
        spark,
        [
            (1, "a", "x y z w"),
            (2, "b", "x y z"),
            (3, "b", "p q r"),
        ],
    )
    out = {
        r["source"]: (r["n_shingles"], r["n_novel"], r["novelty_ppm"])
        for r in ngram_novelty_by_source(df, k=3).collect()
    }
    assert out["a"] == (2, 2, 1000000)
    # b contains {x y z} (owned by a) and {p q r} (owned by b)
    assert out["b"] == (2, 1, 500000)


def test_ngram_novelty_short_and_empty_docs(spark):
    # <3 tokens → one whole-text shingle; empty text → one '' shingle
    df = _docs(spark, [(1, "a", "hi there"), (2, "b", ""), (3, "c", "hi there")])
    out = {
        r["source"]: (r["n_shingles"], r["n_novel"])
        for r in ngram_novelty_by_source(df, k=3).collect()
    }
    assert out["a"] == (1, 1)
    assert out["b"] == (1, 1)  # the '' shingle, first seen in doc 2
    assert out["c"] == (1, 0)  # 'hi there' owned by doc 1 / source a


def test_doc_rarity_scores_integer_exact(spark):
    # 4 docs; token 'common' in all 4 (idf = 4e6 div 4 = 1e6),
    # 'rare' in one (idf = 4e6).  doc 4 = ['common','rare'] →
    # (1e6 + 4e6) div 2 = 2_500_000.
    df = _docs(
        spark,
        [
            (1, "s", "common"),
            (2, "s", "common"),
            (3, "s", "common"),
            (4, "s", "common rare"),
        ],
    )
    rows = {r["doc_id"]: r for r in doc_rarity_scores(df, top_n=10).collect()}
    assert rows[4]["rarity_micro"] == 2_500_000
    assert rows[4]["n_tokens"] == 2
    assert rows[1]["rarity_micro"] == 1_000_000
    # ordering: rarest first, then doc_id
    ordered = [r["doc_id"] for r in doc_rarity_scores(df, top_n=10).collect()]
    assert ordered == [4, 1, 2, 3]


def test_incremental_novelty_telescoping_invariant(spark, tmp_path):
    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y z w"), (2, "a", "p q r")])
    b2 = _docs(spark, [(3, "b", "x y z"), (4, "b", "m n o")])
    b3 = _docs(spark, [(5, "c", "m n o p")])
    stats = []
    for bid, b in (("b1", b1), ("b2", b2), ("b3", b3)):
        stats.append(
            incremental_novelty_ingest(spark, root, b, bid).collect()[0]
        )
    union = b1.unionByName(b2).unionByName(b3)
    total_distinct = batch_shingle_digests(union, 3).count()
    assert sum(r["n_novel"] for r in stats) == total_distinct
    # per-batch: b1 all-novel, b2's 'x y z' already seen
    assert stats[0]["n_novel"] == stats[0]["n_shingles"]
    assert stats[1]["n_novel"] == stats[1]["n_shingles"] - 1
    # store digests == batch-union digests (set semantics)
    from service_alerts_connector_spark.sources.parquet_io import read_dataset

    store = read_dataset(spark, root, NOVELTY_STORE)
    got = store.where(F.col("digest") != " batch").select("digest")
    assert got.distinct().count() == got.count() == total_distinct
    assert (
        got.join(batch_shingle_digests(union, 3), "digest", "left_anti").count()
        == 0
    )


def test_incremental_novelty_redelivery_is_idempotent(spark, tmp_path):
    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y z w")])
    b2 = _docs(spark, [(2, "b", "x y z")])
    first = incremental_novelty_ingest(spark, root, b1, "b1").collect()[0]
    incremental_novelty_ingest(spark, root, b2, "b2")
    n_versions = len(list_versions(root, NOVELTY_STORE))
    # redeliver b1 after later ingests: ORIGINAL stats, no new version
    again = incremental_novelty_ingest(spark, root, b1, "b1").collect()[0]
    assert again == first
    assert again["n_novel"] == 2  # not 0 — re-derived from first_batch
    assert len(list_versions(root, NOVELTY_STORE)) == n_versions


def test_incremental_novelty_k_mismatch_raises(spark, tmp_path):
    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y z w")])
    incremental_novelty_ingest(spark, root, b1, "b1", k=3)
    with pytest.raises(ValueError, match="built with k=3"):
        incremental_novelty_ingest(spark, root, b1, "b2", k=2)


def test_novelty_store_matches_batch_mirror(spark, tmp_path):
    """Sequential per-source ingests reproduce the batch query's
    attribution: ingesting sources in min-doc_id order makes
    first_batch ≡ first-occurrence source."""
    root = str(tmp_path)
    docs = _docs(
        spark,
        [
            (1, "a", "x y z w"),
            (2, "a", "p q r"),
            (3, "b", "x y z"),
            (4, "b", "m n o"),
            (5, "c", "m n o p"),
        ],
    )
    batch_out = {
        r["source"]: r["n_novel"]
        for r in ngram_novelty_by_source(docs, k=3).collect()
    }
    for src in ("a", "b", "c"):
        st = incremental_novelty_ingest(
            spark, root, docs.where(F.col("source") == src), src
        ).collect()[0]
        assert st["n_novel"] == batch_out[src], src


def _stage_docs(tmp_path, batches):
    import json

    staged = tmp_path / "staged"
    staged.mkdir()
    for b, rows in enumerate(batches):
        with open(staged / f"b{b}.jsonl", "w") as f:
            for doc_id, source, text in rows:
                f.write(
                    json.dumps(
                        {"doc_id": doc_id, "source": source, "text": text}
                    )
                    + "\n"
                )
    return staged


def test_streaming_novelty_loop(spark, tmp_path):
    from service_alerts_connector_spark.operators.novelty import (
        novelty_curve,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )
    from service_alerts_connector_spark.streaming.stats_stream import (
        run_novelty_ingest,
    )

    batches = [
        [(1, "a", "x y z w"), (2, "a", "p q r")],
        [(3, "b", "x y z"), (4, "b", "m n o")],
    ]
    staged = _stage_docs(tmp_path, batches)
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_novelty_ingest(
        spark,
        stream,
        state_root=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    store = read_dataset(spark, str(tmp_path / "state"), NOVELTY_STORE)
    # streamed ≡ batch: store digests equal the union's distinct shingles
    union = _docs(spark, [r for b in batches for r in b])
    expected = batch_shingle_digests(union, 3)
    got = store.where(F.col("digest") != " batch").select("digest")
    assert got.count() == expected.count()
    assert got.join(expected, "digest", "left_anti").count() == 0
    # the saturation curve re-derives from the store alone: batch 0 all
    # novel (3 shingles: 'x y z','y z w','p q r'), batch 1 adds 'm n o'
    curve = novelty_curve(store).collect()
    assert [r["n_novel"] for r in curve] == [3, 1]
    # ledger keys are namespaced per checkpoint lineage and zero-padded
    # so the curve's string order IS arrival order
    prefixes = {r["batch_id"].rsplit("-", 1)[0] for r in curve}
    suffixes = [r["batch_id"].rsplit("-", 1)[1] for r in curve]
    assert len(prefixes) == 1 and suffixes == ["0" * 12, "0" * 11 + "1"]
    marker = tmp_path / "ckpt" / "ledger_namespace.txt"
    assert marker.read_text() == prefixes.pop()


def test_novelty_curve_counts_zero_contribution_batches(spark, tmp_path):
    from service_alerts_connector_spark.operators.novelty import (
        novelty_curve,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    root = str(tmp_path)
    incremental_novelty_ingest(
        spark, root, _docs(spark, [(1, "a", "x y z")]), "b1"
    )
    incremental_novelty_ingest(
        spark, root, _docs(spark, [(2, "b", "x y z")]), "b2"
    )
    store = read_dataset(spark, root, NOVELTY_STORE)
    curve = {r["batch_id"]: r["n_novel"] for r in novelty_curve(store).collect()}
    assert curve == {"b1": 1, "b2": 0}


def test_incremental_docfreq_sequential_equals_batch(spark, tmp_path):
    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        batch_docfreq_cells,
        incremental_docfreq_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y x"), (2, "a", "y z")])
    b2 = _docs(spark, [(3, "b", "z w")])
    incremental_docfreq_ingest(spark, root, b1, "b1")
    stats = incremental_docfreq_ingest(spark, root, b2, "b2").collect()[0]
    assert (stats["n_docs"], stats["vocab_size"]) == (3, 4)
    store = read_dataset(spark, root, DOCFREQ_STORE)
    got = sorted(
        (r["tok"], r["dfreq"])
        for r in store.where(
            ~F.col("tok").startswith(" batch")
            & ~F.col("tok").startswith(" docsketch")
        ).collect()
    )
    expected = sorted(
        (r["tok"], r["dfreq"])
        for r in batch_docfreq_cells(b1.unionByName(b2)).collect()
    )
    assert got == expected  # x:1 y:2 z:2 w:1 + n_docs:3


def test_docfreq_ingest_staged_cells_equivalent(spark, tmp_path):
    """The r16 staged-cells hook: passing a pre-pinned
    batch_docfreq_cells frame must leave the committed store and the
    returned stats byte-identical to the internal-cells path, and the
    tripwire must still see the BATCH (not the cells) — a replayed doc
    under a fresh batch_id still raises."""
    import pytest

    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        batch_docfreq_cells,
        incremental_docfreq_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    b1 = _docs(spark, [(1, "a", "x y x"), (2, "a", "y z")])
    b2 = _docs(spark, [(3, "b", "z w")])

    def run(root, staged):
        kw1 = (
            {"batch_cells": batch_docfreq_cells(b1).localCheckpoint(True)}
            if staged
            else {}
        )
        kw2 = (
            {"batch_cells": batch_docfreq_cells(b2).localCheckpoint(True)}
            if staged
            else {}
        )
        incremental_docfreq_ingest(spark, root, b1, "b1", **kw1)
        stats = incremental_docfreq_ingest(
            spark, root, b2, "b2", **kw2
        ).collect()[0]
        store = sorted(
            (r["tok"], r["dfreq"])
            for r in read_dataset(spark, root, DOCFREQ_STORE).collect()
        )
        return (stats["n_docs"], stats["vocab_size"]), store

    plain = run(str(tmp_path / "plain"), staged=False)
    staged = run(str(tmp_path / "staged"), staged=True)
    assert plain == staged

    # tripwire still fires on a replayed doc even when cells are staged
    replay = _docs(spark, [(1, "a", "x y x")])
    with pytest.raises(ValueError, match="re-sends"):
        incremental_docfreq_ingest(
            spark,
            str(tmp_path / "staged"),
            replay,
            "b3",
            batch_cells=batch_docfreq_cells(replay).localCheckpoint(True),
        )


def test_incremental_docfreq_redelivery_noop(spark, tmp_path):
    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        incremental_docfreq_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
    )

    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y")])
    s1 = incremental_docfreq_ingest(spark, root, b1, "b1").collect()[0]
    n_versions = len(list_versions(root, DOCFREQ_STORE))
    again = incremental_docfreq_ingest(spark, root, b1, "b1").collect()[0]
    assert again == s1  # additive counts NOT doubled
    assert len(list_versions(root, DOCFREQ_STORE)) == n_versions
    store = read_dataset(spark, root, DOCFREQ_STORE)
    x = store.where(F.col("tok") == "x").collect()[0]
    assert x["dfreq"] == 1


def test_rarity_scores_from_store_match_batch_query(spark, tmp_path):
    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        incremental_docfreq_ingest,
        rarity_scores_from_store,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    root = str(tmp_path)
    docs = _docs(
        spark,
        [
            (1, "s", "common common"),
            (2, "s", "common rare"),
            (3, "s", "common mid"),
            (4, "s", "mid rare rare"),
        ],
    )
    # two disjoint ingests, then score the WHOLE corpus off the store
    incremental_docfreq_ingest(spark, root, docs.where("doc_id <= 2"), "b1")
    incremental_docfreq_ingest(spark, root, docs.where("doc_id > 2"), "b2")
    store = read_dataset(spark, root, DOCFREQ_STORE)
    got = sorted(
        map(tuple, rarity_scores_from_store(store, docs).collect())
    )
    expected = sorted(
        map(tuple, doc_rarity_scores(docs, top_n=1000).collect())
    )
    assert got == expected


def test_rarity_scores_unseen_token_maximally_rare(spark, tmp_path):
    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        incremental_docfreq_ingest,
        rarity_scores_from_store,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    root = str(tmp_path)
    corpus = _docs(spark, [(1, "s", "a b"), (2, "s", "a c")])
    incremental_docfreq_ingest(spark, root, corpus, "b1")
    store = read_dataset(spark, root, DOCFREQ_STORE)
    new_doc = _docs(spark, [(9, "s", "zzz")])
    r = rarity_scores_from_store(store, new_doc).collect()[0]
    assert r["rarity_micro"] == 2 * 1000000  # n_docs * 1e6


def test_streaming_docfreq_loop_scores_new_batch(spark, tmp_path):
    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        batch_docfreq_cells,
        rarity_scores_from_store,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )
    from service_alerts_connector_spark.streaming.stats_stream import (
        run_docfreq_ingest,
    )

    batches = [
        [(1, "s", "common common"), (2, "s", "common rare")],
        [(3, "s", "common mid"), (4, "s", "mid rare rare")],
    ]
    staged = _stage_docs(tmp_path, batches)
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_docfreq_ingest(
        spark,
        stream,
        state_root=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    store = read_dataset(spark, str(tmp_path / "state"), DOCFREQ_STORE)
    union = _docs(spark, [r for b in batches for r in b])
    got = sorted(
        (r["tok"], r["dfreq"])
        for r in store.where(
            ~F.col("tok").startswith(" batch")
            & ~F.col("tok").startswith(" docsketch")
        ).collect()
    )
    expected = sorted(
        (r["tok"], r["dfreq"]) for r in batch_docfreq_cells(union).collect()
    )
    assert got == expected
    # store-fed scoring over the streamed corpus == the batch query
    scored = sorted(
        map(tuple, rarity_scores_from_store(store, union).collect())
    )
    batch_q = sorted(
        map(tuple, doc_rarity_scores(union, top_n=1000).collect())
    )
    assert scored == batch_q


@pytest.fixture()
def crash_before_snapshot(monkeypatch):
    import service_alerts_connector_spark.sources.parquet_io as pio

    real = pio.write_dataset
    state = {"armed": False}

    def wrapper(df, root, dataset, **kw):
        if state["armed"]:
            state["armed"] = False
            kw["latest_copy"] = False
            real(df, root, dataset, **kw)
            raise RuntimeError("injected crash: died before snapshot refresh")
        return real(df, root, dataset, **kw)

    monkeypatch.setattr(pio, "write_dataset", wrapper)
    return lambda: state.update(armed=True)


def test_docfreq_crash_redelivery_does_not_double_count(
    spark, tmp_path, crash_before_snapshot
):
    """Additive dfreq cells are the double-count class: the version
    commit SUCCEEDED (cells + ledger atomically), only the snapshot
    refresh died — the redelivered batch must be a ledgered no-op."""
    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        batch_docfreq_cells,
        incremental_docfreq_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y"), (2, "a", "y z")])
    b2 = _docs(spark, [(3, "b", "y w")])
    incremental_docfreq_ingest(spark, root, b1, "b1")

    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_docfreq_ingest(spark, root, b2, "b2")

    incremental_docfreq_ingest(spark, root, b2, "b2")  # redelivery
    # pin the newest committed VERSION: the crashed ingest died before
    # the snapshot refresh, and a ledgered no-op redelivery deliberately
    # writes nothing — `current` stays stale until the next real ingest
    store = read_dataset(
        spark, root, DOCFREQ_STORE,
        version=list_versions(root, DOCFREQ_STORE)[-1],
    )
    got = sorted(
        (r["tok"], r["dfreq"])
        for r in store.where(
            ~F.col("tok").startswith(" batch")
            & ~F.col("tok").startswith(" docsketch")
        ).collect()
    )
    expected = sorted(
        (r["tok"], r["dfreq"])
        for r in batch_docfreq_cells(b1.unionByName(b2)).collect()
    )
    assert got == expected  # y stays 3, never 4


def test_novelty_store_crash_redelivery_converges(
    spark, tmp_path, crash_before_snapshot
):
    """Set-union first-wins is replay-idempotent at the set level AND the
    metric level here: the crashed ingest's version committed, so the
    retry re-derives the ORIGINAL stats from first_batch."""
    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y z w")])
    b2 = _docs(spark, [(2, "b", "x y z"), (3, "b", "m n o")])
    incremental_novelty_ingest(spark, root, b1, "b1")

    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_novelty_ingest(spark, root, b2, "b2")

    st = incremental_novelty_ingest(spark, root, b2, "b2").collect()[0]
    # b2's docs are exactly 3 tokens each → one shingle apiece;
    # 'x y z' was introduced by b1, so only 'm n o' is novel
    assert (st["n_shingles"], st["n_novel"]) == (2, 1)
    n_all = batch_shingle_digests(b1.unionByName(b2), 3).count()
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    store = read_dataset(
        spark, root, NOVELTY_STORE,
        version=list_versions(root, NOVELTY_STORE)[-1],
    )
    assert (
        store.where(F.col("digest") != " batch").distinct().count() == n_all
    )


def test_ngram_novelty_properties_on_random_corpora(spark):
    """Seeded-random corpora property check (one Spark round-trip per
    corpus, hypothesis-style invariants without per-example sessions):
    (1) telescoping — Σ per-source n_novel == corpus-wide distinct
    shingles; (2) bounds — 0 ≤ n_novel ≤ n_shingles, ppm ≤ 10⁶; (3) the
    min-doc_id document's source always owns at least one shingle."""
    import random

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(rng.randint(4, 12))]
        rows = [
            (
                i,
                f"s{rng.randint(0, 3)}",
                " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))),
            )
            for i in range(1, rng.randint(10, 40))
        ]
        df = _docs(spark, rows)
        out = ngram_novelty_by_source(df, k=3).collect()
        total_distinct = batch_shingle_digests(df, 3).count()
        assert sum(r["n_novel"] for r in out) == total_distinct, seed
        for r in out:
            assert 0 <= r["n_novel"] <= r["n_shingles"], (seed, r)
            assert 0 <= r["novelty_ppm"] <= 1_000_000, (seed, r)
        first_source = min(rows)[1]
        owned = {r["source"]: r["n_novel"] for r in out}
        assert owned[first_source] >= 1, seed


def test_novelty_store_order_insensitive_digest_set(spark, tmp_path):
    """Set-union commutativity: ingesting the same corpus under any
    batch partition/order lands the same digest set (attribution
    differs by design — first_batch follows arrival order)."""
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    rows = [
        (1, "a", "x y z w"),
        (2, "a", "p q r"),
        (3, "b", "x y z"),
        (4, "b", "m n o"),
        (5, "c", "m n o p"),
    ]
    digests = {}
    for label, order in (("fwd", [0, 1, 2]), ("rev", [2, 1, 0])):
        root = str(tmp_path / label)
        parts = [rows[0:2], rows[2:4], rows[4:5]]
        for i in order:
            incremental_novelty_ingest(
                spark, root, _docs(spark, parts[i]), f"b{i}"
            )
        store = read_dataset(spark, root, NOVELTY_STORE)
        digests[label] = {
            r["digest"]
            for r in store.where(F.col("digest") != " batch").collect()
        }
    assert digests["fwd"] == digests["rev"]


def test_ngram_novelty_null_source_keeps_telescoping(spark):
    """A shingle first seen in a NULL-source doc must still be owned by
    SOMEBODY (the '<null>' group) or Σ n_novel undercounts the
    vocabulary — collect_set drops NULLs and min_by would return a NULL
    owner without the coalesce."""
    df = _docs(
        spark,
        [
            (1, None, "x y z w"),
            (2, "b", "x y z"),
            (3, "b", "p q r"),
        ],
    )
    out = ngram_novelty_by_source(df, k=3).collect()
    total = batch_shingle_digests(df, 3).count()
    assert sum(r["n_novel"] for r in out) == total
    by_src = {r["source"]: r["n_novel"] for r in out}
    assert by_src["<null>"] == 2  # 'x y z' and 'y z w'
    assert by_src["b"] == 1  # 'p q r'


def test_novelty_store_missing_sidecar_raises(spark, tmp_path):
    import os

    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y z w")])
    incremental_novelty_ingest(spark, root, b1, "b1", k=3)
    os.remove(os.path.join(root, NOVELTY_STORE, "shingle_k.txt"))
    with pytest.raises(ValueError, match="no shingle_k.txt"):
        incremental_novelty_ingest(spark, root, b1, "b2", k=2)


def test_sample_store_missing_sidecar_raises(spark, tmp_path):
    import os

    from service_alerts_connector_spark.operators.topk import (
        SAMPLE_STORE,
        incremental_sample_ingest,
    )

    root = str(tmp_path)
    batch = spark.range(100).select(F.col("id").alias("doc_id"))
    incremental_sample_ingest(spark, root, batch, "doc_id", ["doc_id"], k=16)
    os.remove(os.path.join(root, SAMPLE_STORE, "sample_k.txt"))
    with pytest.raises(ValueError, match="no sample_k.txt"):
        incremental_sample_ingest(
            spark, root, batch, "doc_id", ["doc_id"], k=32
        )


def test_group_kfold_is_cluster_atomic(spark):
    """Every duplicate cluster maps to exactly ONE fold (the property the
    query exists for), and folds span the full 0..4 range on the sf0.001
    corpus.  Guards refactors that might re-derive the fold from the
    doc_id instead of the group key."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("testdata not present")
    from service_alerts_connector_spark.catalog_novelty import q_group_kfold

    out = q_group_kfold(spark, sf)
    violations = (
        out.groupBy("group_key")
        .agg(F.countDistinct("fold").alias("nf"))
        .where(F.col("nf") > 1)
        .count()
    )
    assert violations == 0
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds == {0, 1, 2, 3, 4}
    # and at least one real multi-doc cluster exercised the property
    assert (
        out.groupBy("group_key").count().where(F.col("count") > 1).count()
        > 0
    )

def test_group_fold_balance_within_binomial_envelope(spark):
    """Fold sizes under the group-hash assignment stay within a 1.5x
    max/min envelope at >=1k groups (the balance the cluster-atomicity
    trade-off costs; binomial std at n=1500, p=0.2 is ~15.5, so 1.5x
    would need a >4-sigma excursion).  md5 is deterministic, so each
    seeded corpus is a fixed fixture, never a flake.  Exercises the
    SAME ``group_fold_expr`` the certified query uses."""
    from service_alerts_connector_spark.catalog_novelty import (
        group_fold_expr,
    )

    for seed in (0, 1, 2):
        groups = spark.range(1500).select(
            F.concat(
                F.lit(f"s{seed}-grp-"), F.col("id").cast("string")
            ).alias("group_key"),
            # seeded cluster sizes 1..4: doc-count balance must hold
            # under heterogeneous cluster sizes, not just singletons
            (F.pmod(F.col("id") * (seed + 7), F.lit(4)) + 1).alias("sz"),
        )
        docs = groups.select(
            "group_key",
            F.explode(F.sequence(F.lit(1), F.col("sz"))).alias("i"),
        )
        per_fold = (
            docs.withColumn("fold", group_fold_expr(F.col("group_key")))
            .groupBy("fold")
            .agg(
                F.countDistinct("group_key").alias("n_groups"),
                F.count(F.lit(1)).alias("n_docs"),
            )
            .collect()
        )
        assert {r["fold"] for r in per_fold} == {0, 1, 2, 3, 4}
        for col in ("n_groups", "n_docs"):
            vals = [r[col] for r in per_fold]
            assert max(vals) / min(vals) < 1.5, (seed, col, vals)


def test_group_kfold_balance_audit_consistent(spark):
    """The balance-audit query's rows reconcile with the assignment it
    audits: n_docs sums to the corpus size, n_groups to >= the distinct
    group count per fold, and share_ppm is the exact integer share."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("testdata not present")
    from service_alerts_connector_spark.catalog_novelty import (
        q_group_kfold,
        q_group_kfold_balance,
    )

    audit = q_group_kfold_balance(spark, sf).collect()
    assigned = q_group_kfold(spark, sf)
    tot = assigned.count()
    assert sum(r["n_docs"] for r in audit) == tot
    for r in audit:
        assert r["share_ppm"] == r["n_docs"] * 1_000_000 // tot
        assert 0 < r["n_groups"] <= r["n_docs"]

def test_docfreq_doc_overlap_tripwire_trips_on_replayed_docs(
    spark, tmp_path
):
    """A doc re-sent under a NEW batch_id is the uncheckable-contract
    violation: the KMV doc-id sketch (which covers the whole corpus at
    test scale, k=1024 >> n) must trip with the offending ids, and the
    store must stay on its pre-violation version."""
    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        incremental_docfreq_ingest,
    )

    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y"), (2, "a", "y z")])
    incremental_docfreq_ingest(spark, root, b1, "b1")
    n_versions = len(list_versions(root, DOCFREQ_STORE))
    # doc 2 replayed inside an otherwise-new batch under a new batch_id
    bad = _docs(spark, [(2, "a", "y z"), (3, "b", "w")])
    with pytest.raises(ValueError, match="re-sends documents"):
        incremental_docfreq_ingest(spark, root, bad, "b2")
    assert len(list_versions(root, DOCFREQ_STORE)) == n_versions
    # a genuinely disjoint batch still ingests cleanly afterwards
    ok = _docs(spark, [(3, "b", "w")])
    stats = incremental_docfreq_ingest(spark, root, ok, "b3").collect()[0]
    assert (stats["n_docs"], stats["vocab_size"]) == (3, 4)


def test_docfreq_sketch_rides_version_and_survives_redelivery(
    spark, tmp_path, crash_before_snapshot
):
    """The sketch commits atomically with the counts: a crash after the
    version commit + same-batch_id redelivery stays a ledgered no-op
    (never accused as overlap — the ledger check runs first), and the
    sketch rows are bounded and carry dfreq 0."""
    from service_alerts_connector_spark.operators.novelty import (
        _DF_SKETCH_PREFIX,
        _DOC_SKETCH_K,
        DOCFREQ_STORE,
        incremental_docfreq_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )

    root = str(tmp_path)
    b1 = _docs(spark, [(1, "a", "x y"), (2, "a", "y z")])
    incremental_docfreq_ingest(spark, root, b1, "b1")

    crash_before_snapshot()
    b2 = _docs(spark, [(3, "b", "y w")])
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_docfreq_ingest(spark, root, b2, "b2")
    # redelivery under the SAME batch_id: ledgered no-op, not an
    # overlap accusation (all of b2's docs are in the committed sketch)
    stats = incremental_docfreq_ingest(spark, root, b2, "b2").collect()[0]
    assert (stats["n_docs"], stats["vocab_size"]) == (3, 4)

    store = read_dataset(
        spark, root, DOCFREQ_STORE,
        version=list_versions(root, DOCFREQ_STORE)[-1],
    )
    sketch = store.where(
        F.col("tok").startswith(_DF_SKETCH_PREFIX)
    ).collect()
    assert len(sketch) == 3  # one digest per distinct ingested doc id
    assert len(sketch) <= _DOC_SKETCH_K
    assert all(r["dfreq"] == 0 for r in sketch)

def test_streaming_docfreq_loop_surfaces_overlap_tripwire(spark, tmp_path):
    """A doc replayed under a NEW stream batch must fail the streaming
    ingest loop LOUDLY (the foreachBatch step re-raises through the
    query), and the store must stay on its pre-violation version —
    silent absorption would be the exact double-count the tripwire
    exists to stop."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
    )
    from service_alerts_connector_spark.streaming.stats_stream import (
        run_docfreq_ingest,
    )

    batches = [
        [(1, "s", "x y"), (2, "s", "y z")],
        [(2, "s", "y z"), (3, "s", "w")],  # doc 2 replayed
    ]
    staged = _stage_docs(tmp_path, batches)
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    with pytest.raises(
        (StreamingQueryException, Py4JJavaError)
    ) as excinfo:
        run_docfreq_ingest(
            spark,
            stream,
            state_root=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
    assert "re-sends documents" in str(excinfo.value)
    versions = list_versions(str(tmp_path / "state"), DOCFREQ_STORE)
    assert len(versions) == 1  # only batch 0 committed


def test_docfreq_tripwire_zero_false_positives_on_clean_ingests(
    spark, tmp_path
):
    """Zero-FP property (seeded): across 20+ clean DISJOINT ingests of
    varying batch sizes, the KMV doc-id tripwire never accuses — a
    repeated md5 digest IS a repeated id, so unique ids can never trip
    (the docstring's zero-false-positive claim, pinned mechanically)."""
    import random

    from service_alerts_connector_spark.operators.novelty import (
        incremental_docfreq_ingest,
    )

    rng = random.Random(20250816)
    root = str(tmp_path)
    next_id, total = 0, 0
    for i in range(20):
        size = rng.randint(1, 64)
        rows = [
            (next_id + j, "s", f"tok{(next_id + j) % 7} common")
            for j in range(size)
        ]
        next_id += size
        total += size
        stats = incremental_docfreq_ingest(
            spark, root, _docs(spark, rows), f"clean-{i}"
        ).collect()[0]
        assert stats["n_docs"] == total  # never raised, counts additive


def test_docfreq_tripwire_detection_floor_full_batch_replay(
    spark, tmp_path
):
    """Detection-floor property: with the sketch at k=1024 and N ≈ 2.1k
    ingested docs (the 1−e^(−bk/N) regime the docstring claims, N ≤
    100k), a fully replayed batch of b = 64 docs under a NEW batch_id
    must trip — P(miss) = Π(1 − k/N) ≈ e^(−64·0.49) here, and the
    fixed seeded ids make the outcome deterministic: at least one of
    the 64 digests lands in the bottom-k, the ingest raises, and the
    store stays on its pre-violation version."""
    from service_alerts_connector_spark.operators.novelty import (
        _DOC_SKETCH_K,
        DOCFREQ_STORE,
        incremental_docfreq_ingest,
    )

    assert _DOC_SKETCH_K == 1024  # the regime the docstring claims
    root = str(tmp_path)
    n_per, ids = 700, 0
    for i in range(3):  # N = 2100 > k: the sketch is genuinely partial
        rows = [
            (ids + j, "s", f"tok{(ids + j) % 11} base") for j in range(n_per)
        ]
        ids += n_per
        incremental_docfreq_ingest(
            spark, root, _docs(spark, rows), f"base-{i}"
        )
    n_versions = len(list_versions(root, DOCFREQ_STORE))

    import random

    rng = random.Random(7)
    replay_ids = rng.sample(range(n_per), 64)  # 64 docs from batch 0
    replay = _docs(
        spark, [(i, "s", f"tok{i % 11} base") for i in replay_ids]
    )
    with pytest.raises(ValueError, match="re-sends documents"):
        incremental_docfreq_ingest(spark, root, replay, "replayed")
    assert len(list_versions(root, DOCFREQ_STORE)) == n_versions
