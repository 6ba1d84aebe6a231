"""Document deduplication operators for training-data pipelines.

Four tiers, each a pure DataFrame plan (no Python in the hot path):

* exact        — md5 content hash, group, keep min-key representative.
* MinHash+LSH  — k salted min-hashes per doc (one aggregation), banded into
                 buckets, candidate pairs from a self-equi-join on
                 (band, band_hash).  The scale path: cost is O(docs × k)
                 plus a join keyed on buckets, never O(docs²).
* SimHash      — 32-bit majority-vote signature over token hashes; near-dup
                 pairs via hamming distance on bit_count(xor).
* n-gram Jaccard — exact verification on candidate pairs (or, for small
                 corpora, all pairs sharing a shingle).

Design notes for 100 TB: signatures are fixed-width columns computed in one
groupBy; LSH banding multiplies rows by #bands only; the candidate join keys
on band buckets, so skew = genuinely-duplicated content — AQE skew-join
handles the pathological all-identical case.  Exact Jaccard runs only on
LSH-surviving pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from service_alerts_connector_spark.functions.text import (
    token_hash32,
    tokens,
    word_shingles_of,
)


def _spread(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Repartition a small-file scan up to the cluster's parallelism before a
    CPU-bound expansion (shingling/hashing).  A 100 TB corpus arrives in
    thousands of partitions already; a single-file test corpus arrives in one
    — without this, every md5 below runs on one core.

    ``key_col`` (r16): when the downstream aggregation groups on a unique
    per-row key, spread by HASH of that key instead of round-robin — the
    explode/projection between preserves the partitioning, so the
    aggregation's own Exchange is satisfied by the spread and disappears
    from the plan (guide §2.4 "two operations keyed the same way share one
    exchange"); a unique key hash-distributes as evenly as round-robin and
    skips round-robin's sort-before-repartition."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        # metadata-only probe: a scan backed by fewer files than cores can't
        # use the cluster without a rebalance (df.rdd would also tell us, but
        # forces a full plan conversion on the driver — too expensive here)
        n_files = len(df.inputFiles())
    except Exception:
        n_files = target
    if n_files < target:
        if key_col is not None:
            return df.repartition(target, F.col(key_col))
        return df.repartition(target)
    return df


def _pairs_from_sorted_ids(ids_col: str = "ids"):
    """All (a < b) pairs from a sorted id array — expression-only pair
    generation inside a bucket, avoiding a recomputing self-join."""
    return F.explode(
        F.expr(
            f"flatten(transform({ids_col}, (x, i) -> "
            f"transform(slice({ids_col}, i + 2, size({ids_col}) - i - 1), "
            f"y -> struct(x AS id_a, y AS id_b))))"
        )
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    smallest id as representative and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Return df with exact duplicates removed (min-id row kept)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def _minhash_expr(shingle_col: Column, seed: int) -> Column:
    # Salted md5; lexicographic min over hex strings is a valid min-hash
    # (uniform over the hash space, identical in any engine with md5).
    return F.min(F.md5(F.concat(F.lit(f"{seed}:"), shingle_col)))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, mh0..mh{k-1}) — one explode + one groupBy over distinct
    shingles.  The spread hashes on ``id_col`` so the signature groupBy
    reuses the spread's partitioning (zero additional Exchange — see
    ``_spread``)."""
    exploded = (
        _spread(df, id_col)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles_of(F.col("_toks"), shingle_k))
            ).alias("shingle"),
        )
    )
    aggs = [
        _minhash_expr(F.col("shingle"), s).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def _banded_minhash(
    signatures: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    rows_per = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh{b * rows_per + r}") for r in range(rows_per)]
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Band the signature and self-join on (band, band_hash) → (id_a < id_b)
    candidate pairs.  rows-per-band = num_hashes // bands.

    ``max_bucket`` caps a bucket's sorted id array before pair expansion so
    a pathological bucket (billions of identical boilerplate docs) cannot
    become one unsplittable row with O(bucket²) pairs; the slice keeps the
    lowest ids (deterministic) and ``lsh_bucket_overflow`` audits what was
    dropped.  In a dedup pipeline the cap loses nothing semantically: a
    bucket that large is one duplicate class, and the kept ids still link
    every retained member to the class representative."""
    banded = _banded_minhash(signatures, id_col, num_hashes, bands)
    # Pair generation per bucket from a sorted id array: one aggregation, no
    # self-join (a self-join would re-run the whole signature computation on
    # both sides and shuffle twice).
    return (
        banded.groupBy("band", "bucket")
        .agg(
            F.slice(
                F.array_sort(F.collect_set(F.col(id_col))), 1, max_bucket
            ).alias("ids")
        )
        .where(F.size("ids") > 1)
        .select(_pairs_from_sorted_ids("ids").alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def lsh_recall_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Candidate-recall evaluation of the banded-MinHash tier against
    EXACT Jaccard ground truth — "measure, don't guess" for the dedup
    knobs: before a 100 TB run you pick (num_hashes, bands) by measuring
    the S-curve on a sample, not by trusting 1-(1-J^r)^b on faith.

    Truth = all pairs with Jaccard ≥ threshold_num/threshold_den,
    decided by the EXACT integer predicate ``den·|∩| ≥ num·|∪|`` (no
    float compare — both engines agree bit-for-bit at the boundary).
    Candidates = ``lsh_candidate_pairs`` with the same shingles.
    Returns ONE row: threshold_ppm, n_truth, n_candidates, n_hit,
    recall_ppm (hits per truth), precision_ppm (hits per candidate) —
    integer ppm with greatest(...,1) div floors.

    The truth side is O(pairs-sharing-a-shingle): run the eval on a
    sample corpus (the catalog query uses the same restricted slice as
    ``dedup_jaccard``), then the tuned knobs serve the full corpus —
    the standard eval-on-sample methodology."""
    sh = (
        _spread(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles_of(F.col("_toks"), shingle_k))
            ).alias("shingle"),
        )
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_set(F.col(id_col))).alias("ids"))
        .where(F.size("ids") > 1)
        .select(_pairs_from_sorted_ids("ids").alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_shingles").alias("nb")
    )
    truth = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            F.lit(threshold_den) * F.col("n_inter")
            >= F.lit(threshold_num)
            * (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .select("id_a", "id_b")
    )
    cand = lsh_candidate_pairs(
        minhash_signatures(df, text_col, id_col, num_hashes, shingle_k),
        id_col,
        num_hashes,
        bands,
        max_bucket,
    )
    t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    c = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    h = truth.join(cand, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    thr_ppm = threshold_num * 1_000_000 // threshold_den
    return (
        t.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(h))
        .select(
            F.lit(thr_ppm).cast("long").alias("threshold_ppm"),
            "n_truth",
            "n_candidates",
            "n_hit",
            F.expr(
                "CAST(n_hit * 1000000 div greatest(n_truth, 1) AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST(n_hit * 1000000 div greatest(n_candidates, 1)"
                " AS BIGINT)"
            ).alias("precision_ppm"),
        )
    )


def lsh_bucket_overflow(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Audit for ``lsh_candidate_pairs``'s cap: (band, bucket, n_ids,
    n_overflow) for every bucket that exceeded ``max_bucket`` — run
    alongside dedup so a truncation never passes silently."""
    banded = _banded_minhash(signatures, id_col, num_hashes, bands)
    return (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .where(F.col("n_ids") > max_bucket)
        .select(
            "band",
            "bucket",
            "n_ids",
            (F.col("n_ids") - max_bucket).alias("n_overflow"),
        )
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (pairs → components)
# ---------------------------------------------------------------------------
def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve a near-dup *pair* list into duplicate clusters: (id,
    component) where ``component`` is the smallest id reachable through the
    pair graph — the canonical keep-one-per-cluster step after LSH pair
    mining.

    Min-label propagation as iterative DataFrame joins: each round every
    vertex adopts the smallest component label among itself and its
    neighbours; converges in O(cluster diameter) propagations (duplicate
    clusters are near-cliques, so typically 2-4).  Since r16 each
    driver-blocking round runs TWO propagations in one plan (the
    intermediate label frame is referenced only by subtrees that
    re-converge on its own aggregation exchange, so AQE runtime exchange
    reuse computes it once) — the dominant local cost of the loop is not
    the shuffles but the per-round driver round trip itself: a lazy
    ``localCheckpoint`` under AQE compiles the plan AND materializes every
    upstream query stage serially at construction (``toRdd`` →
    ``getFinalPhysicalPlan``), so halving the round count halves the
    blocking driver work (guide §1.2/§2.6; measured ~0.5-0.9 s per round
    at sf0.1 against ~0.3 s of actual execution).  Convergence detection
    stays piggybacked on the label aggregation: the groupBy carries the
    previous label alongside the new min, and the limit-1 ``isEmpty``
    probe over the round's checkpoint answers "did the LAST propagation
    change anything" — if the second propagation of a round was a no-op
    its input was already the fixpoint (asserted by
    tests/test_textdedup.py::test_connected_components_one_pass_per_round).
    Bounded by ``max_iterations`` double-rounds; raises if not converged
    rather than returning a partial clustering.

    Correctness of the unroll: labels after round k are exactly the labels
    after 2k single propagations of the r15 loop (same min-propagation
    operator applied twice), and the fixpoint test is unchanged — a round
    whose second propagation changed nothing returns that propagation's
    output, which equals its input.  The final labels are the per-component
    minima either way, so every consumer's results are byte-identical.

    At 100 TB: rounds are shuffle-on-id joins (AQE handles skewed hub
    vertices); swap ``localCheckpoint`` for a reliable checkpoint dir when
    executor loss matters.  GraphFrames' connectedComponents is the
    documented library alternative.
    """
    # No .distinct() on the edge list: every producer in this engine emits
    # DISTINCT (id_a < id_b) pairs (lsh_candidate_pairs ends in distinct),
    # and the two direction halves cannot overlap under the strict <, so
    # the union is duplicate-free by construction — the distinct was a full
    # extra Exchange per CC execution (guide §2.4: a distinct on data that
    # is already unique).  Min-label propagation is idempotent to duplicate
    # edges anyway, so a caller passing a non-deduped pair list changes
    # cost, never the result.
    # Symmetrize with ONE reference to the pair pipeline (r16): the union
    # form embedded the (expensive) pair-mining subtree in both children,
    # betting on exchange reuse to dedup them; the explode form makes the
    # plan a linear chain by construction — same rows, one pair scan.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        # lazy: materialized inside the first consuming job (round 1's
        # convergence probe) — eager forced a separate driver job per
        # checkpoint before any consumer ran (2 jobs/round -> 1)
        .localCheckpoint(eager=False)
    )
    # Initialization fuses the FIRST propagation round: label = min(self,
    # neighbors) straight from one groupBy over the edge list — identical to
    # starting from identity labels and running one message round, but with
    # no join/union/checkpoint.  NO checkpoint on the init frame (r16):
    # `_propagate` references its input exactly once, so the init subtree
    # appears once in round 1's plan and a pin would only buy a compile+
    # materialize driver round trip it doesn't need.
    labels = edges.groupBy(F.col("src").alias("id")).agg(
        F.least(F.first("src"), F.min("dst")).alias("component")
    )

    def _propagate(lab: DataFrame) -> DataFrame:
        """One min-label propagation referencing ``lab`` exactly ONCE.

        The naive form unions self-rows with join-derived messages, which
        embeds ``lab`` twice in the plan — and the two references prune to
        DIFFERENT projections, so AQE exchange reuse cannot share them and
        the label aggregation recomputes per reference (measured: no
        ReusedExchange nodes, 12 HashAggregates in one double-prop round).
        Instead, both row kinds fall out of the single edges⋈lab join:
        every directed edge (src, dst) yields the message (dst, L(src),
        _old=null) AND the self-row (src, L(src), _old=L(src)) — every
        vertex has ≥1 outgoing edge after symmetrization, so the self-rows
        (duplicated per out-degree, collapsed map-side) cover every id.
        min(component) and min(_old) per id are unchanged, so labels and
        the _changed flag are byte-identical to the union form."""
        j = edges.join(lab, edges["src"] == lab["id"])
        return (
            j.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("dst").alias("id"),
                            F.col("component"),
                            # null of the component's own type (ids may be
                            # string/long)
                            F.when(F.lit(False), F.col("component")).alias(
                                "_old"
                            ),
                        ),
                        F.struct(
                            F.col("src").alias("id"),
                            F.col("component"),
                            F.col("component").alias("_old"),
                        ),
                    )
                ).alias("m")
            )
            .select("m.id", "m.component", "m._old")
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                (F.min("component") < F.min("_old")).alias("_changed"),
            )
        )

    for _ in range(max_iterations):
        # two propagations per driver round: the plan is one LINEAR chain
        # (each frame referenced once), so the unroll adds pipelined
        # shuffle stages to the SAME job instead of a second blocking
        # compile+probe driver round trip (guide §1.2/§2.6)
        mid = _propagate(labels).select("id", "component")
        new_labels = _propagate(mid).localCheckpoint(eager=False)
        labels = new_labels.select("id", "component")
        # probe the SECOND propagation's change flag: a no-op second pass
        # means its input was already the fixpoint, so `labels` (== mid)
        # is final; the probe is also the job that materializes the
        # round's checkpoint blocks (lazy checkpoint, guide §1.2)
        if new_labels.where(F.col("_changed")).isEmpty():
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def collapsed_assignment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    bands: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Exact-collapse-before-fuzzy duplicate-group assignment: one row per
    input doc with (``id_col``, ``rep``, ``n_class``, ``component``) where
    ``rep`` is the smallest id sharing this doc's exact text (md5 class),
    ``n_class`` the exact-class size, and ``component`` the fuzzy cluster
    label of the class representative (NULL when the representative mines
    no LSH pair).  ``coalesce(component, rep)`` is then the smallest id
    reachable through the exact+near dup graph — exactly what
    ``connected_components(lsh_candidate_pairs(minhash_signatures(df)))``
    extended with own-id for unclustered docs computes, at a fraction of
    the cost on duplication-heavy corpora.

    Equivalence (why the collapse is NOT an approximation): identical text
    ⇒ identical shingle set ⇒ identical minhash signature ⇒ identical band
    buckets, so (a) every exact class is a clique of candidate pairs in the
    uncollapsed graph — its members always share one component, equal to
    ``min`` over the union of member ids of the class's cluster, and (b)
    the representative occupies exactly the buckets its members do, so the
    rep graph IS the quotient of the doc graph by exact classes, and its
    min-reachable labels (over reps = per-class min ids) equal the doc
    graph's min-reachable labels.  Measured on the sf0.1 corpus with every
    doc 20-way duplicated: the uncollapsed subtree ran 35.6 s (signatures
    3.6 + pair-gen 3.9 over 1.28 M clique pairs + CC 22.5 on the inflated
    edge list); collapsing first removes the clique mass entirely — the
    fuzzy tier sees one doc per distinct content, which is how production
    web-corpus pipelines order the two tiers (exact pass, then MinHash; cf
    reference `README.md` has no dedup tier at all — this is engine-side
    capability).  Measured after the collapse (same 20× corpus, same
    session protocol): the full assignment runs 4.05 s — 8.8× faster,
    and the balance audit 83.5 → 6.5 s — while the duplication-FREE base
    corpus pays 1.13× best-warm (interleaved A/B on `dedup_clusters` at
    sf0.1: 3.21 → 3.64 s) for the extra digest shuffle + map-back join.
    Caveats: md5 text collisions merge classes (the same
    2^-64 exposure ``exact_dedup_groups`` already accepts); ``max_bucket``
    now caps DISTINCT CONTENTS per band bucket rather than docs — strictly
    more useful (a billion copies of one boilerplate doc are one bucket
    entry, not a capped flood).

    Scale shape: the only corpus-sized shuffles carry (id, digest) narrow
    rows or per-partition-deduped (digest, text) partials (map-side
    combine collapses duplicate texts before the exchange); the minhash /
    band / CC tier runs on distinct contents only; the final component
    map-back joins the narrow member list against a reps-sized frame (AQE
    broadcasts it when small)."""
    dg = F.md5(F.col(text_col)).alias("_dg")
    members = df.select(F.col(id_col), dg)
    # One digest-keyed pass builds the representative docs: min-id rep,
    # class size, and the (identical-within-group) text — partial aggs
    # dedup duplicate texts map-side, so the exchange carries one text per
    # (partition, digest), not per doc.
    # NO localCheckpoint on this frame (r16): the r15 pin materialized the
    # full distinct-content corpus TEXT into executor-local checkpoint
    # blocks — at 100 TB an unrecoverable single point of failure and a
    # §5 memory competitor.  Unpinned, Catalyst column-prunes each
    # consumer's instance separately: the minhash/CC tier evaluates
    # (min(id), first(text)) once into CC's edge checkpoint, and the
    # map-back join's rep_map instance drops first(text) entirely — its
    # re-evaluation is a NARROW (id, digest) scan + count/min aggregate,
    # cheaper than reading back a text-carrying checkpoint (A/B'd
    # flat-to-better at sf0.1; plans/r16/dedup_clusters_after.txt shows
    # the text-free rep_map aggregate).
    rep_docs = (
        df.select(F.col(id_col), dg, F.col(text_col))
        .groupBy("_dg")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_class"),
            F.first(text_col).alias(text_col),
        )
    )
    sigs = minhash_signatures(
        rep_docs.select(id_col, text_col), text_col, id_col,
        num_hashes, shingle_k,
    )
    pairs = lsh_candidate_pairs(sigs, id_col, num_hashes, bands, max_bucket)
    comp = connected_components(pairs).select(
        F.col("id").alias("rep"), "component"
    )
    rep_map = rep_docs.select(
        "_dg", F.col(id_col).alias("rep"), "n_class"
    )
    return (
        members.join(rep_map, "_dg")
        .join(comp, "rep", "left")
        .select(F.col(id_col), "rep", "n_class", "component")
    )


def passage_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 8,
) -> DataFrame:
    """Sub-document dedup at passage granularity (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better" move, at
    fixed token windows instead of suffix-array substrings): split every
    document into non-overlapping ``passage_tokens`` windows, keep only
    the FIRST corpus-wide occurrence of each distinct passage (ordered by
    (doc_id, chunk_idx) — deterministic), and reassemble each document
    from its surviving passages.  Documents whose every passage already
    appeared elsewhere vanish entirely (they contribute nothing new).

    Scale shape: explode is O(total_tokens / passage_tokens) narrow rows;
    first-occurrence is ONE window partitioned by the passage hash (group
    size = that passage's duplicate count — bounded, never a global
    sort); reassembly is one groupBy(doc).  Output: (id, text,
    n_passages_kept).
    """
    from service_alerts_connector_spark.operators.chunking import (
        chunk_documents,
    )

    ch = chunk_documents(
        df, id_col, text_col,
        chunk_tokens=passage_tokens, overlap_tokens=0,
    )
    w = Window.partitionBy("_h").orderBy(id_col, "chunk_idx")
    kept = (
        ch.withColumn("_h", F.md5(F.col("chunk_text")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_passages_kept"),
    )


def _shingle_table(
    df: DataFrame, id_col: str, text_col: str, k: int, digest: str = "md5"
) -> tuple[DataFrame, DataFrame]:
    """Tokenized+sized docs and their rolling k-token shingle table (see
    ``duplicate_substring_spans`` for the full recipe and scale notes).
    Returns (sized, shingled): sized = (id, _toks, n); shingled =
    (id, pos, _h) with one digest per overlapping window.

    ``digest`` picks the window hash: ``"md5"`` (default) is
    bit-identical in DuckDB — the oracle path; ``"xxhash64"`` is the
    production path at scale — JVM-native, an 8-byte long instead of a
    32-char string on the rank exchange.  Measured only ~1.05× faster on
    local[32] (the window/shuffle machinery dominates there); the real
    win is the 4× narrower shuffle key once the exchange crosses a
    network.  Both digests are injective for practical purposes, so span
    DECISIONS are identical (pytest-pinned); only engine-portability
    differs."""
    if digest == "md5":
        hash_of = F.md5
    elif digest == "xxhash64":
        hash_of = F.xxhash64
    else:
        raise ValueError(f"unknown digest {digest!r} (md5 | xxhash64)")
    sized = _spread(df).select(
        id_col, tokens(F.col(text_col)).alias("_toks")
    ).withColumn("n", F.size("_toks"))
    shingled = sized.where(F.col("n") >= k).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - k),
                lambda i: hash_of(
                    F.array_join(F.slice("_toks", i + 1, k), " ")
                ),
            )
        ).alias("pos", "_h"),
    )
    return sized, shingled


def _non_first_occurrences(shingled: DataFrame, id_col: str) -> DataFrame:
    """Every shingle occurrence except its corpus-wide first, ordered by
    (doc, pos) — the duplicated intervals [pos, pos + k).  Group size per
    rank window = that shingle's duplicate count, never a global sort."""
    w_h = Window.partitionBy("_h").orderBy(id_col, "pos")
    return (
        shingled.withColumn("_rn", F.row_number().over(w_h))
        .where(F.col("_rn") > 1)
        .select(id_col, "pos")
    )


def _duplicate_shingle_occurrences(
    df: DataFrame, id_col: str, text_col: str, k: int, digest: str = "md5"
) -> tuple[DataFrame, DataFrame]:
    """Shared core of the substring-dedup pair: (sized, dup) where dup =
    (id, pos) marks each duplicated interval [pos, pos + k)."""
    sized, shingled = _shingle_table(df, id_col, text_col, k, digest)
    return sized, _non_first_occurrences(shingled, id_col)


def duplicate_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    digest: str = "md5",
) -> DataFrame:
    """Substring-level exact dedup screen — the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" suffix-array duplicate-span
    measure, re-expressed as a k-token ROLLING shingle table (every
    overlapping k-token window, unlike ``passage_dedup``'s disjoint
    windows, so a duplicated substring is caught at any alignment):

    1. tokenize (``functions/text.py tokens``); docs with < k tokens
       contribute no shingles;
    2. explode every overlapping k-token window with its 0-based start
       position, hashed to md5 INSIDE the builder lambda so the
       pre-explode array holds 32-char digests, not k-token strings
       (bounds the row blowup at ~32 B/shingle independent of k);
    3. first-occurrence-wins: per shingle hash, rank occurrences by
       (doc_id, pos) — group size = that shingle's duplicate count,
       never a global sort; every rn > 1 occurrence marks the token
       interval [pos, pos + k) as duplicated;
    4. per-doc interval union WITHOUT arrays: equal-length intervals
       sorted by pos merge iff next.pos ≤ prev.pos + k, so one
       lag-compare + running-sum island window (partitioned by doc)
       yields covered-token counts — max(pos) + k − min(pos) per island;
    5. per doc: token/shingle totals, duplicated-shingle count,
       duplicate-span token coverage, and the duplicate-span ratio in
       floored parts-per-million (integer div — non-negative, so Spark
       ``div`` ≡ DuckDB ``//``; CLAUDE.md negative-operand rule).

    Scale shape: the shingle explode is O(total_tokens) narrow digest
    rows; the only corpus-sized exchanges are the hash-keyed rank window
    and the doc-keyed island window.  A degenerate corpus-dominating
    shingle skews its rank group exactly like ``passage_dedup`` — AQE
    skew-join territory, never O(n²).  At 100 TB swap the md5-of-text
    digest for an incremental rolling hash (xxhash64 over a prefix-hash
    difference) to skip re-reading each token k times; md5 is kept here
    because both engines implement it bit-identically for the oracle.

    Returns one row PER INPUT DOC (zero-duplication and < k-token docs
    included): (id, n_tokens, n_shingles, dup_shingles, dup_tokens,
    dup_ratio_ppm).
    """
    sized, dup = _duplicate_shingle_occurrences(df, id_col, text_col, k, digest)
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    islands = dup.select(
        id_col,
        "pos",
        F.when(
            F.col("pos") > F.lag("pos").over(w_doc) + k, F.lit(1)
        ).otherwise(F.lit(0)).alias("_brk"),
    ).select(
        id_col,
        "pos",
        F.sum("_brk").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_isl"),
    )
    per_doc = (
        islands.groupBy(id_col, "_isl")
        .agg(
            (F.max("pos") + k - F.min("pos")).alias("_cov"),
            F.count(F.lit(1)).alias("_ndup"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("_cov").alias("_dup_tokens"),
            F.sum("_ndup").alias("_dup_shingles"),
        )
    )
    return (
        sized.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n").cast("long").alias("n_tokens"),
            F.greatest(F.col("n") - (k - 1), F.lit(0))
            .cast("long")
            .alias("n_shingles"),
            F.coalesce("_dup_shingles", F.lit(0))
            .cast("long")
            .alias("dup_shingles"),
            F.coalesce("_dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.when(F.col("n") <= 0, F.lit(0))
            .otherwise(
                F.expr(
                    "(coalesce(_dup_tokens, 0) * 1000000) div n"
                )
            )
            .cast("long")
            .alias("dup_ratio_ppm"),
        )
        .orderBy(id_col)
    )


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    digest: str = "md5",
) -> DataFrame:
    """The REMOVAL half of Lee-et-al substring dedup (the companion of
    ``duplicate_substring_spans``' audit): delete every token inside a
    duplicated k-token span and reassemble each document from its
    surviving tokens, in order.  The first corpus-wide occurrence of any
    substring survives intact (its tokens are never covered); later
    copies lose exactly the duplicated spans, keeping their novel text.

    Shares the shingle table with the audit
    (``_duplicate_shingle_occurrences``); the additional work is a
    bounded ``explode(sequence(0, k-1))`` over duplicated occurrences →
    distinct covered positions, one anti-join of the posexploded tokens,
    and a per-doc reassembly — the ``passage_dedup`` collect pattern,
    groups bounded by document length.  Docs with every token covered
    vanish (nothing novel — same convention as ``passage_dedup``); docs
    with zero duplication pass through verbatim (token-normalized).

    Output: (id, text, n_tokens_kept, n_tokens_dropped).
    """
    sized, dup = _duplicate_shingle_occurrences(df, id_col, text_col, k, digest)
    return _strip_covered(sized, dup, id_col, text_col, k)


def _strip_covered(
    sized: DataFrame, dup: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Delete the tokens of every duplicated interval [pos, pos + k) in
    ``dup`` and reassemble each doc from its survivors (shared tail of
    the batch and incremental strip variants).

    Covered positions come from the MERGED islands (the audit's
    lag-compare running-sum window), not per-occurrence explodes:
    islands are disjoint by construction, so exploding each island's
    [min, max + k) span emits every covered position exactly once — no
    k× overlap blowup, no distinct exchange (measured 6.6× → 4.1× at
    the 20×-duplicated scale-up where overlap redundancy peaks)."""
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    covered = (
        dup.select(
            id_col,
            "pos",
            F.when(F.col("pos") > F.lag("pos").over(w_doc) + k, F.lit(1))
            .otherwise(F.lit(0))
            .alias("_brk"),
        )
        .select(
            id_col,
            "pos",
            F.sum("_brk")
            .over(
                w_doc.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("_isl"),
        )
        .groupBy(id_col, "_isl")
        .agg(F.min("pos").alias("_s"), (F.max("pos") + (k - 1)).alias("_e"))
        .select(
            id_col,
            F.explode(F.sequence(F.col("_s"), F.col("_e"))).alias("_tp"),
        )
    )
    toks = sized.where(F.col("n") > 0).select(
        id_col, F.posexplode("_toks").alias("_tp", "_tok"), F.col("n")
    )
    kept = toks.join(covered, [id_col, "_tp"], "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_tp", "_tok"))),
                    lambda s: s._tok,
                ),
                " ",
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_tokens_kept"),
            (F.max("n") - F.count(F.lit(1)))
            .cast("long")
            .alias("n_tokens_dropped"),
        )
        .withColumn("n_tokens_kept", F.col("n_tokens_kept").cast("long"))
    )


def cross_corpus_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Train/test contamination probe: train docs sharing ≥1 MinHash-LSH
    band bucket with *any* held-out doc — the screen a training pipeline
    runs before shipping a corpus that must not contain eval data.

    One semi-join on (band, bucket): O(train + test) signature work, no
    pairwise comparison; candidates flagged here go to ``jaccard_pairs``
    for exact verification if needed.  Returns distinct flagged train ids.
    """
    bands_a = _banded_minhash(
        minhash_signatures(train, text_col, id_col, num_hashes, shingle_k),
        id_col, num_hashes, bands,
    )
    bands_b = _banded_minhash(
        minhash_signatures(test, text_col, id_col, num_hashes, shingle_k),
        id_col, num_hashes, bands,
    )
    return (
        bands_a.join(
            bands_b.select("band", "bucket"), ["band", "bucket"], "left_semi"
        )
        .select(id_col)
        .distinct()
    )


def split_contamination(
    docs: DataFrame,
    is_test: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """``cross_corpus_contamination`` for the common case where train and
    test are a PARTITION of one corpus (``is_test`` a row predicate, e.g. a
    holdout rule on the id): band every doc ONCE, then split the banded
    frame.  Minhash/banding is per-doc (the shingle aggregation groups on
    ``id_col``), so filtering before or after banding yields identical
    buckets — the flagged set is exactly
    ``cross_corpus_contamination(docs.where(~is_test), docs.where(is_test))``
    (pinned by tests/test_textdedup.py::test_split_contamination_matches_two_pass).

    Why not just call the two-pass form: Catalyst pushes each side's filter
    below the signature aggregation, so the tokenize+shingle+minhash pass
    runs twice (once per split) over two scans with no exchange reuse
    (different pushed filters → different exchanges).  The lazy
    ``localCheckpoint`` pins one full-corpus banding evaluation — without it
    the semi-join's broadcast build side would re-run the whole pipeline
    (broadcast subtrees are not runtime-reused against non-broadcast twins).

    CONSTRAINT: ``is_test`` is evaluated on the BANDED frame, whose only
    surviving input column is ``id_col`` — the predicate may reference
    ``id_col`` only (e.g. a modulus or hash holdout rule).  A predicate
    touching ``text_col`` (or any other input column) fails at analysis
    with an unresolved-column error; evaluate such a predicate into a
    boolean column on ``docs`` first and pass THAT column's reference, or
    fall back to ``cross_corpus_contamination`` with explicit splits.
    """
    banded = (
        _banded_minhash(
            minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k),
            id_col, num_hashes, bands,
        )
        .withColumn("_t", is_test)
        .localCheckpoint(eager=False)
    )
    return (
        banded.where(~F.col("_t"))
        .join(
            banded.where(F.col("_t")).select("band", "bucket"),
            ["band", "bucket"],
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )


def near_dedup_keep(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Materialize the near-dedup decision: drop every non-representative
    member of a near-dup cluster (representative = min id, via
    ``connected_components``), keep all unclustered rows.  One anti-join —
    the corpus-side operation stays O(n)."""
    comp = connected_components(pairs, id_a, id_b)
    drop = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verification tier)
# ---------------------------------------------------------------------------
def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs sharing ≥1 shingle with exact Jaccard ≥ threshold.

    O(pairs-sharing-a-shingle); use only on small/candidate-restricted
    inputs — the LSH tier exists so this never sees the full corpus.
    """
    sh = (
        _spread(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles_of(F.col("_toks"), shingle_k))
            ).alias("shingle"),
        )
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    # Intersection counts via per-shingle pair expansion (one aggregation,
    # no recomputing self-join); docs sharing a shingle expand quadratically
    # within that shingle only — the LSH tier keeps inputs candidate-sized.
    inter = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_set(F.col(id_col))).alias("ids"))
        .where(F.size("ids") > 1)
        .select(_pairs_from_sorted_ids("ids").alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_shingles").alias("nb")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash32(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """32-bit SimHash per document: majority vote per bit over the 32-bit
    hashes of distinct tokens.  Entirely expression-based: explode tokens ×
    bit positions, two aggregations."""
    # spread hashes on id_col so the balance groupBy below reuses the
    # spread's partitioning (zero additional Exchange — see _spread)
    tok = _spread(df, id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).withColumn("h", token_hash32(F.col("tok")))
    # one aggregation with 32 balance columns instead of exploding each token
    # ×32 bit-rows: 32× fewer rows through the shuffle, same math
    # SQL-text construction (one parsed string per column instead of ~8
    # py4j Column calls each): identical integer math, and the 64 built
    # expressions were 0.7 s of pure driver time per query build
    balances = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1"
            f" THEN 1 ELSE -1 END)"
        ).alias(f"_b{i}")
        for i in range(32)
    ]
    votes = tok.groupBy(id_col).agg(*balances)
    sig_sql = " + ".join(
        f"(CASE WHEN _b{i} > 0 THEN {2 ** i}L ELSE 0L END)"
        for i in range(32)
    )
    return votes.select(F.col(id_col), F.expr(sig_sql).alias("simhash"))


def simhash_near_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-dup pairs by hamming distance over SimHash signatures — banded.

    Pigeonhole: split the 32-bit signature into ``max_hamming + 1`` bands;
    any pair within ``max_hamming`` bit flips must agree exactly on at least
    one band, so candidates = pairs sharing a (band, band_value) bucket, and
    the exact hamming filter verifies.  Complete (no misses) and avoids the
    O(n²) cross join — cost is Σ(bucket²) per band, i.e. only genuinely
    similar signatures meet.

    ``max_bucket`` caps a bucket's sorted id array before pair expansion
    (keep-lowest-ids, deterministic) — see ``lsh_candidate_pairs``; beyond
    the cap the pigeonhole completeness guarantee applies to the retained
    ids only, and ``simhash_bucket_overflow`` audits the truncation.
    """
    bands = max_hamming + 1
    width = 32 // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("val"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.array(*band_cols)).alias("bb"),
    ).select(
        id_col,
        "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.val").alias("val"),
    )
    cand = (
        banded.groupBy("band", "val")
        .agg(
            F.slice(
                F.array_sort(F.collect_set(F.col(id_col))), 1, max_bucket
            ).alias("ids")
        )
        .where(F.size("ids") > 1)
        .select(_pairs_from_sorted_ids("ids").alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )
    sa = signatures.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa")
    )
    sb = signatures.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb")
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .where(ham <= max_hamming)
        .select("id_a", "id_b", ham.alias("hamming"))
    )


def simhash_bucket_overflow(
    signatures: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Audit for ``simhash_near_pairs``'s cap — buckets exceeding
    ``max_bucket`` with their overflow counts."""
    bands = max_hamming + 1
    width = 32 // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("val"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.val").alias("val"))
    return (
        banded.groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .where(F.col("n_ids") > max_bucket)
        .select(
            "band",
            "val",
            "n_ids",
            (F.col("n_ids") - max_bucket).alias("n_overflow"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental corpus dedup — new batches against a persistent band store
# ---------------------------------------------------------------------------

BAND_STORE = "lsh_band_store"


def incremental_dedup_batch(
    spark,
    root: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Admit the near-unique subset of ``new_docs`` against everything ever
    admitted, touching ONLY the new batch's text: signatures are computed
    for the batch alone and compared to the persistent (id, band, bucket)
    store by ONE semi-join — the 100 TB ingest pattern where re-LSH-ing the
    full corpus per batch would be O(corpus) every 10 minutes instead of
    O(batch).

    Two-stage admission (deterministic):

    1. drop batch docs sharing any band bucket with the STORE;
    2. within the surviving batch, keep the lowest id per colliding bucket
       (``near_dedup_keep`` over batch-local LSH pairs).

    The store then grows by the admitted docs' bands, snapshot-write-last:
    the previous store is read PINNED to its immutable version directory
    (never ``current``), so the returned lazy DataFrame stays valid after
    the overwrite (CLAUDE.md state rule; version dirs outlive ``current``
    by the prune horizon).  Returns the admitted docs.
    """
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
        write_dataset,
    )

    sigs = minhash_signatures(new_docs, text_col, id_col, num_hashes, shingle_k)
    new_bands = _banded_minhash(sigs, id_col, num_hashes, bands)
    versions = list_versions(root, BAND_STORE)
    prev = (
        read_dataset(spark, root, BAND_STORE, version=versions[-1])
        if versions
        else None
    )

    if prev is not None:
        vs_store = new_bands.join(
            prev.select("band", "bucket").distinct(),
            ["band", "bucket"],
            "left_semi",
        ).select(id_col).distinct()
        survivors = new_docs.join(vs_store, id_col, "left_anti")
    else:
        survivors = new_docs

    surv_bands = new_bands.join(
        survivors.select(id_col), id_col, "left_semi"
    )
    surv_sigs = sigs.join(survivors.select(id_col), id_col, "left_semi")
    batch_pairs = lsh_candidate_pairs(surv_sigs, id_col, num_hashes, bands)
    admitted = near_dedup_keep(survivors, batch_pairs, id_col=id_col)

    admitted_bands = surv_bands.join(
        admitted.select(id_col), id_col, "left_semi"
    )
    merged = (
        prev.unionByName(admitted_bands) if prev is not None else admitted_bands
    )
    write_dataset(merged, root, BAND_STORE)
    return admitted


def strip_contaminated_spans(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    digest: str = "md5",
) -> DataFrame:
    """Span-level decontamination: delete from every TRAIN document each
    k-token window that also appears anywhere in the BENCHMARK corpus,
    and reassemble the train docs from their surviving tokens — the
    REMOVAL counterpart of ``exact_ngram_overlap``'s flag-and-drop
    screen (dropping whole train docs wastes their uncontaminated text;
    eval-leakage policies usually excise just the overlapping spans).

    One semi-join of the train shingle table against the benchmark's
    distinct digests (benchmark side collapses to its vocabulary of
    spans — never multiplied by train size), then the shared
    island-merge strip tail.  Train docs made entirely of benchmark
    spans vanish; untouched docs pass through verbatim
    (token-normalized).  Output: (id, text, n_tokens_kept,
    n_tokens_dropped).
    """
    sized_t, shingled_t = _shingle_table(train, id_col, text_col, k, digest)
    _, shingled_b = _shingle_table(benchmark, id_col, text_col, k, digest)
    dup = shingled_t.join(
        shingled_b.select("_h").distinct(), "_h", "left_semi"
    ).select(id_col, "pos")
    return _strip_covered(sized_t, dup, id_col, text_col, k)


SHINGLE_STORE = "substring_shingle_store"


def incremental_substring_strip(
    spark,
    root: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    digest: str = "md5",
) -> DataFrame:
    """Substring-span removal for a streaming ingest loop: strip the NEW
    batch's duplicated k-token spans against every shingle ever admitted
    (persistent distinct-digest store) plus within-batch first-
    occurrence — O(batch) per batch: only the new docs are shingled; the
    store is one semi-join side, never re-scanned history.

    Sequential-ingest invariant (the streaming/ module convention, same
    class as ``incremental_hll_ingest``'s): when doc ids increase across
    batches, N sequential batches produce EXACTLY the documents a single
    batch-mode ``strip_duplicate_spans`` over the concatenated corpus
    produces — because first-occurrence-wins is an order property and the
    store holds precisely the shingles of all earlier batches
    (pytest-pinned).  The store grows by the batch's distinct digests
    (union = distinct merge, idempotent under at-least-once redelivery —
    a redelivered batch finds all its shingles stored and strips to
    nothing new, so no span is ever double-admitted; chaos-pinned in
    tests/test_chaos_stores.py).  Store discipline per CLAUDE.md: the
    previous digests are read PINNED to their immutable version dir,
    snapshot-write-last.

    Store size = distinct shingles of the corpus — the price of
    substring-exactness (this store IS the engine's suffix-array
    substitute); 32 B/digest, mergeable, prunable by digest range at
    100 TB.
    """
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
        write_dataset,
    )

    versions = list_versions(root, SHINGLE_STORE)
    prev = (
        read_dataset(spark, root, SHINGLE_STORE, version=versions[-1])
        if versions
        else None
    )
    sized, shingled = _shingle_table(new_docs, id_col, text_col, k, digest)
    dup = _non_first_occurrences(shingled, id_col)
    if prev is not None:
        vs_store = shingled.join(
            prev.select("_h").distinct(), "_h", "left_semi"
        ).select(id_col, "pos")
        dup = dup.unionByName(vs_store).distinct()
    stripped = _strip_covered(sized, dup, id_col, text_col, k)

    batch_digests = shingled.select("_h").distinct()
    merged = (
        prev.select("_h").unionByName(batch_digests).distinct()
        if prev is not None
        else batch_digests
    )
    write_dataset(merged, root, SHINGLE_STORE)
    return stripped


# ---------------------------------------------------------------------------
# Prefix-filtering set-similarity join (PPJoin-lite)
# ---------------------------------------------------------------------------
def prefix_filter_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    theta_num: int = 1,
    theta_den: int = 2,
) -> DataFrame:
    """EXACT token-Jaccard ≥ theta_num/theta_den pairs via prefix filtering
    (Chaudhuri et al., "A primitive operator for similarity joins", ICDE'06;
    PPJoin's prefix+size filters without positional filtering).

    A third candidate-generation strategy next to MinHash-LSH (probabilistic
    recall) and SimHash (Hamming): prefix filtering is LOSSLESS — two sets
    with Jaccard ≥ θ MUST share a token within each other's first
    ℓ = n − ⌈θ·n⌉ + 1 tokens when every doc orders its tokens by ascending
    global document frequency, so joining on prefix tokens alone generates
    a candidate superset of the true result (completeness pinned against
    brute force in tests/test_textdedup.py).  Rare-token-first ordering
    keeps prefix buckets small: the hottest token in any prefix is the
    θ-quantile-rarest of its doc, so candidate expansion concentrates where
    matches actually are, not on stopwords.

    Scale shape: one vocab-keyed join for document frequencies (AQE decides
    broadcast — a web-scale vocab must shuffle, a dimension-sized one
    broadcasts), one per-doc window (partition = one doc's tokens, bounded
    by doc length), one equi-join on prefix tokens, then exact verification
    on candidate pairs only.  θ is an integer rational so prefix lengths
    and the final Jaccard gate use pure integer arithmetic — no float
    compare can disagree between engines.

    Output: ``id_a < id_b``, ``n_inter``, ``n_union``, ``jaccard_pm``
    (floored per-mille, integer).
    """
    from service_alerts_connector_spark.functions.text import tokens

    p, q = theta_num, theta_den
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t")
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
    w = Window.partitionBy(id_col).orderBy("df_t", "t")
    ordered = (
        tok.join(freq, "t")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    # ℓ = n − ⌈p·n/q⌉ + 1, ceil as (p·n + q − 1) div q (positive operands:
    # Spark div ≡ DuckDB // — see CLAUDE.md negative-division rule)
    prefix = ordered.where(
        F.col("pos") <= F.col("n") - F.floor((p * F.col("n") + q - 1) / q) + 1
    ).select(F.col(id_col).alias("_id"), "t", "n")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a._id") < F.col("b._id"))
            # size filter: J ≤ min/max, so J ≥ p/q needs q·min ≥ p·max
            & (
                q * F.least(F.col("a.n"), F.col("b.n"))
                >= p * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    arrays = tok.groupBy(id_col).agg(
        F.array_sort(F.collect_list("t")).alias("arr"),
        F.count(F.lit(1)).alias("n"),
    )
    aa = arrays.select(
        F.col(id_col).alias("id_a"), F.col("arr").alias("arr_a"), F.col("n").alias("na")
    )
    ab = arrays.select(
        F.col(id_col).alias("id_b"), F.col("arr").alias("arr_b"), F.col("n").alias("nb")
    )
    verified = (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")).cast("long"))
        .withColumn("n_union", (F.col("na") + F.col("nb") - F.col("n_inter")).cast("long"))
        .where(q * F.col("n_inter") >= p * F.col("n_union"))
    )
    return verified.select(
        "id_a",
        "id_b",
        "n_inter",
        "n_union",
        F.floor(1000 * F.col("n_inter") / F.col("n_union")).cast("long").alias("jaccard_pm"),
    )


# ---------------------------------------------------------------------------
# Exact n-gram decontamination scoring
# ---------------------------------------------------------------------------
def exact_ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Per-corpus-doc EXACT benchmark n-gram overlap — the scoring tier a
    decontamination pipeline runs after (or instead of) the LSH screen
    (`contamination_candidates`): how many of a doc's distinct word
    k-shingles appear verbatim anywhere in the benchmark set (the C4/Dolma
    "n-gram decontamination" rule, with the overlap fraction reported so
    callers pick their own cut instead of a baked-in boolean).

    Scale shape: benchmark shingles collapse to one distinct set (no doc
    ids — the corpus side never multiplies), then one equi-join on the
    shingle string; AQE broadcasts a benchmark-sized set and shuffles a
    web-sized one.  Output is only docs with ≥1 matched shingle.

    Output: ``id_col``, ``n_matched``, ``n_shingles``, ``overlap_pm``
    (floored per-mille, integer — no float compare).
    """
    from service_alerts_connector_spark.functions.text import (
        tokens,
        word_shingles_of,
    )

    def _sh(df: DataFrame, cols: list) -> DataFrame:
        toks = df.select(*cols, tokens(F.col(text_col)).alias("_toks"))
        return toks.select(
            *cols,
            F.explode(
                F.array_distinct(word_shingles_of(F.col("_toks"), shingle_k))
            ).alias("shingle"),
        )

    corpus_sh = _sh(corpus, [F.col(id_col)])
    # ONE corpus pass: the old shape ran the tokenize+shingle+explode
    # twice (a totals groupBy keyed on the doc id, a semi-join keyed on
    # the shingle — different first exchanges, so ReuseExchange cannot
    # share the map-side work) and then joined the two aggregates.  A
    # left join against the distinct benchmark set tags each occurrence
    # instead (exactly one output row per corpus shingle — the bench side
    # is distinct), so one doc-keyed aggregation yields both counts
    # (guide §1.2: remove a full pass, §2.4: one exchange class fewer).
    bench_sh = _sh(benchmark, []).distinct().withColumn("_m", F.lit(1))
    return (
        corpus_sh.join(bench_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count("_m").cast("long").alias("n_matched"),
        )
        .where(F.col("n_matched") > 0)
        .select(
            id_col,
            "n_matched",
            "n_shingles",
            F.floor(1000 * F.col("n_matched") / F.col("n_shingles"))
            .cast("long")
            .alias("overlap_pm"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 3,
    max_dist: int = 2,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (the classic entity-
    resolution blocking method): rank rows by a fuzzy sort key, emit every
    pair within ``window`` positions of each other, keep pairs whose keys
    are within ``max_dist`` Levenshtein edits.

    Complements the LSH family: where MinHash/SimHash bucket on hashed
    content (probabilistic recall), sorted-neighborhood guarantees that any
    two rows whose SORT KEYS land within ``window`` ranks are compared —
    the right tool when near-duplicates share a sortable prefix (names,
    titles, normalized addresses) rather than token sets.

    Rank assignment avoids the global row_number() window (banned at
    scale — one task sorts everything) with the two-phase pattern of
    ``chunking.assign_sequential_ids`` generalized to a SEMANTIC order:
    rows bucket by the sort key's first byte (monotone, so (bucket, key,
    id) order == global (key, id) order), per-bucket counts (≤ 256 rows)
    prefix-sum on the driver into offsets, and each bucket sorts only its
    own slice.  Pair expansion is a bounded ``explode(1..window)`` +
    equi-join on the rank — candidates are n×window rows, never a
    self-join on the key.

    At 100 TB: two bounded shuffles (bucket window, rank equi-join);
    neighborhoods spanning bucket boundaries still pair because ranks are
    globally dense across buckets.  Skew: a hot first byte makes one
    bucket large — widen to a 2-byte monotone bucket before the corpus
    outgrows a single task's sort budget.

    Output: ``id_a``/``id_b`` (id_a < id_b by rank), both keys, ``dist``.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    s = F.coalesce(F.col(key_col), F.lit(""))
    # clamp keeps the bucket map total AND monotone for codepoints > 255
    # (everything above folds into the last bucket; within-bucket ordering
    # by the full key preserves the global order)
    first_byte = F.least(
        F.coalesce(F.ascii(F.substring(s, 1, 1)), F.lit(0)), F.lit(255)
    ).cast("int")
    # Pin ONE evaluation of the input before the driver-side count
    # collect: without it the lineage runs twice (once for the offsets,
    # once for the ranked pass), and a nondeterministic or expensive
    # upstream (sampled input, regenerated source) could hand the two
    # passes different rows — offsets computed against data that no
    # longer exists.  Same eager-build contract as pointer_jump_roots.
    bucketed = df.select(
        F.col(id_col), s.alias("_k"), first_byte.alias("_b")
    ).localCheckpoint(eager=True)
    counts = {
        r["_b"]: r["n"]
        for r in bucketed.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in range(256):
        offsets[b] = acc
        acc += counts.get(b, 0)
    offset_expr = F.element_at(
        F.array(*[F.lit(offsets[b]) for b in range(256)]), F.col("_b") + 1
    )
    w = Window.partitionBy("_b").orderBy(F.asc("_k"), F.asc(id_col))
    ranked = bucketed.withColumn(
        "rank", (F.row_number().over(w) - 1 + offset_expr).cast("long")
    ).select(id_col, "_k", "rank")
    right = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("_k").alias("key_b"),
        F.col("rank").alias("rank_b"),
    )
    probes = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("_k").alias("key_a"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, window + 1)])
        ).alias("_dlt"),
        F.col("rank").alias("rank_a"),
    ).withColumn("rank_b", F.col("rank_a") + F.col("_dlt"))
    return (
        probes.join(right, "rank_b")
        .where(F.levenshtein("key_a", "key_b") <= max_dist)
        .select(
            "id_a",
            "id_b",
            "key_a",
            "key_b",
            F.levenshtein("key_a", "key_b").cast("long").alias("dist"),
        )
    )
