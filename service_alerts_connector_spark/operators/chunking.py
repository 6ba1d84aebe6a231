"""Document chunking and per-source quota sampling for training pipelines.

``chunk_documents`` splits each document's token stream into fixed-size
overlapping windows (the tokenizer "stride/overflow" convention): window i
starts at ``i × (chunk_tokens − overlap_tokens)`` and the series stops with
the first window that reaches the end of the document, so no redundant tail
window is emitted.  The whole operator is a narrow projection + explode —
NO shuffle, so at 100 TB it pipelines with the scan and whatever follows.

``source_quota`` caps each source/domain at ``quota`` documents, picking a
deterministic pseudo-random subset (ordered by md5 of the id, id tiebreak)
so the sample is stable across runs and engines — the "source mixing" step
that stops one crawl domain from dominating a training mix.  One shuffle on
the group key; per-group state is a row_number, so skewed sources stream
through a single window scan rather than materializing per-group arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from service_alerts_connector_spark.functions.text import tokens


def chunk_count(n_tokens: Column, chunk_tokens: int, step: int) -> Column:
    """Number of windows: 1 if the doc fits in one chunk, else
    1 + ceil((n − chunk)/step); 0 for empty docs."""
    over = n_tokens - F.lit(chunk_tokens)
    extra = F.ceil(over.cast("double") / F.lit(step)).cast("int")
    return (
        F.when(n_tokens <= 0, F.lit(0))
        .when(over <= 0, F.lit(1))
        .otherwise(F.lit(1) + extra)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 8,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_chunk_tokens) — one row per
    fixed-size overlapping token window.  Empty documents yield no chunks.

    Tokens are materialized in a projection before the explode (the repo's
    transform-lambda rule: never recompute ``tokens()`` per element)."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    step = chunk_tokens - overlap_tokens
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    cnt = chunk_count(F.col("_n"), chunk_tokens, step)
    # sequence(0, -1) counts DOWN (step defaults to -1 when start > stop),
    # so the empty-doc case must short-circuit to an empty array.
    idxs = F.when(cnt > 0, F.sequence(F.lit(0), cnt - 1)).otherwise(
        F.array().cast("array<int>")
    )
    exploded = toked.select(id_col, "_toks", F.explode(idxs).alias("chunk_idx"))
    piece = F.slice(F.col("_toks"), F.col("chunk_idx") * step + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_chunk_tokens"),
    )


def pack_bins(
    df: DataFrame,
    shard_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 256,
) -> DataFrame:
    """Sequence packing (concat-and-chunk convention): documents are laid
    end-to-end in id order within each shard and ``bin_idx`` is the
    token-budget bin the document STARTS in — ``cumsum_before div
    capacity`` — so a bin holds ~``capacity`` tokens and a document may
    straddle its boundary (the trainer's chunker splits it there).

    Scale: the running sum is a window per SHARD, never a global
    single-partition window — packing parallelizes across shards exactly
    like the files a writer would emit.  Adds ``offset_in_bin`` (where the
    doc starts inside its bin) for the downstream chunker."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn(
        "_cum_before", F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    )
    return (
        out.withColumn("bin_idx", F.expr(f"_cum_before div {int(capacity)}"))
        .withColumn("offset_in_bin", F.expr(f"_cum_before % {int(capacity)}"))
        .drop("_cum_before")
    )


def source_quota(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 100,
) -> DataFrame:
    """At most ``quota`` rows per group, chosen by md5-hash order of the id
    (deterministic, engine-portable, uncorrelated with the id order) with
    the id itself as tiebreak.  Adds ``quota_rank`` (1-based) so callers can
    audit how deep into the group each kept row sat."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("quota_rank", F.row_number().over(w))
        .where(F.col("quota_rank") <= quota)
    )


def assign_sequential_ids(
    df: DataFrame,
    order_col: str,
    out_col: str = "seq_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Dense 0-based sequential ids in ``order_col`` order — WITHOUT the
    single-partition global window the naive ``row_number() OVER (ORDER BY
    …)`` plans, and without ``monotonically_increasing_id`` (whose values
    depend on partition layout).

    Two phases: (1) md5-range-bucket every row and count each bucket — one
    tiny aggregation, ``n_buckets`` rows to the driver (bounded by
    construction); (2) prefix-sum the counts into per-bucket offsets,
    broadcast them back, and add a within-bucket row_number.  Every window
    sorts only ~n/n_buckets rows.  Requires ``order_col`` values unique
    (ids); ordering is by the md5-bucketed hash order of the key — a
    STABLE total order reproducible in any engine, not insertion order."""
    if not 1 <= n_buckets <= 256:
        raise ValueError("n_buckets must be in [1, 256]")
    h = F.md5(F.col(order_col).cast("string"))
    # RANGE bucketing on the first hash byte (monotone: byte*n div 256), NOT
    # modulo — only a monotone bucket keeps (bucket, hash) order equal to
    # plain hash order, which is what makes the global id sequence a single
    # ORDER BY md5(key) in the oracle.
    byte = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    scaled = byte * F.lit(n_buckets)
    bucket = ((scaled - scaled % 256) / 256).cast("int")
    bucketed = df.withColumn("_b", bucket)
    counts = {
        r["_b"]: r["n"]
        for r in bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    offset_expr = F.element_at(
        F.array(*[F.lit(offsets[b]) for b in range(n_buckets)]), F.col("_b") + 1
    )
    w = Window.partitionBy("_b").orderBy(h.asc(), F.col(order_col).asc())
    return (
        bucketed.withColumn(
            out_col,
            (F.row_number().over(w) - 1 + offset_expr).cast("bigint"),
        )
        .drop("_b")
    )
