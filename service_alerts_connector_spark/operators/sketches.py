"""Deterministic sketches and hash-based dataset splitting.

Training-data pipelines need cardinality estimates and reproducible
train/val/test assignment that are STABLE across engines, runs, and
cluster layouts.  Spark's native ``approx_count_distinct`` (HyperLogLog++)
is excellent at 100 TB but its exact output is engine-specific, so it can't
be differentially tested against another engine; the K-Minimum-Values
sketch here is built from md5 — portable, deterministic, and still a
bounded-memory one-pass estimate.  Both md5-derived primitives floor/format
per the repo determinism rules (CLAUDE.md): hex→int via ``conv`` in Spark
and ``('0x' || h)::BIGINT`` in DuckDB produce identical values.

KMV at scale: the k smallest distinct hashes per group.  One
``distinct`` shuffle (O(n) rows, map-side combined) then a per-group
top-k.  A plain ``row_number`` window sorts each whole group, so a hot
group (billions of distinct keys) becomes one giant sort partition;
``salt_buckets`` switches on a two-phase prune — k smallest per
(group, salt) first, so the final per-group sort sees at most
``salt_buckets × k`` rows whatever the group size.  Estimate error is
~1/sqrt(k-2) (Beyer et al., "On synopses for distinct-value estimation
under multiset operations", SIGMOD'07).

Hash split: the md5 fraction of the id decides the split, so membership
is a pure function of the row — adding/removing rows never reshuffles
other rows' assignments (critical when a corpus is re-snapshotted), and
any engine reproduces it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO32 = float(1 << 32)


def md5_frac32(col: Column) -> Column:
    """Uniform-ish fraction in (0, 1] from the first 8 hex chars of
    md5(col-as-string).  ``+1`` avoids an exact zero (division guard) at a
    negligible 2^-32 bias; DuckDB equivalent:
    ``(('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 8))::BIGINT + 1) / 4294967296.0``.
    """
    v = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return (v + F.lit(1)) / F.lit(_TWO32)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    k: int = 64,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Per-group distinct-count estimate: ``(k-1) / frac(k-th smallest
    md5)``, exact when a group has fewer than ``k`` distinct keys.

    Output: group columns + ``kmv_distinct`` (bigint; floored — Spark's
    cast floors while DuckDB's rounds, so the floor is explicit).
    """
    groups = [F.col(c) for c in group_cols]
    d = df.select(*groups, F.md5(F.col(key_col).cast("string")).alias("_h")).distinct()
    if salt_buckets:
        # phase 1: k smallest per (group, salt) — bounds every sort
        # partition; salt from the hash itself so it's deterministic.
        salt = (
            F.conv(F.substring("_h", 25, 4), 16, 10).cast("long") % salt_buckets
        )
        w1 = Window.partitionBy(*group_cols, "_salt").orderBy("_h")
        d = (
            d.withColumn("_salt", salt)
            .withColumn("_rn", F.row_number().over(w1))
            .where(F.col("_rn") <= k)
            .drop("_salt", "_rn")
        )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = d.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    kth_frac = (
        F.conv(F.substring(F.max(F.when(F.col("_rn") == k, F.col("_h"))), 1, 8), 16, 10)
        .cast("long")
        + F.lit(1)
    ) / F.lit(_TWO32)
    return ranked.groupBy(*group_cols).agg(
        F.when(F.count("_h") < k, F.count("_h"))
        .otherwise(F.floor(F.lit(float(k - 1)) / kth_frac))
        .cast("long")
        .alias("kmv_distinct")
    )


def kmv_synopsis(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """The k smallest md5 hashes of a column's DISTINCT value set — a
    mergeable bottom-k set synopsis (Beyer et al., "On synopses for
    distinct-value estimation under multiset operations", SIGMOD'07).

    Output: one column ``_h`` (md5 hex), ≤ k rows.  The build is
    distinct → ``orderBy(_h).limit(k)``: Spark plans TakeOrderedAndProject
    (per-partition partial bottom-k, then a k-row driver merge) — no
    global sort, no unpartitioned window, so the build survives any corpus
    size; two synopses union-merge into the synopsis of the union.
    """
    return (
        df.select(F.md5(F.col(key_col).cast("string")).alias("_h"))
        .distinct()
        .orderBy("_h")
        .limit(k)
    )


def kmv_set_overlap(
    syn_a: DataFrame, syn_b: DataFrame, k: int = 256
) -> DataFrame:
    """Distinct-set union / intersection estimates from two bottom-k
    synopses — the join-cardinality-estimation primitive a 100 TB planner
    uses before committing to a join strategy (everything downstream of
    the two synopsis builds touches ≤ 2k rows).

    Estimators, kept EXACT-integer so the cross-engine oracle is
    bit-identical (the k-th smallest hash prefix v is a bigint; all
    divisions are non-negative floor divisions staged identically in both
    engines): with M = the k smallest hashes of the merged synopses and
    c = |M ∩ A ∩ B|,

    - ``union_est``  = (k-1) * 2^32 div (v+1)      [exact count when < k]
    - ``intersect_est`` = c * union_est div k

    Output: one row (k, n_merged, c_common, union_est, intersect_est).
    """
    merged = (
        syn_a.union(syn_b).distinct().orderBy("_h").limit(k)
    )
    in_a = syn_a.select(F.col("_h").alias("_ha"))
    in_b = syn_b.select(F.col("_h").alias("_hb"))
    flagged = (
        merged.join(
            F.broadcast(in_a), F.col("_h") == F.col("_ha"), "left"
        )
        .join(F.broadcast(in_b), F.col("_h") == F.col("_hb"), "left")
        .select(
            "_h",
            (
                F.col("_ha").isNotNull() & F.col("_hb").isNotNull()
            ).cast("long").alias("_both"),
        )
    )
    v = F.conv(F.substring(F.max("_h"), 1, 8), 16, 10).cast("long")
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.sum("_both").alias("c_common"),
        v.alias("_v"),
    )
    union_est = F.when(
        F.col("n_merged") < k, F.col("n_merged")
    ).otherwise(
        F.expr(f"({k} - 1) * {1 << 32}L div (_v + 1)")
    )
    est = agg.select(
        F.lit(k).alias("k"),
        "n_merged",
        "c_common",
        union_est.alias("union_est"),
    )
    return est.withColumn(
        "intersect_est",
        F.when(F.col("n_merged") < k, F.col("c_common")).otherwise(
            F.expr(f"c_common * union_est div {k}")
        ),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs_mille: Sequence[int] = (500, 900, 990),
) -> DataFrame:
    """Mergeable log₂-bucket quantile estimates for a non-negative integer
    measure (doc lengths, token counts, payload sizes).

    Bucket = bit length of the value (``length(bin(v))`` — identical in
    Spark and DuckDB, so the sketch is engine-portable), giving ≤64 cells
    per group however large the group: phase 1 is a groupBy((group,
    bucket)) count whose shuffle carries a BOUNDED number of rows, cells
    merge by adding counts (cross-day/cross-shard rollups are free), and
    phase 2 walks the ≤64-row cumulative histogram per group.  The
    p-quantile estimate is the upper bound of the first bucket whose
    cumulative count reaches ``ceil(p·n)`` — an overestimate by at most
    2× (one bucket), the resolution/state trade every log-histogram
    sketch (HdrHistogram, DDSketch with γ=2) makes.

    ``probs_mille`` are integer per-mille probabilities so the threshold
    compare (``cum·1000 ≥ p·n``) stays in exact integer arithmetic on
    both engines.  Output: group cols + ``n`` + one ``q{p}`` column per
    requested quantile (bigint upper-bound estimates).
    """
    groups = [F.col(c) for c in group_cols]
    cells = (
        df.where(F.col(value_col) >= 0)
        .select(
            *groups,
            F.length(F.bin(F.col(value_col).cast("long"))).alias("_bucket"),
        )
        .groupBy(*group_cols, "_bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(*group_cols))
    )
    upper = F.expr("shiftleft(CAST(1 AS BIGINT), _bucket) - 1")
    aggs = [F.max("_n").alias("n")] + [
        F.min(
            F.when(F.col("_cum") * 1000 >= F.lit(p) * F.col("_n"), upper)
        ).alias(f"q{p}")
        for p in probs_mille
    ]
    return cum.groupBy(*group_cols).agg(*aggs)


def histogram_quantiles_sql(
    table_expr: str,
    value_sql: str,
    group_sql: Sequence[str],
    probs_mille: Sequence[int] = (500, 900, 990),
) -> str:
    """DuckDB mirror of ``histogram_quantiles`` (same buckets, same
    integer threshold compare) for oracle construction."""
    g = ", ".join(group_sql)
    qcols = ", ".join(
        f"min(CASE WHEN _cum * 1000 >= {p} * _n "
        f"THEN (CAST(1 AS BIGINT) << _bucket) - 1 END) AS q{p}"
        for p in probs_mille
    )
    return f"""
WITH cells AS (
  SELECT {g}, length(bin(CAST({value_sql} AS BIGINT))) AS _bucket,
         count(*) AS _c
  FROM {table_expr} WHERE {value_sql} >= 0
  GROUP BY {g}, _bucket
), cum AS (
  SELECT {g}, _bucket, _c,
         sum(_c) OVER (PARTITION BY {g} ORDER BY _bucket) AS _cum,
         sum(_c) OVER (PARTITION BY {g}) AS _n
  FROM cells
)
SELECT {g}, CAST(max(_n) AS BIGINT) AS n, {qcols}
FROM cum GROUP BY {g}
"""


DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.8),
    ("val", 0.1),
    ("test", 0.1),
)


def split_bounds(
    fracs: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
) -> list[tuple[str, int]]:
    """Cumulative 16-bit integer upper bounds for each split label
    (shared by the Spark expression and the SQL oracle so both engines
    draw identical boundaries)."""
    acc, out = 0.0, []
    for name, frac in fracs:
        acc += frac
        out.append((name, min(int(acc * 65536), 65536)))
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    seed: str = "split-v1",
    fracs: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
) -> DataFrame:
    """Deterministic train/val/test assignment: a ``split`` column chosen
    by the 16-bit md5 fraction of ``seed || ':' || id``.  Membership is a
    pure row function — stable under repartitioning, appends, and engine
    choice.  Change ``seed`` to draw an independent split.
    """
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    expr: Column | None = None
    for name, bound in reversed(split_bounds(fracs)):
        expr = F.lit(name) if expr is None else F.when(v < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def hash_split_sql(
    id_sql: str,
    seed: str = "split-v1",
    fracs: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
) -> str:
    """The DuckDB expression computing the identical split label (for
    oracle construction and for users verifying assignments off-cluster)."""
    v = f"('0x' || substr(md5('{seed}:' || CAST({id_sql} AS VARCHAR)), 1, 4))::BIGINT"
    bounds = split_bounds(fracs)
    cases = " ".join(
        f"WHEN {v} < {bound} THEN '{name}'" for name, bound in bounds[:-1]
    )
    return f"CASE {cases} ELSE '{bounds[-1][0]}' END"


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of a key stream as a SPARSE (row, col, cnt) table —
    ``depth`` md5-derived hash rows of ``width`` buckets.  One narrow
    explode (``depth`` cells per input row) + one groupBy((row, col)) with
    map-side combine, so the shuffle carries at most ``depth × width``
    distinct cells regardless of corpus size — the whole sketch is ~KBs at
    any scale, and two sketches merge by adding cells (the property stream
    compaction at 100 TB relies on).

    Engine-portable by construction: cell = md5(f"cms{row}:{key}") mod
    width, same recipe any SQL engine reproduces.  Estimates from
    ``cms_estimate`` carry the classic one-sided guarantee (est ≥ true;
    est ≤ true + εN with ε = e/width at probability 1 − (1/e)^depth)."""
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"cms{j}:"),
                                            F.col(key_col).cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
        w.alias("_w"),
    )
    return (
        cells.select(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"), "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each probe key against a count-min sketch: min over
    the key's ``depth`` cells.  The sketch side is ≤ depth×width rows so
    the join broadcasts; missing cells read as 0."""
    probe_cells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"cms{j}:"),
                                            F.col(key_col).cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    joined = probe_cells.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a SPARSE (word, bits)
    bitmap table — 32-bit words so every mask stays far from BIGINT
    overflow in any engine.

    Hashing is the repo's portable md5 recipe (``bf{j}:`` salt per hash
    function), so DuckDB reproduces the identical bitmap bit-for-bit.
    Build cost: one narrow explode (k cells/row) + groupBy(word) with
    map-side combine — the shuffle carries at most m_bits/32 rows
    regardless of input size, and two filters merge by OR-ing words.

    False-positive rate ≈ (1 − e^(−k·n/m))^k; size m for the build-side
    cardinality, not the probe side.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"bf{j}:"),
                                        F.col(key_col).cast("string"),
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % m_bits
                    )
                    for j in range(k)
                ]
            )
        ).alias("pos")
    )
    return (
        cells.select(
            (F.col("pos") / 32).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "_m"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Filter ``df`` to rows whose key passes the Bloom filter (supersets
    the exact semi-join by the filter's false-positive rate).

    Scale shape: k chained BROADCAST joins against the ≤ m_bits/32-row
    bitmap plus a scalar filter — the fact side is never exploded,
    shuffled, or aggregated, so this is a zero-shuffle narrow pipeline
    over the probe table (the whole point of Bloom-pruning a semi-join
    at 100 TB: ship KBs of bitmap instead of shuffling the fact rows).
    Pinned by tests/test_plan_shapes.py::test_bloom_probe_zero_shuffle.

    Catalyst re-plans the ``bloom`` subtree once per chained join; when
    the build side is itself expensive, ``bloom.cache()`` (or persist the
    bitmap table) before probing so the build runs once.
    """
    out = df
    pass_cond = F.lit(True)
    for j in range(k):
        pos = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bf{j}:"), F.col(key_col).cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        out = (
            out.withColumn(f"_p{j}", pos)
            .withColumn(f"_w{j}", (F.col(f"_p{j}") / 32).cast("long"))
            .withColumn(
                f"_m{j}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(_p{j} % 32 AS INT))"
                ),
            )
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word").alias(f"_w{j}"),
                        F.col("bits").alias(f"_b{j}"),
                    )
                ),
                f"_w{j}",
                "left",
            )
        )
        pass_cond = pass_cond & (
            F.coalesce(F.col(f"_b{j}"), F.lit(0)).bitwiseAND(F.col(f"_m{j}"))
            != 0
        )
    drop = [c for j in range(k) for c in (f"_p{j}", f"_w{j}", f"_m{j}", f"_b{j}")]
    return out.where(pass_cond).drop(*drop)


BLOOM_STORE = "bloom_seen"


def incremental_bloom_screen(
    spark,
    root: str,
    batch: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
):
    """O(batch) duplicate pre-screen for a streaming ingest loop: probe the
    arriving batch against a PERSISTENT versioned Bloom bitmap of every key
    ever admitted, then merge the batch's bits in (snapshot-write-last).

    Returns ``(definitely_new, maybe_dup)``:

    * ``definitely_new`` — rows whose key does NOT pass the filter.  The
      no-false-negative guarantee makes this exact: these keys have never
      been seen, so they skip the expensive exact-store check entirely.
    * ``maybe_dup`` — rows that pass (true repeats + the filter's fp rate),
      plus every row of any key that occurs more than once WITHIN the
      batch (the bitmap merges only after routing, so intra-batch repeats
      are flagged by a separate O(batch) count — keeping the exactness
      claim above true even for self-duplicating batches).
      Only this residue needs the exact semi-join against the full key
      store — at ingest workloads where most keys are new, the expensive
      path shrinks from O(batch) to O(dups + fp·batch).

    Same store discipline as ``textdedup.incremental_dedup_batch``: the
    previous bitmap is read PINNED to its immutable version directory so
    the returned lazy frames survive the store overwrite, and the merge is
    a bit_or over ≤ m/32 word rows — the store never grows with corpus
    size, only saturates (re-shard to a larger ``m`` when the fill rate
    approaches the fp budget; fill is auditable as sum(bit_count(bits))).
    """
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
        write_dataset,
    )

    versions = list_versions(root, BLOOM_STORE)
    prev = (
        read_dataset(spark, root, BLOOM_STORE, version=versions[-1])
        if versions
        else None
    )
    empty_bloom = prev is None
    if empty_bloom:
        prev = bloom_build(batch.limit(0), key_col, m_bits=m_bits, k=k)

    bloom_hits = bloom_probe(batch, prev, key_col, m_bits=m_bits, k=k)
    # intra-batch repeats must also land in maybe_dup: the bitmap only
    # merges AFTER routing, so without this a key arriving twice in one
    # batch would sail through definitely_new twice and break the
    # "never been seen" exactness claim.  One O(batch) groupBy count.
    repeat_keys = (
        batch.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select(key_col)
    )
    flagged = (
        bloom_hits.select(key_col).unionByName(repeat_keys).distinct()
    )
    maybe_dup = batch.join(flagged, key_col, "left_semi")
    definitely_new = batch.join(flagged, key_col, "left_anti")

    batch_bits = bloom_build(batch, key_col, m_bits=m_bits, k=k)
    merged = (
        batch_bits
        if empty_bloom
        else prev.unionByName(batch_bits)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    write_dataset(merged, root, BLOOM_STORE)
    return definitely_new, maybe_dup


def source_mixing(
    df: DataFrame,
    config: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix-v1",
) -> DataFrame:
    """Config-driven downsampling for training-mix construction: keep a row
    iff its 16-bit md5 fraction is below the group's ``keep_per_65536``
    bound from the broadcast ``config`` table (integer bounds — no float
    rate can drift between engines).  Membership is a pure row function
    (same invariance story as ``hash_split``); groups missing from the
    config are dropped (inner join), which doubles as an allowlist."""
    h16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    return (
        df.join(F.broadcast(config), group_col, "inner")
        .withColumn("_h16", h16)
        .where(F.col("_h16") < F.col("keep_per_65536"))
        .drop("_h16")
    )


# ---------------------------------------------------------------------------
# HyperLogLog (portable, md5-derived)
# ---------------------------------------------------------------------------
HLL_BUCKET_HEX = 2          # 2 hex chars → m = 256 registers
HLL_M = 16 ** HLL_BUCKET_HEX
HLL_TAIL_BITS = 40          # 10 hex chars of tail; rho ∈ [1, 41]
# alpha_m · m² · 2^41 — folded once in Python so Spark and DuckDB divide by
# the SAME double constant (literal-typing differs between engines: DuckDB
# parses bare decimals as DECIMAL, Spark as double).
HLL_NUMERATOR = (
    0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(1 << (HLL_TAIL_BITS + 1))
)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: Sequence[str]
) -> DataFrame:
    """Per-group HyperLogLog register table (Flajolet et al. 2007): bucket =
    first ``HLL_BUCKET_HEX`` hex chars of md5(key), rho = 1 + count of
    leading zero bits in the next ``HLL_TAIL_BITS`` bits.

    Built from md5 so any engine reproduces the registers bit-for-bit —
    Spark's native ``approx_count_distinct`` is also HLL but its estimate is
    engine-private and can't be differentially tested (see module
    docstring).  Leading-zero count avoids float log2 (which can be off by
    one ulp at exact powers of two in either engine): ``conv(hex, 16, 2)``
    / DuckDB ``bin()`` both render minimal binary digits, so bit-length is
    just ``length()`` of that string.

    One shuffle of ≤ groups × m register rows (map-side-combined max); no
    ``distinct`` pass needed — duplicate keys hit the same register with
    the same rho.  Registers merge across corpus shards by groupBy-max,
    pinned in tests/test_sketches.py.

    Output: group cols + ``bucket`` (int) + ``rho`` (int).
    """
    groups = [F.col(c) for c in group_cols]
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, HLL_BUCKET_HEX), 16, 10).cast("int")
    tail_hex = F.substring(h, HLL_BUCKET_HEX + 1, HLL_TAIL_BITS // 4)
    tail_bin = F.conv(tail_hex, 16, 2)
    bitlen = F.when(tail_bin == "0", F.lit(0)).otherwise(F.length(tail_bin))
    rho = (F.lit(HLL_TAIL_BITS + 1) - bitlen).cast("int")
    return (
        df.select(*groups, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Raw HLL estimate from a register table: alpha·m²/Σ2^-rho, with the
    harmonic sum carried as an exact integer ``Σ 2^(41-rho)`` (each term
    ≤ 2^40, ≤ m terms → < 2^49: exact in bigint AND in the one double cast
    that follows), so the only float ops are one exactly-rounded division
    — bit-identical across engines.  Empty registers contribute 2^41 each.

    Raw estimate only (no linear-counting small-range correction: that
    needs ln(), which is NOT exactly-rounded libm and may differ by an ulp
    between engines — callers in the linear regime should use KMV instead;
    ``zero_registers`` is emitted so the regime is auditable).

    Output: group cols + ``hll_estimate`` (floored bigint),
    ``zero_registers`` (bigint).
    """
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_TAIL_BITS + 1} - rho)")
    agg = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_present"),
    )
    empty_term = F.lit(1 << (HLL_TAIL_BITS + 1)).cast("long")
    s_total = F.col("_s_present") + (F.lit(HLL_M) - F.col("_n_present")) * empty_term
    return agg.select(
        *group_cols,
        F.floor(F.lit(HLL_NUMERATOR) / s_total.cast("double"))
        .cast("long")
        .alias("hll_estimate"),
        (F.lit(HLL_M) - F.col("_n_present")).cast("long").alias("zero_registers"),
    )


HLL_STORE = "hll_registers"


def incremental_hll_ingest(
    spark,
    root: str,
    batch: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """O(batch) per-group distinct-count maintenance for a streaming ingest
    loop: fold the arriving batch's HLL registers into a PERSISTENT
    versioned register store (merge = groupBy max — the property pinned in
    ``test_hll_registers_merge_by_max``) and return the refreshed
    estimates.

    The streaming-analogue invariant (streaming/ module convention): after
    any sequence of batches, the stored registers — and therefore the
    estimate — are IDENTICAL to a single batch-mode ``hll_registers`` over
    the union of all batches, because max-merge is associative and
    duplicate-insensitive.  No rescan of history, ever; the store is
    bounded at groups × m register rows however many batches arrive (same
    saturation story as the Bloom ingest screen).

    Store discipline per CLAUDE.md: the previous registers are read PINNED
    to their immutable version dir, and the returned estimate reads the
    newly WRITTEN version — no lazy frame ever spans an overwrite.
    """
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
        write_dataset,
    )

    versions = list_versions(root, HLL_STORE)
    batch_regs = hll_registers(batch, key_col, group_cols)
    if versions:
        prev = read_dataset(spark, root, HLL_STORE, version=versions[-1])
        merged = (
            prev.unionByName(batch_regs)
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("rho"))
        )
    else:
        merged = batch_regs
    write_dataset(merged, root, HLL_STORE)
    fresh = read_dataset(spark, root, HLL_STORE)
    return hll_estimate(fresh, group_cols)
