"""Similarity search over embedding columns (array<float>).

Two tiers:

* ``cosine_topk``        — brute-force cosine against a query vector as a
                           pure expression plan (zip_with/aggregate fold —
                           JVM-side, codegen'd).  The correctness baseline.
* ``bucketed_cosine_topk`` — sign-LSH bucketing (hyperplane signs): probe
                           only the query's bucket.  The scale path: at 100 TB
                           the table is written bucketed/partitioned by this
                           key, so a query prunes to one bucket's files.
* ``cosine_topk_mapinpandas`` — Arrow-batched NumPy matmul variant of the
                           brute force (per-partition partial top-k, then
                           global merge) — the pattern to swap in when the
                           embedding dimension/corpus makes expression folds
                           uncompetitive.

Cosines are rounded to 6 dp before ranking, with the id as tiebreak, so
results are deterministic and engine-portable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_cosine(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    out_col: str = "cos",
) -> DataFrame:
    """Attach round(cosine(vec, query), 6)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(
        out_col, F.round(_dot(v, q) / (_norm(v) * _norm(q)), 6)
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k (TakeOrderedAndProject — each partition keeps
    k candidates; no global sort materialization)."""
    return (
        with_cosine(df, query_vec, vec_col)
        .select(F.col(id_col), F.col("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def sign_bucket(vec_col: Column, n_planes: int = 3) -> Column:
    """Sign-LSH bucket id from the signs of the first ``n_planes`` axis
    projections (deterministic, engine-portable).  A production variant
    would use seeded random hyperplanes via a broadcast plane matrix; axis
    planes keep the operator expression-only."""
    bits = [
        F.when(F.element_at(vec_col, i + 1) > 0, F.lit(2 ** (n_planes - 1 - i)))
        .otherwise(F.lit(0))
        for i in range(n_planes)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def bucketed_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 3,
) -> DataFrame:
    """ANN: restrict the scan to the query's sign-LSH bucket, then exact
    cosine top-k within it.  With the table partitioned by bucket this is a
    partition-pruned scan of ~1/2^n_planes of the data."""
    qbits = 0
    for i in range(n_planes):
        if float(query_vec[i]) > 0:
            qbits += 2 ** (n_planes - 1 - i)
    bucketed = df.withColumn(
        "bucket", sign_bucket(F.col(vec_col).cast("array<double>"), n_planes)
    ).where(F.col("bucket") == F.lit(qbits))
    return cosine_topk(bucketed, query_vec, k, vec_col, id_col)


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF: assign each vector to its nearest centroid (broadcast list of
    centroids, expression-only distance argmin).  At scale the table is
    written partitioned by ``ivf_cell`` so probes read only n_probe cells."""
    v = F.col(vec_col).cast("array<double>")
    best_cell = None
    best_dist = None
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c]).cast("array<double>")
        diff = F.zip_with(v, carr, lambda x, y: (x - y) * (x - y))
        d = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
        if best_cell is None:
            best_cell, best_dist = F.lit(ci), d
        else:
            cond = d < best_dist
            best_cell = F.when(cond, F.lit(ci)).otherwise(best_cell)
            best_dist = F.when(cond, d).otherwise(best_dist)
    return df.withColumn("ivf_cell", best_cell)


def train_centroids_kmeanspp_lite(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 256,
    iterations: int = 2,
) -> list[list[float]]:
    """Deterministic lite k-means for IVF cells: seed with the k
    lowest-id sampled vectors, refine with ``iterations`` Lloyd steps
    computed as DataFrame aggregations (mean per cell).  Deterministic by
    construction (no RNG) — good enough cells for inverted-file pruning;
    a production index would train offline with MLlib KMeans."""
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    centroids = [
        [float(x) for x in r[vec_col]] for r in seed_rows[:k]
    ]
    work = df.select(id_col, vec_col).orderBy(id_col).limit(sample)
    for _ in range(iterations):
        assigned = ivf_assign(work, centroids, vec_col)
        dim = len(centroids[0])
        means = assigned.groupBy("ivf_cell").agg(
            *[
                F.avg(F.col(vec_col).cast("array<double>")[i]).alias(f"c{i}")
                for i in range(dim)
            ]
        )
        got = {
            r["ivf_cell"]: [r[f"c{i}"] for i in range(dim)]
            for r in means.collect()
        }
        centroids = [got.get(ci, centroids[ci]) for ci in range(k)]
    return centroids


def ivf_topk(
    df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: exact cosine top-k over only the ``n_probe`` cells whose
    centroids are nearest the query — scanning ~n_probe/k of the data."""
    q = query_vec
    dists = [
        (ci, sum((float(a) - float(b)) ** 2 for a, b in zip(c, q)))
        for ci, c in enumerate(centroids)
    ]
    probe_cells = [ci for ci, _ in sorted(dists, key=lambda t: t[1])[:n_probe]]
    assigned = ivf_assign(df, centroids, vec_col)
    candidates = assigned.where(F.col("ivf_cell").isin(probe_cells))
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 2,
) -> DataFrame:
    """Embedding-cosine near-dup detection: candidate pairs from a sign-LSH
    bucketed self-join, verified by exact cosine ≥ threshold.

    The bucket equi-join keeps the pair space at Σ(bucket²) instead of n² —
    with b buckets of even size that is n²/b; near-identical vectors share
    sign buckets by construction (opposite-sign components would already
    make them dissimilar).  Scale path: write the table partitioned by
    bucket → the self-join becomes partition-local.
    """
    v = F.col(vec_col).cast("array<double>")
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), sign_bucket(v, n_planes).alias("_b")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pair_cos = F.round(
        _dot(
            F.col(f"a.{vec_col}").cast("array<double>"),
            F.col(f"b.{vec_col}").cast("array<double>"),
        )
        / (
            _norm(F.col(f"a.{vec_col}").cast("array<double>"))
            * _norm(F.col(f"b.{vec_col}").cast("array<double>"))
        ),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a._b") == F.col("b._b"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("cos", pair_cos)
        .where(F.col("cos") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cos",
        )
    )


def cosine_topk_mapinpandas(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """NumPy-vectorized brute force: per-Arrow-batch matmul, per-partition
    partial top-k, global top-k merge.  Same contract as ``cosine_topk``."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dots = m @ q
            norms = np.sqrt((m * m).sum(axis=1))
            cos = np.round(dots / (norms * qn), 6)
            cand = pd.DataFrame({id_col: pdf[id_col], "cos": cos})
            best = cand if best is None else pd.concat([best, cand])
            best = best.sort_values(
                ["cos", id_col], ascending=[False, True]
            ).head(k)
        if best is not None:
            yield best

    schema = f"{id_col} long, cos double"
    partials = df.select(id_col, vec_col).mapInPandas(part, schema)
    return partials.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
