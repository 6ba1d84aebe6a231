"""Vector-column expressions: L2 normalization and dimension-wise corpus
statistics for embedding tables (array<float>).

All expression-only (zip_with/aggregate/transform folds — JVM-side), with
the repo's float-determinism discipline:

* norms and dot products are explicit left-associated folds, matching the
  sequential ``list_aggregate``/``list_dot_product`` evaluation an oracle
  performs (the pattern proven by the green ``ann_*`` rows);
* corpus-wide per-dimension sums are EXACT integer sums of µ-scaled
  components (``round(x × 1e6)`` as bigint) — a floating sum's value
  depends on partition merge order, so a distributed mean can never be
  hash-compared at 6 dp, while an integer sum is associative and portable
  (same rule as the catalog's money-in-cents sums).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vec_norm(vec: Column) -> Column:
    """L2 norm of an array column (left-assoc fold over doubles)."""
    v = vec.cast("array<double>")
    return F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(vec: Column, norm: Column) -> Column:
    """vec / norm, elementwise.  ``norm`` must be a MATERIALIZED column from
    a prior projection (repo transform-lambda rule: a captured expression
    re-evaluates per element; a captured column reference does not) —
    callers do ``df.withColumn("n", vec_norm(v)).withColumn("e", l2_normalize(v, F.col("n")))``."""
    return F.transform(vec.cast("array<double>"), lambda x: x / norm)


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Attach ``norm`` and the unit-normalized vector (zero vectors stay
    zero rather than dividing by 0)."""
    v = F.col(vec_col)
    with_norm = df.withColumn("norm", vec_norm(v))
    unit = F.when(
        F.col("norm") == 0.0, v.cast("array<double>")
    ).otherwise(l2_normalize(v, F.col("norm")))
    return with_norm.withColumn(out_col, unit)


def dim_stats_micro(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(dim, n, sum_micro, min_micro, max_micro) per embedding dimension —
    posexplode + one groupBy(dim).  The µ-scaled integer sum is exact and
    associative, so the result is identical for any partitioning / any
    engine; consumers derive the mean as ``sum_micro / (n × 1e6)``."""
    cell = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x")
    ).select(
        "dim", F.round(F.col("x") * 1_000_000).cast("bigint").alias("micro")
    )
    return cell.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("micro").alias("sum_micro"),
        F.min("micro").alias("min_micro"),
        F.max("micro").alias("max_micro"),
    )
