"""Skew mitigation operators for hot keys at scale.

AQE's skew-join splitting (on in session.py) handles most cases at runtime;
these explicit tools cover the two places AQE can't help:

* ``salted_aggregate`` — two-phase aggregation for groupBy keys with
  pathological cardinality skew (e.g. a dedup hash where 30% of a 100 TB
  corpus is one boilerplate document): phase 1 aggregates on
  (key, salt ∈ [0, n)), spreading one hot key over n reducers; phase 2
  merges the n partials.  Works for any algebraic aggregate (sum/count/
  min/max/collect via merge fn).
* ``salted_broadcast_left`` — replicate-and-salt for a join where the
  *build* side is small but the probe side has hot keys and the join must
  shuffle (build too big to broadcast outright): explode the build side n×
  with a salt column, salt the probe side randomly, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    phase1: list[Column],
    phase2: list[Column],
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``phase1``: aggregate expressions over the raw rows (aliased);
    ``phase2``: merge expressions over phase-1 partial columns (aliased the
    same), e.g.::

        salted_aggregate(df, ["k"],
                         [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
                         [F.sum("n").alias("n"), F.sum("s").alias("s")])

    One extra (cheap) shuffle of ``|keys| × salt_buckets`` partial rows buys
    even reducer load however hot a key is.
    """
    salted = df.withColumn(
        SALT_COL, (F.rand(seed) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)


def salted_broadcast_left(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Replicate-and-salt equi-join on ``key`` (probe ⟕ build).

    The build side is exploded ``salt_buckets``× (acceptable when it is
    dimension-sized); each probe row picks one salt bucket at random.  A hot
    probe key then lands on ``salt_buckets`` different reducers instead of
    one.  Column sets are preserved (salt dropped on output).
    """
    build_rep = build.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    probe_s = probe.withColumn(
        SALT_COL, (F.rand(seed) * salt_buckets).cast("int")
    )
    return probe_s.join(build_rep, [key, SALT_COL], "left").drop(SALT_COL)
