"""Temporal joins — as-of (point-in-time) join and bucketed range join.

Beyond the reference's operator surface (its joins are all equi/fuzzy —
SURVEY §2.3), but essential event-pipeline operators: "latest state at or
before each observation" and "points falling inside intervals".  Both are
notorious scale traps when written naively (a theta join becomes a
BroadcastNestedLoopJoin or CartesianProduct); the implementations here are
shuffle-bounded compositions of built-in operators only.

As-of join — union + running window, ONE shuffle:
    tag right rows 0 and left rows 1, union on the join key, then a
    ``last(payload, ignorenulls)`` over rows-unbounded-preceding ordered by
    ``(ts, tag, tiebreak)``.  Every left row reads the most recent right row
    at-or-before its timestamp without ever materializing left×right pairs.
    Spark evaluates the unbounded-preceding/current-row frame incrementally
    (running state, O(n) per partition).  At 100 TB both inputs shuffle once
    on the key — the same cost as a plain equi-join — versus the naive
    ``left.ts >= right.ts`` theta join, which has no equi clause and plans a
    nested loop.  Skewed hub keys: pre-filter or range-split via
    ``operators/skew`` (the window is per-key sequential by nature).

Bucketed range join — interval binning:
    intervals explode to the fixed-width time buckets they cover; each
    point maps to exactly ONE bucket; an equi-join on the bucket plus the
    exact predicate replaces the nested loop.  A point in an interval is
    found in precisely its own bucket, so no dedup pass is needed.  Bucket
    width trades replication (long intervals → many buckets) against bucket
    fan-in; choose it near the median interval length.  At 100 TB this is
    two hash shuffles on a well-distributed integer key — AQE's skew-join
    split handles a hot bucket (e.g. everything in one hour).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    right_tiebreak: str,
    right_on: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join: for each left row, attach the payload
    of the right row with the greatest ``(right_ts, right_tiebreak)`` among
    rows sharing the key and ``right_ts <= left_ts`` (left rows with no
    match keep null payloads — left-join semantics).

    ``right_tiebreak`` is mandatory (repo determinism rule: every "latest"
    carries a key tiebreak) and must be unique per ``(key, right_ts)``.
    Payload columns are renamed ``<name><suffix>`` when they collide with a
    left column.  The payload rides in ONE struct so the matched row is
    taken atomically — per-column ``last(ignorenulls)`` would mix rows when
    a payload value is legitimately null.
    """
    right_on = right_on or on
    pay = F.struct(
        *[F.col(c) for c in payload_cols], F.col(right_tiebreak).alias("_tb")
    )
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_tiebreak).alias("_tbo"),
        pay.alias("_pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_tiebreak].dataType).alias("_tbo"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # Right rows sort BEFORE left rows at an equal timestamp (inclusive <=);
    # among tied right rows the larger tiebreak sorts later, so ``last``
    # picks max (ts, tiebreak).  Frame is row-based, so tied sort keys are
    # harmless: every preceding right row is in-frame either way.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc_nulls_first("_tbo"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_pay", ignorenulls=True).over(w)
    taken = set(left.columns)
    out_names = [c if c not in taken else f"{c}{suffix}" for c in payload_cols]
    return (
        r.unionByName(l)
        .withColumn("_m", matched)
        .where(F.col("_side") == 1)
        .select(
            *[F.col(f"_l_{c}").alias(c) for c in left.columns],
            *[
                F.col("_m").getField(c).alias(o)
                for c, o in zip(payload_cols, out_names)
            ],
        )
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start_col <= point_ts < end_col`` (half-open), via fixed-width time
    buckets instead of a nested-loop theta join.

    Each interval is exploded to the epoch-second buckets it touches; each
    point lives in exactly one bucket, so every qualifying (point, interval)
    pair is produced exactly once — no dedup.  Column sets must be disjoint
    apart from the timestamp columns (standard join hygiene; rename first).
    """
    sec = lambda c: F.col(c).cast("long")  # noqa: E731 — floor to seconds
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(sec(start_col) / bucket_s),
                F.floor(sec(end_col) / bucket_s),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.floor(sec(point_ts) / bucket_s))
    return (
        pt.join(iv, on="_bucket", how="inner")
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bucket")
    )


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    day_col: str,
    cents_col: str,
) -> DataFrame:
    """Per-key daily resample with last-observation-carried-forward — the
    time-series densification every metrics/feature pipeline needs before
    windowed models (missing days must exist as rows, not as absences).

    Each key gets one calendar row per day between ITS OWN first and last
    observation (``sequence`` + explode — rows per key bounded by the key's
    span in days, never a corpus-global calendar), left-joined to the
    per-(key, day) aggregate; gaps carry the last observed value forward
    (``last(..., ignorenulls)`` over the keyed day order) and are flagged.

    Shuffle census: one groupBy for per-key bounds, one for per-(key, day)
    aggregates, one keyed window for the LOCF — all on the key; the
    calendar explode is narrow.

    Output: key, ``day`` (date), ``n_events`` (0 on gap days),
    ``cents_locf``, ``is_observed``.
    """
    per_day = df.groupBy(key_col, day_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents_col).cast("long").alias("cents"),
    )
    bounds = per_day.groupBy(key_col).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    calendar = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias(day_col),
    )
    w = Window.partitionBy(key_col).orderBy(day_col)
    joined = calendar.join(per_day, [key_col, day_col], "left")
    return joined.select(
        key_col,
        F.col(day_col).alias("day"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.last("cents", ignorenulls=True).over(w).alias("cents_locf"),
        F.col("n_events").isNotNull().alias("is_observed"),
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Union overlapping-or-touching intervals per key into maximal islands
    (interval coalescing / "gaps and islands") — the maintenance-window /
    shift-merging / coverage-union primitive.

    Unlike gap-based sessionization (``operators/sessions.py``), intervals
    here carry VARIABLE lengths: an early long interval can swallow several
    later short ones, so "previous row's end" is not enough — the island
    break test needs the RUNNING MAX of all previous ends.  One keyed
    window, evaluated incrementally:

        new_island = start > max(end) OVER (key ORDER BY start, tiebreak
                                            ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)
        island_id  = running sum of new_island flags

    then one groupBy (key, island_id) for the island extents.  Intervals
    that merely TOUCH (next.start == prev.end) merge — the break is strict
    ``>``.

    Scale shape: one shuffle on the key for the window, and the island agg
    reuses that partitioning (same leading key) — the plan has a single
    exchange.  Per-key work is O(n log n) sort + O(n) running state; no
    self-join, no interval×interval pair blow-up.  Skewed hub keys split
    via ``operators/skew`` range-salting if a single key's intervals exceed
    one executor's sort budget.

    Columns ``start_col``/``end_col`` must be totally ordered numerics
    (epoch seconds); ``tiebreak_col`` makes the window order deterministic
    for equal starts.

    Output: key, ``island_id`` (1-based per key), ``island_start``,
    ``island_end``, ``n_intervals``.
    """
    w_order = [F.asc(start_col), F.asc(tiebreak_col)]
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(*w_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(*w_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn(
        "_new_island",
        F.when(
            F.col(start_col)
            > F.coalesce(F.max(end_col).over(w_prev), F.lit(-(1 << 62))),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island_id", F.sum("_new_island").over(w_run))
    return (
        flagged.groupBy(key_col, "island_id")
        .agg(
            F.min(start_col).cast("long").alias("island_start"),
            F.max(end_col).cast("long").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
    )


def gap_fill_interp(
    df: DataFrame,
    key_col: str,
    day_col: str,
    cents_col: str,
) -> DataFrame:
    """Per-key daily resample with LINEAR INTERPOLATION across gaps — the
    other half of ``gap_fill_locf``: where LOCF carries the last value
    flat, interpolation draws the straight line between the surrounding
    observations (the right densification for level-like series feeding
    windowed models).

    Same calendar skeleton as LOCF (per-key [first, last] span via
    sequence-explode, left join to per-day aggregates); each gap day then
    reads its bracketing observations from two keyed windows (running
    ``last`` before, running ``first`` after — same partitioning and sort
    order, so Spark computes both over ONE exchange+sort) and fills

        interp = (prev·(d₁−d) + next·(d−d₀)) div (d₁−d₀)

    in exact integer arithmetic: cents are non-negative, so the floored
    integer division is identical in Spark (truncate) and DuckDB (floor)
    — no float enters the fill.  Interior gaps always have both brackets
    (the calendar spans observation to observation).

    Output: key, ``day``, ``n_events``, ``cents_filled``,
    ``is_observed``.
    """
    per_day = df.groupBy(key_col, day_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents_col).cast("long").alias("cents"),
    )
    bounds = per_day.groupBy(key_col).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    calendar = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias(day_col),
    )
    joined = calendar.join(per_day, [key_col, day_col], "left")
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("cents").isNotNull(), F.col(day_col))
    staged = joined.select(
        key_col,
        F.col(day_col).alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("cents"),
        F.last("cents", ignorenulls=True).over(w_prev).alias("_pc"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("_pd"),
        F.first("cents", ignorenulls=True).over(w_next).alias("_nc"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("_nd"),
    )
    den = F.datediff("_nd", "_pd")
    num = F.col("_pc") * F.datediff("_nd", "day") + F.col("_nc") * F.datediff(
        "day", "_pd"
    )
    return staged.select(
        key_col,
        "day",
        "n_events",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(
            (num - (num % den)) / den
        )
        .cast("long")
        .alias("cents_filled"),
        F.col("cents").isNotNull().alias("is_observed"),
    )
