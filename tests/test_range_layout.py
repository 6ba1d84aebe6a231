"""Range layout driven by computed statistics (`operators/layout.py
compute_equi_depth_bounds` + `write_range_partitioned`): correctness of
the deterministic assignment and the MEASURED zone-map skipping delta vs
an unsorted layout of the same rows — the before/after that justifies
paying the layout shuffle at 100 TB.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.layout import (
    compute_equi_depth_bounds,
    write_range_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"
K = 8


def _cents(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )


def _files_overlapping(path: str, lo: int, hi: int, col: str) -> tuple[int, int]:
    """(files whose [min,max] zone overlaps [lo,hi], total files) from
    parquet footer statistics — exactly what a zone-map/min-max reader
    consults before touching a file."""
    hit = tot = 0
    for f in glob.glob(f"{path}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        fmin = min(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        tot += 1
        if fmin <= hi and lo <= fmax:
            hit += 1
    return hit, tot


def test_range_layout_preserves_rows_and_bounds(spark, tmp_path):
    df = _cents(spark)
    bounds = compute_equi_depth_bounds(df, "cents", k=K)
    assert bounds == sorted(bounds) and len(bounds) == K

    path = str(tmp_path / "ranged")
    write_range_partitioned(df, path, "cents", bounds)

    back = spark.read.parquet(path)
    assert back.count() == df.count()
    assert (
        back.select(F.sum("cents")).first()[0]
        == df.select(F.sum("cents")).first()[0]
    )
    # every _range_id directory honors its bound interval
    prev = None
    for rid in range(1, K + 1):
        part = back.where(F.col("_range_id") == rid)
        if part.head(1):
            mx = part.agg(F.max("cents")).first()[0]
            mn = part.agg(F.min("cents")).first()[0]
            assert mx <= bounds[rid - 1]
            if prev is not None:
                assert mn > prev
        prev = bounds[rid - 1]


def test_range_layout_zone_map_skipping_delta(spark, tmp_path):
    """The measured point of the layout: a predicate covering one range
    touches a FRACTION of the ranged files but (near) all of the
    unsorted layout's files."""
    df = _cents(spark)
    bounds = compute_equi_depth_bounds(df, "cents", k=K)

    ranged = str(tmp_path / "ranged")
    write_range_partitioned(df, ranged, "cents", bounds)
    unsorted = str(tmp_path / "unsorted")
    df.repartition(K).write.parquet(unsorted)  # same file count, no order

    lo, hi = bounds[2] + 1, bounds[3]  # exactly range 4
    hit_r, tot_r = _files_overlapping(ranged, lo, hi, "cents")
    hit_u, tot_u = _files_overlapping(unsorted, lo, hi, "cents")
    assert tot_u == K
    # round-robin layout: every file spans the domain -> zero skipping
    assert hit_u == tot_u
    # range layout: the predicate's range owns its files exclusively
    assert hit_r <= 2
    assert hit_r < tot_r
    # and the skipped files provably contain no matching rows
    n_match = df.where(F.col("cents").between(lo, hi)).count()
    n_read = (
        spark.read.parquet(ranged)
        .where(F.col("cents").between(lo, hi))
        .count()
    )
    assert n_match == n_read > 0


def test_sorted_compaction_tightens_zone_maps(spark, tmp_path):
    """compact_dataset(sort_by=...) must turn a scattered store into one
    whose parquet footer zones are tight: a narrow cents range that
    overlaps EVERY file of the unsorted layout prunes to ≤2 of the
    compacted files — the OPTIMIZE/cluster-on-write maintenance win."""
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_dataset,
        list_versions,
        read_dataset,
        write_dataset,
    )

    df = _cents(spark)
    root = str(tmp_path)
    write_dataset(df.repartition(8), root, "offers")  # scattered layout
    base = tmp_path / "offers" / "versions"
    v0 = list_versions(root, "offers")[-1]
    lo, hi = 1_000_000, 1_400_000
    hit0, tot0 = _files_overlapping(str(base / v0), lo, hi, "cents")
    assert tot0 == 8 and hit0 == 8  # every unsorted file overlaps

    before = sorted(map(tuple, read_dataset(spark, root, "offers").collect()))
    compact_dataset(spark, root, "offers", target_files=8, sort_by=["cents"])
    v1 = list_versions(root, "offers")[-1]
    hit1, tot1 = _files_overlapping(str(base / v1), lo, hi, "cents")
    assert tot1 == 8 and hit1 <= 2, (hit1, tot1)
    after = sorted(map(tuple, read_dataset(spark, root, "offers").collect()))
    assert after == before  # clustering never changes a row
