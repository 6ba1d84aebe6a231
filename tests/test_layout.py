"""Z-order clustering key + writer."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.layout import (
    write_zordered,
    zorder_key,
)


def test_zorder_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(3, 1), (0, 0), (1, 0), (0, 1), (65535, 65535)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1   # x bit 0 -> position 0
    assert got[(0, 1)] == 2   # y bit 0 -> position 1
    assert got[(3, 1)] == 7   # 0b0111
    assert got[(65535, 65535)] == (1 << 32) - 1  # all 32 low bits set


def test_zorder_locality_beats_linear_sort(spark):
    # neighbours in (x, y) space are closer in z than in a concat key
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    z = {(r["x"], r["y"]): r["z"] for r in rows}
    # the 4 cells of any aligned 2x2 block occupy 4 CONSECUTIVE z values
    for bx, by in [(0, 0), (2, 4), (14, 14)]:
        block = sorted(z[(bx + dx, by + dy)] for dx in (0, 1) for dy in (0, 1))
        assert block == list(range(block[0], block[0] + 4))


def test_write_zordered_files_and_roundtrip(spark, tmp_path):
    import glob

    df = spark.createDataFrame(
        [(i, (i * 7) % 100, (i * 13) % 100) for i in range(2000)],
        "id long, x long, y long",
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, "x", "y", n_files=8)
    files = glob.glob(f"{path}/part-*.parquet")
    assert 1 <= len(files) <= 8
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert set(back.columns) == {"id", "x", "y"}  # key column dropped
