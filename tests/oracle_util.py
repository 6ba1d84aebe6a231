"""Differential compare of Spark queries vs DuckDB oracle SQL — a local
mirror of the driver's CORRECTNESS check (row-count + column names + value
multiset, order-insensitive, columns sorted by name)."""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v: Any) -> Any:
    # numpy scalars / arrays come back from the pandas fetch path; unwrap
    # them to Python natives FIRST so int64 stays int (not float repr).
    if hasattr(v, "ndim"):  # numpy scalar or ndarray
        if getattr(v, "ndim", 0) == 0:
            v = v.item()
        else:
            return tuple(_norm(x) for x in v.tolist())
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            # pandas writes np.nan (not None) for NULLs in object columns
            # (e.g. DuckDB nullable BOOLEAN) while Spark's toPandas writes
            # None for the same NULL — collapse both to None, matching the
            # driver (green on fixer_chain where the sides differ exactly so).
            return None
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(spark_df, con, sql: str) -> dict[str, Any]:
    """Differential compare, DuckDB side fetched through pandas/Arrow.

    The external driver harness fetches oracle results via a pandas
    DataFrame, where DuckDB HUGEINT/DECIMAL columns (and NULL-bearing
    integer columns) silently degrade to float64 — `222400` hashes as
    `"222400.0"` and mismatches Spark's int.  Round 5 shipped 15 reds
    exactly because this mirror used `fetchall()` (lossless Python ints)
    and passed locally while the driver failed.  Fetching via `.df()`
    reproduces the driver's type view, so any oracle whose SQL emits a
    pandas-degrading type fails HERE first."""
    # BOTH sides must go through pandas: the driver fetches the Spark side
    # through pandas too, so a NULL-bearing BIGINT column degrades to
    # float64 symmetrically on both engines.  Round 6 fetched Spark via
    # lossless .collect() and created 4 false reds (108 vs '108.0',
    # None vs 'NaN') on queries the driver certifies green.
    spdf = spark_df.toPandas()
    s_raw_cols = list(spdf.columns)
    s_raw_rows = list(spdf.itertuples(index=False, name=None))
    s_order = sorted(range(len(s_raw_cols)), key=lambda i: s_raw_cols[i])
    s_cols = [s_raw_cols[i] for i in s_order]
    s_rows = [tuple(_norm(row[i]) for i in s_order) for row in s_raw_rows]
    pdf = con.execute(sql).df()
    raw_cols = list(pdf.columns)
    raw_rows = list(pdf.itertuples(index=False, name=None))
    order = sorted(range(len(raw_cols)), key=lambda i: raw_cols[i])
    d_cols = [raw_cols[i] for i in order]
    d_rows = [tuple(_norm(row[i]) for i in order) for row in raw_rows]
    result = {
        "cols_match": s_cols == d_cols,
        "count_match": len(s_rows) == len(d_rows),
        "spark_count": len(s_rows),
        "duck_count": len(d_rows),
        "values_match": sorted(map(repr, s_rows)) == sorted(map(repr, d_rows)),
        "spark_cols": s_cols,
        "duck_cols": d_cols,
    }
    if not result["values_match"] and result["count_match"]:
        s_set = sorted(map(repr, s_rows))
        d_set = sorted(map(repr, d_rows))
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
        result["sample_diffs"] = diffs
    return result
