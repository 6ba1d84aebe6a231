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
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(spark_df, con, sql: str) -> dict[str, Any]:
    s_cols = sorted(spark_df.columns)
    s_rows = [
        tuple(_norm(r[c]) for c in s_cols) for r in spark_df.collect()
    ]
    res = con.execute(sql)
    raw_cols = [d[0] for d in res.description]
    raw_rows = res.fetchall()
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
