"""Relational/dataflow operators — the engine's reusable building blocks.

Each module maps a family from SURVEY §2's operator inventory onto idiomatic
Spark plans (broadcast joins, window dedup, anti/semi-join incremental cache,
config-as-data fan-out) and is designed to hold at 1000-executor / 100 TB
scale: no driver-side loops over data, no row-at-a-time Python in hot paths.
"""
