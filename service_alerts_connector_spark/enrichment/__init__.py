"""Side-effecting enrichment operators (SURVEY §2.9 X1-X5) — the reference's
irreducibly non-relational stages, packaged as Arrow-batched ``mapInPandas``
stages with injectable external clients (deterministic stubs for tests,
HTTP clients in production), bounded retries, and per-row error columns
instead of process aborts.
"""
