"""Python-worker daemon with the engine's heavy imports pre-loaded.

PySpark forks each Arrow-UDF worker from a long-lived daemon process
(``pyspark.daemon``); the fork is cheap, but the stock daemon imports only
the worker plumbing, so every FRESH worker pays the pandas + pyarrow +
numpy + engine-package import (~1 s of CPU) before its first batch.  With
32 task slots that is a ~32 CPU-second storm whenever the idle-worker pool
cannot serve a stage (session start, overlapping Python stages, stage
retries) — measured as uniform ~3.5× task inflation on the geo overlay
queries (SCALE.md "geo instability" note).

Importing the heavy modules HERE, before ``pyspark.daemon.manager()``
takes over, moves that cost into the daemon once per session; forked
workers inherit the warm modules via copy-on-write.  Activated by
``spark.python.daemon.module`` (public Spark conf, SPARK-4160) in
``session.get_spark``.

The daemon's stdin/stdout carry the worker protocol: nothing here may
print.  Imports are best-effort — a missing optional dep must not take
the daemon down (workers would re-import and fail with the real error in
context).
"""

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.parquet",
    "service_alerts_connector_spark",
    "service_alerts_connector_spark.geo.ops",
    "service_alerts_connector_spark.geo.wkt",
    "pyspark.sql.pandas.serializers",
    "pyspark.worker",
):
    try:
        __import__(_mod)
    except Exception:  # noqa: BLE001 - preload is advisory only
        pass

if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
