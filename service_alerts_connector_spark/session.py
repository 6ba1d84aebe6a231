"""SparkSession factory tuned for the engine.

Local-mode defaults match the test/bench harness (local[N], AQE on, Arrow on);
on a real cluster the same builder is used with master/memory supplied by the
environment.  Session timezone defaults to UTC so that parquet-naive
timestamps round-trip bit-identically against external oracles; the alert
pipeline converts to SAST explicitly where the reference does
(ServiceAlertFixer.py:20,33-39).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "service_alerts_connector_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    timezone: str = "UTC",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Scale notes (100 TB target):
      * AQE is on — runtime coalescing + skew-join splitting replace hand-tuned
        partition counts at scale.
      * ``shuffle_partitions`` defaults to local core count for local mode;
        on a cluster leave it unset and let AQE coalesce from a high initial
        value (set spark.sql.shuffle.partitions via cluster conf).
      * Arrow is enabled for every pandas interchange (enrichment operators,
        createDataFrame of staged pages).
    """
    # Python workers must import this package (mapInPandas closures reference
    # it); propagate the package root explicitly so sessions work no matter
    # how the driver was launched (pytest, spark-submit, plain python).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if master.startswith("local") else 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", timezone)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # fork Arrow-UDF workers from a daemon that has pandas/pyarrow/the
        # engine package already imported (copy-on-write) — kills the
        # ~1 s-per-fresh-worker import storm on Python-heavy stages
        # (see worker_preload.py; plain `python -m pyspark.daemon` without it)
        .config(
            "spark.python.daemon.module",
            "service_alerts_connector_spark.worker_preload",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
