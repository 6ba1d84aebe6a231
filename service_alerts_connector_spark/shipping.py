"""Self-shipping: make this package importable on executor Python workers.

mapInPandas/applyInPandas closures reference module-level functions, which
cloudpickle serializes *by module path* — so workers must be able to
``import service_alerts_connector_spark``.  When the engine owns the session
(session.py) PYTHONPATH propagation handles it; when an external harness
creates the session first (different cwd, no PYTHONPATH), the only reliable
channel is ``SparkContext.addPyFile``: it distributes a zip of the package
to every worker and prepends it to their sys.path, and it works on an
already-running session.

Idempotent per session; costs one ~50 KB zip upload the first time.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fname in files:
                    # package data (prompt templates) ships alongside code
                    if not fname.endswith((".py", ".yaml.jinja2")):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app_id)
