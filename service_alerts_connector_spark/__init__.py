"""service_alerts_connector_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of ``cityofcapetown/service-alerts-connector`` (the reference, a
pandas/geopandas batch ETL pipeline; see /root/reference).  The reference's
5-stage pipeline —

    fetch (Connector) -> fix (Fixer) -> augment (Augmenter)
                      -> {broadcast (Broadcaster), email (Emailer)} -> recon

— becomes a layered medallion design on Spark DataFrames:

* bronze  : raw SharePoint-shaped records        (sources/sharepoint.py)
* silver  : typed, cleaned alerts                (plans/fixer.py)
* gold    : enriched alerts                      (plans/augmenter.py)
* serving : versioned JSON feeds / emails / CDC  (plans/broadcaster.py,
                                                  plans/emailer.py, plans/recon.py)

All scalar transforms are Catalyst Column expressions (zero row-at-a-time
Python UDFs in the relational core); enrichment (LLM drafting, geocoding) is
`mapInPandas` with injectable clients; the incremental cache semantics
(reference ServiceAlertBase.py:123-166) are a reusable checksum anti/semi-join
library in operators/incremental.py.

Beyond the reference surface, the package ships large-scale training-data
pipeline operators (exact/MinHash-LSH/SimHash dedup, ANN similarity search,
text analysis, multimodal column plumbing) designed for 100 TB scale.
"""

from service_alerts_connector_spark.constants import (
    AUGMENTER_SALT,
    CHECKSUM_COL,
    ID_COL,
)

__all__ = ["AUGMENTER_SALT", "CHECKSUM_COL", "ID_COL"]
__version__ = "0.1.0"
