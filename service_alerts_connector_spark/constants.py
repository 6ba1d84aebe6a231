"""Engine-wide constants.

Mirrors the dataset/column naming contract of the reference
(src/cct_connector/__init__.py:6-22) without copying its code: these are the
public names a user of the reference would expect to keep working.
"""

# Key column of the service-alert entity (reference __init__.py:22).  The
# reference hides this in the pandas index; Spark has no index, so it is an
# explicit column everywhere.
ID_COL = "Id"

# Incremental-cache checksum column (reference ServiceAlertBase.py:19).
CHECKSUM_COL = "InputChecksum"

# Salt folded into every checksum; bumping it invalidates all cached rows
# (reference __init__.py:16, ServiceAlertBase.py:26-27 — semantic ST8).
AUGMENTER_SALT = "20240928"

# Logical dataset names (bronze / silver / gold / email-log), matching the
# reference's Minio object names (reference __init__.py:6-9).
RAW_DATASET = "service-alerts.service-alerts"
SANITISED_DATASET = "service-alerts.sanitised-service-alerts"
AUGMENTED_DATASET = "service-alerts.augmented-service-alerts"
EMAILS_DATASET = "service-alerts.service-alerts-emails"

# Admission-control caps (reference ServiceAlertBase.py:98 `data_size_limit`,
# ServiceAlertAugmenter.py:44-46).
DATA_SIZE_LIMIT = 20
DRAFT_LIMIT = 10
MAX_POST_LENGTH = 280
PROMPT_LENGTH_LIMIT = 8192

# Timezone of the alert domain (reference ServiceAlertFixer.py:20 — SAST).
ALERT_TZ = "Africa/Johannesburg"

# Skip-list of alert Ids whose checksums are force-blanked (reference
# ServiceAlertBase.py:15-18 — semantic P9).
CHECKSUM_SKIP_SET: frozenset[int] = frozenset()
