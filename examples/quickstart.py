"""Quickstart: the full service-alerts pipeline in ~40 lines.

Run:  python examples/quickstart.py
"""

import json
import pathlib
import sys
import tempfile
from datetime import datetime, timezone

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from service_alerts_connector_spark.plans.emailer import EmailConfig
from service_alerts_connector_spark.plans.pipeline import (
    PipelineSinks,
    run_micro_batch,
)
from service_alerts_connector_spark.session import get_spark
from service_alerts_connector_spark.sources.sharepoint import read_sharepoint

PAGE = [
    {
        "Id": 1,
        "Title1": "Water Off",
        "Service_x0020_Area12": "Water & Sanitation",
        "Description12": "Burst main on Kloof Street",
        "Planned_x0020_Unplanned": "Unplanned",
        "Area": "GARDENS",
        "Areatype": "Official Planning Suburb",
        "Publish_x0020_Date": "2024-02-13T22:00:00Z",
        "Effective_x0020_Date": "2024-02-13T22:00:00Z",
        "Alert_x0020_Expiry_x0020_Date": "2024-02-15T22:00:00Z",
        "Start_x0020_Time": "06:00",
        "Forecast_x0020_End_x0020_Time": "18:00",
        "Reference_x0020_No": "9116963417",
        "Status12": "Open",
    },
]


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    out = pathlib.Path(tempfile.mkdtemp(prefix="quickstart_"))

    bronze = read_sharepoint(spark, lambda: PAGE)  # stub fetcher
    gold = run_micro_batch(
        bronze,
        state_root=str(out / "lake"),
        sinks=PipelineSinks(
            feeds_root=str(out / "feeds"),
            recon_root=str(out / "recon"),
            notifier=lambda ids: print("notified new alerts:", ids),
            email_transport=lambda to, subj, html: print("email:", to, subj),
            email_configs=[
                EmailConfig(
                    name="water-watch",
                    recipients=("ops@example.org",),
                    service_area="Water & Sanitation",
                )
            ],
        ),
        now=datetime.now(timezone.utc).replace(tzinfo=None),
    )
    gold.select("Id", "title", "status", "tweet_text", "InputChecksum").show(
        truncate=50
    )
    feed = out / "feeds" / "v1.2" / "service-alerts" / "all" / "unplanned.json"
    print("one of 24 feeds:", json.loads(feed.read_text()))


if __name__ == "__main__":
    main()
