"""Broadcaster fan-out tests (SURVEY P3-P5, §3.3) + JSON sink shape."""

from __future__ import annotations

import json
from datetime import datetime

from service_alerts_connector_spark.operators.feeds import (
    FeedConfig,
    all_feed_configs,
    feed_dataframe,
    generate_feeds,
)
from service_alerts_connector_spark.schemas import V0_COLS, V1_2_COLS
from service_alerts_connector_spark.sources.json_feed import (
    dataframe_to_json_records,
)

NOW = datetime(2024, 2, 14, 12, 0, 0)

GOLD_ROWS = [
    # expired long ago
    {"Id": 1, "planned": True, "expiry_date": datetime(2024, 1, 1), "status": "Closed", "tweet_text": "old"},
    # expires within the last 7 days window
    {"Id": 2, "planned": False, "expiry_date": datetime(2024, 2, 10), "status": "Open", "tweet_text": None},
    # current (expiry in the future)
    {"Id": 3, "planned": False, "expiry_date": datetime(2024, 2, 20), "status": "Open", "tweet_text": "live"},
    {"Id": 4, "planned": True, "expiry_date": datetime(2024, 3, 1), "status": "Open", "tweet_text": "planned"},
]
SCHEMA = "Id long, planned boolean, expiry_date timestamp, status string, tweet_text string"


def _gold(spark):
    return spark.createDataFrame(GOLD_ROWS, SCHEMA)


def test_config_matrix_is_24():
    cfgs = all_feed_configs()
    assert len(cfgs) == 24
    assert len({c.path for c in cfgs}) == 24


def test_current_window(spark):
    df = feed_dataframe(_gold(spark), FeedConfig("current", False, "v0"), NOW)
    assert [r["Id"] for r in df.collect()] == [3]


def test_7days_window(spark):
    df = feed_dataframe(_gold(spark), FeedConfig("7days", False, "v0"), NOW)
    assert sorted(r["Id"] for r in df.collect()) == [2, 3]


def test_all_window_includes_everything(spark):
    df = feed_dataframe(_gold(spark), FeedConfig("all", True, "v0"), NOW)
    assert sorted(r["Id"] for r in df.collect()) == [1, 4]


def test_version_projection(spark):
    gold = _gold(spark)
    v0 = feed_dataframe(gold, FeedConfig("current", False, "v0"), NOW)
    v12 = feed_dataframe(gold, FeedConfig("current", False, "v1.2"), NOW)
    assert set(v0.columns) <= set(V0_COLS)
    assert "tweet_text" not in v0.columns
    assert "tweet_text" in v12.columns
    assert set(v12.columns) <= set(V1_2_COLS)


def test_generate_feeds_yields_all(spark):
    feeds = list(generate_feeds(_gold(spark), NOW))
    assert len(feeds) == 24


def test_api_sql_views(spark):
    from service_alerts_connector_spark.plans.serving import (
        register_api_views,
    )

    gold = _gold(spark)
    names = register_api_views(spark, gold)
    assert names == [
        "service_alerts_v0",
        "service_alerts_v1",
        "service_alerts_v1_1",
        "service_alerts_v1_2",
    ]
    out = spark.sql(
        "SELECT Id FROM service_alerts_v1_2 WHERE NOT planned ORDER BY Id"
    ).collect()
    assert [r["Id"] for r in out] == [2, 3]
    # v0 must not expose enrichment columns
    assert "tweet_text" not in spark.table("service_alerts_v0").columns


def test_json_records_shape(spark):
    df = feed_dataframe(_gold(spark), FeedConfig("current", False, "v1.2"), NOW)
    payload = json.loads(dataframe_to_json_records(df))
    assert isinstance(payload, list) and len(payload) == 1
    rec = payload[0]
    assert rec["Id"] == 3
    assert rec["expiry_date"].startswith("2024-02-20T00:00:00")
    # nulls are stripped, not serialized
    assert all(v is not None for v in rec.values())
