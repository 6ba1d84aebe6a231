"""Full geocode-waterfall + config-join emailer fan-out tests."""

from __future__ import annotations

from service_alerts_connector_spark.enrichment.geocode import (
    StubGeocoder,
    full_geocode_waterfall,
)
from service_alerts_connector_spark.plans.emailer import pending_emails_joined


def test_full_geocode_waterfall_tiers(spark):
    alerts = spark.createDataFrame(
        [(1,), (2,), (3,)], "Id long"
    )
    suggestions = spark.createDataFrame(
        [
            (1, [["Observatory", "Main Road"]]),  # tier1 + tier2 hits
            (2, [["Unknown Place Xyz"]]),  # falls through to geocoder
            (3, [[""]]),  # blank → nothing
        ],
        "Id long, suggested_locations array<array<string>>",
    )
    suburbs = spark.createDataFrame(
        [("observatory", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")],
        "name string, WKT string",
    )
    streets = spark.createDataFrame(
        [
            ("Main Road", "LINESTRING (0.1 0.1, 0.9 0.9)"),
            ("Other St", "LINESTRING (5 5, 6 6)"),
        ],
        "street_name string, WKT string",
    )
    out = {
        r["Id"]: r["geospatial_footprint"]
        for r in full_geocode_waterfall(
            alerts, suggestions, suburbs, streets, StubGeocoder()
        ).collect()
    }
    # alert 1: suburb polygon + street-segment bbox union → MULTIPOLYGON
    assert out[1].startswith("MULTIPOLYGON")
    assert out[1].count("((") == 2  # two member polygons
    # alert 2: stub-geocoded bbox polygon
    assert out.get(2) is None or out[2].startswith("MULTIPOLYGON")
    assert 3 not in out  # blank suggestion resolved nothing


def test_pending_emails_joined_scales_by_data(spark):
    gold = spark.createDataFrame(
        [
            (1, "Water & Sanitation", "Leak", "Open", True,
             "Official Planning Suburb", ["57"]),
            (2, "Electricity", "Fault", "Open", False,
             "Official Planning Suburb", ["58"]),
            (3, "Water & Sanitation", "Citywide burst", "Open", True,
             "Citywide", ["57"]),
        ],
        "Id long, service_area string, title string, status string, "
        "planned boolean, area_type string, inferred_wards array<string>",
    )
    # 100 ward configs + 1 service-area config, as DATA rows
    cfg_rows = [
        (f"ward-{w}", [f"w{w}@example.org"], str(w), None, None)
        for w in range(1, 101)
    ] + [("water-planned", ["water@example.org"], None, "Water & Sanitation", True)]
    configs = spark.createDataFrame(
        cfg_rows,
        "config_name string, recipients array<string>, ward string, "
        "service_area string, planned boolean",
    )
    pending = pending_emails_joined(gold, configs)
    got = {(r["config_name"], r["Id"]) for r in pending.collect()}
    assert ("ward-57", 1) in got
    assert ("ward-58", 2) in got
    assert ("ward-57", 3) not in got  # Citywide excluded from ward streams
    assert ("water-planned", 1) in got and ("water-planned", 3) in got
    # plan stays two joins regardless of config count (no 101-way union)
    plan = pending._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastHashJoin") <= 2
    assert "Union" not in plan

    # sent-log anti-join idempotence on the join path
    sent = pending.select("email_key")
    assert pending_emails_joined(gold, configs, sent).count() == 0
