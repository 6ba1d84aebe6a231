"""LLM enrichment + geocode waterfall tests (X1-X3 with stub clients)."""

from __future__ import annotations

import json

from service_alerts_connector_spark.enrichment.geocode import (
    StubGeocoder,
    apply_memo,
    geocode_tail,
)
from service_alerts_connector_spark.enrichment.llm import (
    StubLLMClient,
    draft_posts,
    estimate_tokens,
    extract_locations,
)

ALERTS = [
    (1, "Water Off", "Burst pipe on Main Rd", 0),
    (2, "Power Out", "Substation fault", 1),
    (3, "Roadworks", "Resurfacing night work", 2),
]
SCHEMA = "Id long, title string, description string, _ingest_seq long"


# a lambda (not a module-level def) so cloudpickle serializes it by value —
# executors can't import the tests package
_prompt = lambda rec: json.dumps(rec, sort_keys=True, default=str)  # noqa: E731


def test_draft_posts_deterministic_and_joined(spark):
    df = spark.createDataFrame(ALERTS, SCHEMA)
    out1 = {
        r["Id"]: r["tweet_text"]
        for r in draft_posts(df, [StubLLMClient("draft")], _prompt).collect()
    }
    out2 = {
        r["Id"]: r["tweet_text"]
        for r in draft_posts(df, [StubLLMClient("draft")], _prompt).collect()
    }
    assert out1 == out2  # deterministic stub
    assert set(out1) == {1, 2, 3}
    assert all(t and len(t) <= 280 for t in out1.values())


def test_draft_posts_respects_limit(spark):
    df = spark.createDataFrame(ALERTS, SCHEMA)
    out = draft_posts(df, [StubLLMClient("draft")], _prompt, limit=2).collect()
    assert len(out) == 2


def test_draft_posts_retry_then_fallback(spark):
    df = spark.createDataFrame(ALERTS, SCHEMA)
    flaky = StubLLMClient("draft", fail_every=1)  # always fails at low temp
    out = {
        r["Id"]: (r["tweet_text"], r["llm_error"])
        for r in draft_posts(df, [flaky], _prompt).collect()
    }
    # temperature bump recovers (fail_every only fires at temperature < 0.5)
    assert all(t is not None for t, _ in out.values())


def test_prompt_budget_bail(spark):
    df = spark.createDataFrame(
        [(1, "x" * 40000, "y", 0)], SCHEMA
    )
    out = draft_posts(df, [StubLLMClient("draft")], _prompt).collect()[0]
    assert out["tweet_text"] is None
    assert out["llm_error"] == "prompt too long"
    assert estimate_tokens("x" * 40000) > 8192


def test_extract_locations_shape(spark):
    df = spark.createDataFrame(ALERTS, SCHEMA)
    out = {
        r["Id"]: r["suggested_locations"]
        for r in extract_locations(
            df, [StubLLMClient("locations")], _prompt
        ).collect()
    }
    for locs in out.values():
        assert isinstance(locs, list) and isinstance(locs[0], list)
        assert all(isinstance(x, str) for g in locs for x in g)


def test_geocode_tail_and_memo(spark):
    df = spark.createDataFrame(
        [(1, "Main Road Observatory"), (2, ""), (3, "Kloof St Gardens")],
        "Id long, location string",
    )
    out = {
        r["Id"]: (r["geocoded_wkt"], r["geocode_error"])
        for r in geocode_tail(
            df, StubGeocoder(), bounding_wkt_col=None
        ).collect()
    }
    assert out[2] == (None, "empty query")
    assert out[1][0] is not None and out[1][0].startswith("POLYGON")

    memo = spark.createDataFrame(
        [("main road observatory", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")],
        "query string, geocoded_wkt string",
    )
    hits, misses = apply_memo(df, memo)
    assert [r["Id"] for r in hits.collect()] == [1]
    assert sorted(r["Id"] for r in misses.collect()) == [2, 3]
