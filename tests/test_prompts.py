"""Packaged prompt-template tests: structure contract, rendering, and
stub-client goldens through the real draft/extract operators.

Structure parity with the reference's prompt resources
(summary_prompt_template.yaml.jinja2:1-101,
location_prompt_template.yaml.jinja2:16-132): system preamble + few-shot
user/assistant pairs + final user slot carrying the record JSON.  Content
is original.
"""

from __future__ import annotations

import json

import pytest

from service_alerts_connector_spark.enrichment.llm import (
    StubLLMClient,
    draft_posts,
    extract_locations,
    flatten_messages,
    load_prompt_template,
    location_prompt_builder,
    render_chat_messages,
    shorten_prompt_builder,
    summary_prompt_builder,
)

REC = {
    "Id": 7,
    "service_area": "Electricity",
    "title": "Cable fault",
    "area": "RIVERDALE",
    "location": "Acacia Ave",
    "request_number": "9001002003",
}


@pytest.mark.parametrize(
    "name", ["summary_prompt.yaml.jinja2", "location_prompt.yaml.jinja2",
             "shorten_prompt.yaml.jinja2"]
)
def test_template_structure_contract(name):
    msgs = render_chat_messages(
        load_prompt_template(name),
        max_post_length=280,
        record_json="{}",
        post_text="p",
    )
    # system preamble first, then alternating user/assistant few-shot
    # pairs, ending on the live user slot
    assert msgs[0]["role"] == "system"
    tail = [m["role"] for m in msgs[1:]]
    assert tail[-1] == "user"
    assert all(
        r == ("user" if i % 2 == 0 else "assistant")
        for i, r in enumerate(tail)
    )
    assert len(msgs) >= 4  # at least one few-shot example pair


def test_summary_builder_embeds_record_and_length():
    prompt = summary_prompt_builder(max_post_length=123)(REC)
    assert "123" in prompt  # max_post_length substitution
    assert '"request_number": "9001002003"' in prompt
    assert "[system]" in prompt and prompt.count("[user]") >= 3
    assert "Id" not in json.loads(
        prompt.rsplit("[user]\n", 1)[1]
    )  # live record slot excludes the join key


def test_location_builder_embeds_record():
    prompt = location_prompt_builder()(REC)
    last = prompt.rsplit("[user]\n", 1)[1]
    assert json.loads(last)["location"] == "Acacia Ave"


def test_shorten_builder_embeds_post():
    prompt = shorten_prompt_builder(max_post_length=99)("LONG POST " * 30)
    assert "99" in prompt and "LONG POST" in prompt


def test_render_rejects_non_chat_yaml():
    with pytest.raises(ValueError):
        render_chat_messages("just: a\nmapping: here")


def test_flatten_keeps_roles_visible():
    s = flatten_messages([{"role": "system", "content": "a"},
                          {"role": "user", "content": "b\n"}])
    assert s == "[system]\na\n\n[user]\nb"


def test_draft_posts_stub_golden(spark):
    """The stub client is content-addressed, so identical template +
    record → identical draft across runs (a golden without pinning the
    template text byte-for-byte)."""
    df = spark.createDataFrame(
        [(1, "Cable fault", "Electricity")],
        "Id long, title string, service_area string",
    )
    outs = [
        draft_posts(
            df, [StubLLMClient("draft")], summary_prompt_builder(), limit=5
        ).collect()[0]["tweet_text"]
        for _ in range(2)
    ]
    assert outs[0] == outs[1] and outs[0].startswith("Service alert update")


def test_extract_locations_stub_golden(spark):
    df = spark.createDataFrame(
        [(1, "RIVERDALE", "Acacia Ave")],
        "Id long, area string, location string",
    )
    rows = extract_locations(
        df, [StubLLMClient("locations")], location_prompt_builder()
    ).collect()
    sugg = rows[0]["suggested_locations"]
    assert sugg and all(isinstance(g, list) and g for g in sugg)
