"""Packaged prompt templates (X1/X2 few-shot chat prompts).

YAML-of-chat-messages rendered through Jinja2 — the same *structure* as the
reference's prompt resources (summary_prompt_template.yaml.jinja2:1-101,
location_prompt_template.yaml.jinja2:1-145, shorten_prompt_template
.yaml.jinja2): a system preamble, N few-shot user/assistant example pairs,
and a final user slot carrying the live record as JSON.  Content is
original.  Loaded via :func:`service_alerts_connector_spark.enrichment.llm.
load_prompt_template` (driver-side read; the rendered-per-record closure
ships only the template text to executors).
"""
