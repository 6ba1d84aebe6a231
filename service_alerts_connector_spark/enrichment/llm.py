"""LLM enrichment stages (X1 post drafting, X2 location extraction).

Re-expresses the reference's per-row HTTP loops
(ServiceAlertAugmenter.py:226-409, 572-621) as ``mapInPandas`` operators:

* injectable client (tests inject :class:`StubLLMClient`; production injects
  an OpenAI-compatible HTTP client with the same protocol);
* retry ×``max_retries`` with temperature bump per attempt, then endpoint
  fallback — mirroring the reference's policy (Augmenter:337-409);
* shorten-reprompt when a draft exceeds ``max_post_length`` (:217-223);
* prompt-token budgeting with a hard bail (:344-351) — estimated as
  ``(len/4)*1.2 + 256`` like the reference;
* failures land in an ``llm_error`` column; the engine never ``sys.exit``s
  from an executor (SURVEY §7(e)).

Concurrency/rate control: cap the number of partitions feeding this stage
(``limit()`` upstream + ``coalesce(n)``) — global request rate is then
bounded by partitions × per-row latency, the distributed analog of the
reference's serial loop.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Callable, Iterator, Protocol

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from service_alerts_connector_spark.constants import (
    DRAFT_LIMIT,
    ID_COL,
    MAX_POST_LENGTH,
    PROMPT_LENGTH_LIMIT,
)


class LLMClient(Protocol):
    """Minimal chat-completion protocol; implementations must be
    picklable (constructed per-partition or serialized into the closure)."""

    def complete(self, prompt: str, temperature: float) -> str: ...


@dataclass(frozen=True)
class StubLLMClient:
    """Deterministic test double: content-addressed pseudo-drafts.

    ``mode='draft'`` returns a short summary-like string derived from the
    prompt hash; ``mode='locations'`` returns a JSON array-of-arrays of
    pseudo location strings — shaped like the reference's few-shot examples
    (summary_prompt_template.yaml.jinja2, location_prompt_template.yaml.jinja2).
    """

    mode: str = "draft"
    fail_every: int = 0  # every Nth call raises (retry-path testing)

    def complete(self, prompt: str, temperature: float) -> str:
        h = hashlib.md5(prompt.encode()).hexdigest()
        if self.fail_every and int(h, 16) % self.fail_every == 0 and temperature < 0.5:
            raise RuntimeError("stub transient failure")
        if self.mode == "locations":
            return json.dumps([[f"Street {h[:6]}", f"Suburb {h[6:12]}"]])
        return f"Service alert update {h[:12]}: crews are attending."


def estimate_tokens(prompt: str) -> int:
    """Reference token estimate: ``(len/4)*1.2 + 256`` (Augmenter:344-351)."""
    return int(len(prompt) / 4 * 1.2) + 256


# ---------------------------------------------------------------------------
# Packaged few-shot prompt templates (same structure as the reference's
# summary/location/shorten yaml.jinja2 resources; original content)
# ---------------------------------------------------------------------------
def load_prompt_template(name: str) -> str:
    """Read a packaged template's text (driver-side; builders close over
    the string so executors never need the data file)."""
    from importlib import resources

    return (
        resources.files("service_alerts_connector_spark.resources")
        .joinpath(name)
        .read_text()
    )


def render_chat_messages(
    template_text: str, **params: object
) -> list[dict]:
    """Render a YAML/Jinja2 chat template → [{role, content}, ...].

    Structure contract (matches the reference's prompt resources,
    summary_prompt_template.yaml.jinja2:1-101): a system preamble, N
    few-shot user/assistant pairs, and a final user slot carrying the live
    record (``record_json``) or post (``post_text``)."""
    import jinja2
    import yaml

    rendered = jinja2.Template(template_text).render(**params)
    messages = yaml.safe_load(rendered)
    if not isinstance(messages, list) or not all(
        isinstance(m, dict) and {"role", "content"} <= set(m) for m in messages
    ):
        raise ValueError("prompt template must render to a chat-message list")
    return messages


def flatten_messages(messages: list[dict]) -> str:
    """Serialize chat messages for the flat-prompt ``LLMClient`` protocol.
    An OpenAI-compatible client would take the message list directly; the
    flattened transcript keeps the few-shot structure visible to both."""
    return "\n\n".join(
        f"[{m['role']}]\n{str(m['content']).rstrip()}" for m in messages
    )


def _record_json(rec: dict) -> str:
    return json.dumps(
        {k: rec[k] for k in sorted(rec) if k != ID_COL},
        default=str,
        ensure_ascii=False,
    )


def summary_prompt_builder(
    max_post_length: int = MAX_POST_LENGTH,
) -> Callable[[dict], str]:
    """X1 prompt builder from the packaged summary template."""
    text = load_prompt_template("summary_prompt.yaml.jinja2")

    def build(rec: dict) -> str:
        return flatten_messages(
            render_chat_messages(
                text,
                max_post_length=max_post_length,
                record_json=_record_json(rec),
            )
        )

    return build


def location_prompt_builder() -> Callable[[dict], str]:
    """X2 prompt builder from the packaged location template."""
    text = load_prompt_template("location_prompt.yaml.jinja2")

    def build(rec: dict) -> str:
        return flatten_messages(
            render_chat_messages(text, record_json=_record_json(rec))
        )

    return build


def shorten_prompt_builder(
    max_post_length: int = MAX_POST_LENGTH,
) -> Callable[[str], str]:
    """Shorten-reprompt builder from the packaged shorten template."""
    text = load_prompt_template("shorten_prompt.yaml.jinja2")

    def build(post_text: str) -> str:
        return flatten_messages(
            render_chat_messages(
                text, max_post_length=max_post_length, post_text=post_text
            )
        )

    return build


@dataclass(frozen=True)
class RetryPolicy:
    max_retries: int = 3
    base_temperature: float = 0.2
    temperature_bump: float = 0.15


def _call_with_retry(
    clients: list[LLMClient], prompt: str, policy: RetryPolicy
) -> tuple[str | None, str | None]:
    """Try each client in order (primary → fallback), with temperature-bumped
    retries per client.  Returns (text, error)."""
    last_err: str | None = None
    for client in clients:
        for attempt in range(policy.max_retries):
            try:
                t = policy.base_temperature + attempt * policy.temperature_bump
                text = client.complete(prompt, temperature=t)
                if text and len(text.strip()) > 1:  # one-char-response guard
                    return text, None
                last_err = "degenerate response"
            except Exception as e:  # noqa: BLE001 — error column, not abort
                last_err = f"{type(e).__name__}: {e}"
    return None, last_err


def draft_posts(
    df: DataFrame,
    clients: list[LLMClient],
    prompt_builder: Callable[[dict], str],
    out_col: str = "tweet_text",
    max_post_length: int = MAX_POST_LENGTH,
    policy: RetryPolicy = RetryPolicy(),
    limit: int = DRAFT_LIMIT,
    max_partitions: int = 4,
    shorten_builder: Callable[[str], str] | None = None,
) -> DataFrame:
    """X1 — draft a social-media post per row.

    ``df`` should already be capped upstream (ST5/DRAFT_LIMIT); this operator
    re-caps defensively and coalesces to ``max_partitions`` so total external
    concurrency is bounded.  Returns (Id, out_col, llm_error) for join-back —
    the reference's point-writebacks (J9) become an enrichment join.

    Over-length drafts re-prompt through ``shorten_builder`` (default: the
    packaged few-shot shorten template, Augmenter:217-223 semantics).
    """
    if shorten_builder is None:
        shorten_builder = shorten_prompt_builder(max_post_length)
    # Deterministic admission cap: the reference drafts for the most
    # RECENT alerts (positional tail of its frame); a bare limit()
    # admits an arbitrary partition-race subset, so make the recency
    # explicit — largest Id wins, planning TakeOrderedAndProject
    # (per-partition partial top-k, no global sort).
    work = (
        df.orderBy(F.col(ID_COL).desc())
        .limit(limit)
        .coalesce(max_partitions)
    )
    cols = work.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_text, out_err = [], [], []
            for _, row in pdf.iterrows():
                rec = {
                    c: row[c]
                    for c in cols
                    if row[c] is not None and not pd.isna(row[c])
                }
                prompt = prompt_builder(rec)
                if estimate_tokens(prompt) > PROMPT_LENGTH_LIMIT:
                    out_ids.append(row[ID_COL])
                    out_text.append(None)
                    out_err.append("prompt too long")
                    continue
                text, err = _call_with_retry(clients, prompt, policy)
                if text and len(text) > max_post_length:
                    # shorten-reprompt (Augmenter:217-223)
                    text, err = _call_with_retry(
                        clients, shorten_builder(text), policy
                    )
                    if text and len(text) > max_post_length:
                        text, err = text[:max_post_length], "truncated"
                out_ids.append(row[ID_COL])
                out_text.append(text)
                out_err.append(err)
            yield pd.DataFrame(
                {
                    ID_COL: pd.Series(out_ids, dtype="int64"),
                    out_col: out_text,
                    "llm_error": out_err,
                }
            )

    return work.mapInPandas(
        run, f"{ID_COL} long, {out_col} string, llm_error string"
    )


def extract_locations(
    df: DataFrame,
    clients: list[LLMClient],
    prompt_builder: Callable[[dict], str],
    out_col: str = "suggested_locations",
    policy: RetryPolicy = RetryPolicy(),
    max_partitions: int = 4,
) -> DataFrame:
    """X2 — extract nested location suggestions (array<array<string>>).

    JSON-shape repair mirrors the reference (Augmenter:226-319): unwrap
    over-nested arrays, wrap flat arrays, reject non-string leaves;
    malformed responses retry via the normal policy, then land in the error
    column.
    """
    work = df.coalesce(max_partitions)
    cols = work.columns

    def repair(text: str) -> list[list[str]] | None:
        try:
            obj = json.loads(text)
        except json.JSONDecodeError:
            return None
        # unwrap [[[...]]] → [[...]]
        while (
            isinstance(obj, list)
            and len(obj) == 1
            and isinstance(obj[0], list)
            and obj[0]
            and isinstance(obj[0][0], list)
        ):
            obj = obj[0]
        # wrap ["a","b"] → [["a","b"]]
        if isinstance(obj, list) and obj and all(
            isinstance(x, str) for x in obj
        ):
            obj = [obj]
        if not isinstance(obj, list) or not all(
            isinstance(g, list) and all(isinstance(x, str) for x in g)
            for g in obj
        ):
            return None
        return obj

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_locs, out_err = [], [], []
            for _, row in pdf.iterrows():
                rec = {
                    c: row[c]
                    for c in cols
                    if row[c] is not None and not pd.isna(row[c])
                }
                text, err = _call_with_retry(
                    clients, prompt_builder(rec), policy
                )
                locs = repair(text) if text else None
                if text and locs is None and err is None:
                    err = "malformed location JSON"
                out_ids.append(row[ID_COL])
                out_locs.append(locs)
                out_err.append(err)
            yield pd.DataFrame(
                {
                    ID_COL: pd.Series(out_ids, dtype="int64"),
                    out_col: out_locs,
                    "llm_error": out_err,
                }
            )

    return work.mapInPandas(
        run, f"{ID_COL} long, {out_col} array<array<string>>, llm_error string"
    )
