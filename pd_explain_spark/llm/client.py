"""LLM client + reasoning/recommendation/exploration operators
(SURVEY.md §2.7; reference llm_integrations/).

``Client`` mirrors the reference's behavior (llm_integrations/client.py:8-97):
an OpenAI-compatible chat call routed by provider name, and **no API key ->
warn and return None** — every downstream consumer must degrade gracefully.
This build has no network access and no LLM SDKs, so the HTTP call itself
is attempted only when a key is configured AND the relevant SDK imports;
otherwise the documented no-key path is taken. Downstream operators
(ExplanationReasoning, QueryRecommender, AutomatedDataExploration) each
have a deterministic offline fallback so the full loop runs and is
testable without a provider (documented divergence from the reference,
which simply returns None/skips).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any

PROVIDER_ENV = {
    "openai": "OPENAI_API_KEY",
    "together": "TOGETHER_API_KEY",
    "google": "GOOGLE_API_KEY",
}


@dataclass
class Client:
    provider: str = "openai"
    model: str = "gpt-4o-mini"
    api_key: str | None = None

    def __post_init__(self):
        if self.api_key is None:
            self.api_key = os.environ.get(PROVIDER_ENV.get(self.provider, ""), None)

    @property
    def available(self) -> bool:
        return bool(self.api_key)

    def chat(self, system: str, user: str) -> str | None:
        """One chat completion; None when no key / SDK (reference behavior:
        warn and return None, llm_integrations/client.py:60-97)."""
        if not self.available:
            import warnings

            warnings.warn(
                f"no API key for provider {self.provider!r}; returning None",
                stacklevel=2,
            )
            return None
        try:  # pragma: no cover - requires network + SDK
            import openai  # type: ignore

            client = openai.OpenAI(api_key=self.api_key)
            resp = client.chat.completions.create(
                model=self.model,
                messages=[
                    {"role": "system", "content": system},
                    {"role": "user", "content": user},
                ],
            )
            return resp.choices[0].message.content
        except Exception:
            return None


def extract_tagged(text: str, tag: str) -> str | None:
    """Pull <tag>...</tag> from an LLM response (reference extracts
    <reasoning> blocks, llm_integrations/explanation_reasoning.py)."""
    m = re.search(rf"<{tag}>(.*?)</{tag}>", text, re.DOTALL)
    return m.group(1).strip() if m else None


@dataclass
class ExplanationReasoning:
    """One LLM call per explanation: a domain-knowledge 'why'
    (reference llm_integrations/explanation_reasoning.py:11-262)."""

    client: Client = field(default_factory=Client)

    def reason(self, query: str, explanations: list[str]) -> list[str | None]:
        if not self.client.available:
            return [None] * len(explanations)
        out: list[str | None] = []
        for e in explanations:
            resp = self.client.chat(
                "You explain WHY a statistical finding about a dataframe query "
                "might hold, using domain knowledge. Answer inside <reasoning> tags.",
                f"Query: {query}\nFinding: {e}",
            )
            out.append(extract_tagged(resp, "reasoning") if resp else None)
        return out
