"""VisualizationBeautifier (reference
llm_integrations/beta_integrations/visualization_beautifier.py:27-50+):
an LLM rewrites the plotting code for a figure, with up to
``max_fix_attempts`` repair rounds when the generated code fails.

Offline (no API key) the beautifier is a documented no-op: it returns
(None, None), which in the reference's own flow means "display the
original figure" (fedex_explainer.py:246-252) — exactly the degradation
a headless environment wants. The code-execution sandbox only ever runs
LLM code through exec in a restricted namespace WITH an explicit
opt-in, mirroring the reference's beta status.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .client import Client


@dataclass
class VisualizationBeautifier:
    visualization_object: Any = None
    data: Any = None
    visualization_params: dict = field(default_factory=dict)
    requester_name: str | None = None
    visualization_code: str | None = None
    max_fix_attempts: int = 10
    must_generalize: bool = False
    silent: bool = True
    allow_exec: bool = False  # explicit opt-in before any generated code runs
    client: Client = field(default_factory=Client)

    llm_generated_code: str | None = None

    def do_llm_action(self) -> tuple[Any, str | None]:
        """Ask the LLM for improved plotting code; returns (figure_or_None,
        code_or_None). Reference callers treat (None, _) as 'keep the
        original figure'."""
        if not self.client.available:
            if not self.silent:
                print("Beautifier unavailable (no LLM key) — keeping the original figure.")
            return None, None
        if self.visualization_code is None:
            # reference behavior: pull the real plotting source via the
            # code extractor so the LLM rewrites actual code, not a stub
            try:
                from .code_extractor import VisualizationCodeExtractor

                self.visualization_code = VisualizationCodeExtractor().get_visualization_code(
                    (self.requester_name or "fedex").lower()
                )
            except Exception:
                pass
        prompt_ctx = (
            f"Visualization params: {sorted(self.visualization_params)}; "
            f"requester: {self.requester_name or 'generic'}."
        )
        code = self.client.chat(
            "Rewrite this matplotlib visualization code to be clearer and "
            "more informative. Return ONLY python code defining a function "
            "beautified(params) -> matplotlib.figure.Figure.",
            f"{prompt_ctx}\nOriginal code:\n{self.visualization_code or '(none)'}",
        )
        if not code:
            return None, None
        self.llm_generated_code = code
        if not self.allow_exec:
            # surface the code without executing it (beta safety posture)
            return None, code
        return self._run_with_repairs(code), self.llm_generated_code

    def beautify_from_code(self, code: str):
        """Re-render from previously generated code (reference
        beautify_from_code); requires the exec opt-in."""
        self.llm_generated_code = code
        if not self.allow_exec:
            return None
        return self._run_with_repairs(code)

    def _run_with_repairs(self, code: str):
        last_err: Exception | None = None
        for _ in range(max(1, self.max_fix_attempts)):
            try:
                ns: dict = {}
                exec(code, ns)  # opt-in path only (allow_exec=True)
                fig = ns["beautified"](self.visualization_params)
                return fig
            except Exception as e:  # ask the LLM to repair, reference-style
                last_err = e
                if not self.client.available:
                    break
                fixed = self.client.chat(
                    "The following python plotting code raised an error. "
                    "Return ONLY the corrected code.",
                    f"Error: {e!r}\nCode:\n{code}",
                )
                if not fixed:
                    break
                code = fixed
                self.llm_generated_code = code
        if not self.silent:
            print(f"Beautification failed after repairs: {last_err!r}")
        return None
