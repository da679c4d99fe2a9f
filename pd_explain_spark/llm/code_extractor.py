"""VisualizationCodeExtractor (reference utils/visualization_code_extractor.py:7-250).

The reference reads the *source code* of the dep-package plotting
routines so the VisualizationBeautifier can hand the LLM real code to
rewrite (visualization_beautifier.py builds its prompt from extracted
function bodies). Our engine's plotting lives in
``explainers/visualize.py``; the extractor returns those function
sources keyed by explainer kind, via ``inspect`` — no file-path
scraping, so it keeps working if the module moves.
"""

from __future__ import annotations

import inspect


class VisualizationCodeExtractor:
    """Source-of-plot-code provider for the beautifier.

    ``get_visualization_code(kind)`` returns one self-contained string:
    the grid renderer plus the panel painter (what an LLM must see to
    restyle a figure), and the per-explainer panel builder.
    """

    def get_visualization_code(self, kind: str = "fedex") -> str:
        from ..explainers import visualize as _viz

        parts = [
            inspect.getsource(_viz._render_grid),
            inspect.getsource(_viz._draw_panel),
            inspect.getsource(_viz._panel_dicts),
        ]
        fn = getattr(_viz, f"_panels_{kind}", None)
        if fn is not None:  # explainer-specific builder, when present
            parts.append(inspect.getsource(fn))
        return "\n\n".join(parts)

    def source_for(self, obj) -> str:
        """Source of an arbitrary callable/class (reference extracts
        named dep classes the same way)."""
        return inspect.getsource(obj)
