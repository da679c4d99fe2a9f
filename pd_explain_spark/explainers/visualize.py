"""Visualization layer — the reference's primary UX surface.

Mirrors /root/reference/src/pd_explain/explainers/fedex_explainer.py
(_visualize at :196-286, results tuple at :301, LaTeX cleanup at
:386-390) and visualizer_adaptations/carousel_adapter.py:7-128:

 * ``to_reference_tuple`` — the 9-field results tuple
   (title, scores, K, figs_in_row, explanations, bins, influence_vals,
   source_name, show_scores) every reference explainer returns.
 * ``visualize(explanation, mode='grid'|'carousel')`` — matplotlib grid
   of per-explanation bar charts with the influential bin highlighted
   (the reference draws "(in green)"), or an ipywidgets carousel.
 * graceful degradation: matplotlib/ipywidgets are OPTIONAL — when
   absent we print the textual rendering and return a ``FigureSpec``
   carrying the same data, so headless/driver environments never fail.
   (The reference's own tests accept "a message was printed" in place of
   a figure — tests/test_explainers.py:22-37.)

All rendering is driver-side over the already-computed Explanation; no
Spark jobs run here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

_LATEX_BF = re.compile(r"\$\\+bf{(.*?)}\$")


def clean_latex(text: str) -> str:
    """Reference cleanup regexes (fedex_explainer.py:386-390): strip
    $\\bf{...}$ wrappers, the "(in green)" figure cross-reference,
    newlines and stray backslashes."""
    out = _LATEX_BF.sub(r"\1", text)
    return out.replace("(in green)", "").replace("\n", " ").replace("\\", "")


@dataclass
class FigureSpec:
    """Deterministic stand-in for a matplotlib Figure when the plotting
    stack is unavailable: one entry per would-be axes panel."""

    title: str
    panels: list[dict] = field(default_factory=list)
    mode: str = "grid"
    figs_in_row: int = 3
    show_scores: bool = False

    def get_axes(self):  # duck-types enough of Figure for smoke tests
        return self.panels


def _source_name(explanation) -> str:
    name = explanation.extras.get("source_name")
    if name:
        return str(name)
    q = explanation.query or ""
    for sep in (".", "["):
        if sep in q:
            return q.split(sep, 1)[0]
    return q or "df"


def to_reference_tuple(
    explanation, title: str | None = None, figs_in_row: int = 3, show_scores: bool = False
):
    items = explanation.items
    resolved_title = title or f"{explanation.kind}: {explanation.query}"
    scores = [float(i.score) for i in items]
    explanations = [i.explanation for i in items]
    bins = [i.viz if i.viz is not None else {"kind": "label", "labels": [i.bin]} for i in items]
    influence_vals = [float(i.influence) for i in items]
    return (
        resolved_title,
        scores,
        len(items),
        figs_in_row,
        explanations,
        bins,
        influence_vals,
        _source_name(explanation),
        show_scores,
    )


def _panel_dicts(explanation, show_scores: bool) -> list[dict]:
    panels = []
    for item in explanation.items:
        head = clean_latex(item.explanation)
        if show_scores:
            head += f" [score={item.score:.4f}]"
        panels.append(
            {
                "title": head,
                "viz": item.viz or {"kind": "label", "labels": [item.bin]},
                "attribute": item.attribute,
                "influence": float(item.influence),
                "score": float(item.score),
            }
        )
    return panels


# ---------------------------------------------------------------------------
# matplotlib rendering
# ---------------------------------------------------------------------------

_HIGHLIGHT = "#2ca02c"  # the reference highlights the influential bin in green
_BASE = "#7f7f7f"
_RESULT = "#1f77b4"


def _draw_panel(ax, panel: dict) -> None:
    viz = panel["viz"]
    kind = viz.get("kind", "label")
    labels = [str(x) for x in viz.get("labels", [])]
    xs = range(len(labels))
    hl = viz.get("highlight")
    if kind == "dist-compare":
        # source vs result bin shares; influential bin in green
        src, res = viz.get("src", []), viz.get("res", [])
        w = 0.4
        ax.bar([x - w / 2 for x in xs], src, width=w, color=_BASE, label="before")
        colors = [_HIGHLIGHT if i == hl else _RESULT for i in xs]
        ax.bar([x + w / 2 for x in xs], res, width=w, color=colors, label="after")
        ax.legend(fontsize=7)
    elif kind in ("group-bar", "rule-bar"):
        vals = viz.get("values", [])
        colors = [_HIGHLIGHT if i == hl else _RESULT for i in xs]
        ax.bar(list(xs), vals, color=colors)
    else:  # label-only panel: render the bin name as text
        ax.text(0.5, 0.5, "\n".join(labels) or "-", ha="center", va="center", wrap=True)
        ax.set_xticks([])
        ax.set_yticks([])
        ax.set_title(_wrap(panel["title"]), fontsize=8)
        return
    ax.set_xticks(list(xs))
    ax.set_xticklabels(labels, rotation=45, ha="right", fontsize=7)
    ax.set_title(_wrap(panel["title"]), fontsize=8)


def _wrap(text: str, width: int = 45) -> str:
    words, lines, cur = text.split(), [], ""
    for w in words:
        if cur and len(cur) + 1 + len(w) > width:
            lines.append(cur)
            cur = w
        else:
            cur = f"{cur} {w}".strip()
    if cur:
        lines.append(cur)
    return "\n".join(lines[:4])


def _render_grid(panels: list[dict], title: str, figs_in_row: int):
    import math

    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    n = max(len(panels), 1)
    rows = math.ceil(n / figs_in_row)
    cols = min(n, figs_in_row)
    fig, axes = plt.subplots(rows, cols, figsize=(4.5 * cols, 3.2 * rows), squeeze=False)
    flat = [ax for row in axes for ax in row]
    for ax, panel in zip(flat, panels):
        _draw_panel(ax, panel)
    for ax in flat[len(panels):]:
        ax.axis("off")
    fig.suptitle(_wrap(title, 80), fontsize=10)
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    return fig


def visualize(
    explanation,
    mode: str = "grid",
    figs_in_row: int = 3,
    show_scores: bool = False,
    title: str | None = None,
):
    """Render an Explanation. Returns a matplotlib Figure (grid), an
    ipywidgets VBox (carousel), or a FigureSpec + printed text when the
    plotting stack is missing."""
    resolved_title = title or f"{explanation.kind}: {explanation.query}"
    panels = _panel_dicts(explanation, show_scores)
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        print(f"[{resolved_title}]")
        if not panels:
            print("No explanations to visualize.")
        for p in panels:
            print(f"  - {p['title']}")
        print("(matplotlib not installed — returning FigureSpec instead of a Figure)")
        return FigureSpec(
            title=resolved_title,
            panels=panels,
            mode=mode,
            figs_in_row=figs_in_row,
            show_scores=show_scores,
        )

    if mode == "carousel":
        try:
            import ipywidgets as widgets
            from IPython.display import display
        except ImportError:
            # reference behavior: carousel needs ipywidgets; degrade to grid
            print("ipywidgets not installed — falling back to grid display.")
            return _render_grid(panels, resolved_title, figs_in_row)
        outputs = []
        for p in panels:
            out = widgets.Output()
            with out:
                fig = _render_grid([p], resolved_title, 1)
                display(fig)
            outputs.append(out)
        slider = widgets.IntSlider(min=0, max=max(len(outputs) - 1, 0), description="Plot:")
        box = widgets.VBox([slider, *outputs[:1]])

        def _update(change):
            box.children = (slider, outputs[change["new"]])

        slider.observe(_update, names="value")
        return box

    return _render_grid(panels, resolved_title, figs_in_row)
