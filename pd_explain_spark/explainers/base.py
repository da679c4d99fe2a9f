"""Explanation result objects shared by all explainers.

The reference returns an opaque tuple
``(title, scores, K, figs_in_row, explanations, bins, influence_vals,
source_name, show_scores)`` (explainers/fedex_explainer.py:301) plus
textual descriptions (E7). We normalize that into ExplanationItem rows
so results are a DataFrame — queryable, testable, hashable by the
driver — while keeping the reference's text templates
(llm_integrations/explanation_reasoning.py:87-104).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EXPLANATION_SCHEMA = T.StructType(
    [
        T.StructField("attribute", T.StringType()),
        T.StructField("bin", T.StringType()),
        T.StructField("influence", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("side", T.StringType()),
        T.StructField("explanation", T.StringType()),
    ]
)


@dataclass
class ExplanationItem:
    attribute: str
    bin: str
    influence: float
    score: float
    side: str | None = None
    explanation: str = ""
    # chart payload for visualize(); not part of the DataFrame contract.
    # Shape: {"kind": "dist-compare"|"group-bar"|"rule-bar",
    #         "labels": [...], plus kind-specific series/highlight keys}
    viz: dict | None = None


@dataclass
class Explanation:
    kind: str
    query: str
    items: list[ExplanationItem] = field(default_factory=list)
    scores: dict[str, float] = field(default_factory=dict)
    extras: dict[str, Any] = field(default_factory=dict)

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (i.attribute, i.bin, float(i.influence), float(i.score), i.side, i.explanation)
            for i in self.items
        ]
        return spark.createDataFrame(rows, schema=EXPLANATION_SCHEMA)

    def to_text_df(self, spark: SparkSession, round_to: int = 6) -> DataFrame:
        """Oracle-checkable explain surface: (rank, attribute, bin,
        influence, score, explanation) with the floats rounded via
        Spark's HALF_UP ``F.round`` (matching DuckDB's ``round``; never
        Python's HALF_EVEN ``round()``). The explanation strings are the
        exact templates users see — this is the frame that lets the
        driver hash-check the text assembly end to end, not just the
        scoring kernels."""
        from pyspark.sql import functions as F

        rows = [
            (i + 1, it.attribute, it.bin, float(it.influence), float(it.score), it.explanation)
            for i, it in enumerate(self.items)
        ]
        df = spark.createDataFrame(
            rows,
            schema="rank int, attribute string, bin string, influence double, "
            "score double, explanation string",
        )
        return df.select(
            "rank", "attribute", "bin",
            F.round("influence", round_to).alias("influence"),
            F.round("score", round_to).alias("score"),
            "explanation",
        )

    def get_explanation_in_textual_description(self, index: int = 0) -> str:
        """Reference E7: canonical natural-language form per item, with the
        reference's LaTeX cleanup applied (fedex_explainer.py:386-390)."""
        from .visualize import clean_latex

        if not self.items:
            return "No explanation found."
        return clean_latex(self.items[index].explanation)

    def texts(self) -> list[str]:
        return [i.explanation for i in self.items]

    def to_reference_tuple(
        self, title: str | None = None, figs_in_row: int = 3, show_scores: bool = False
    ):
        """The reference's 9-field results tuple
        (title, scores, K, figs_in_row, explanations, bins, influence_vals,
        source_name, show_scores) — fedex_explainer.py:301."""
        from .visualize import to_reference_tuple

        return to_reference_tuple(self, title, figs_in_row, show_scores)

    def visualize(
        self,
        mode: str = "grid",
        figs_in_row: int = 3,
        show_scores: bool = False,
        title: str | None = None,
    ):
        """Draw the explanation: matplotlib grid (mode='grid') or carousel
        (mode='carousel', ipywidgets). Falls back to a printed textual
        rendering + FigureSpec when matplotlib is unavailable — mirrors
        the reference contract fedex_explainer.py:147,196-286."""
        from .visualize import visualize

        return visualize(
            self, mode=mode, figs_in_row=figs_in_row, show_scores=show_scores, title=title
        )

    def __repr__(self) -> str:
        lines = [f"Explanation(kind={self.kind}, query={self.query})"]
        lines += [f"  - {i.explanation} (score={i.score:.4f})" for i in self.items]
        return "\n".join(lines)


class ExplainerBase:
    def generate_explanation(self) -> Explanation:
        raise NotImplementedError
