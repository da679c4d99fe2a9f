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

    def get_explanation_in_textual_description(self, index: int = 0) -> str:
        """Reference E7: canonical natural-language form per item."""
        if not self.items:
            return "No explanation found."
        return self.items[index].explanation

    def texts(self) -> list[str]:
        return [i.explanation for i in self.items]

    def __repr__(self) -> str:
        lines = [f"Explanation(kind={self.kind}, query={self.query})"]
        lines += [f"  - {i.explanation} (score={i.score:.4f})" for i in self.items]
        return "\n".join(lines)


class ExplainerBase:
    def generate_explanation(self) -> Explanation:
        raise NotImplementedError
