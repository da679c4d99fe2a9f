"""pd_explain_spark — a PySpark-native explainable-analytics engine.

Re-expression of the capabilities of analysis-bots/pd-explain
(explainable dataframes: lineage capture over filter / group-by+agg /
join, plus FEDEX / outlier / many-to-one / MetaInsight / Shapley
explanation operators) on top of the Spark DataFrame API, extended with
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, streaming windows).
"""

from .core.frame import ExplainableDataFrame, concat
from .core.operations import (
    BJoinOp,
    BoolExpr,
    Comparison,
    FilterOp,
    GroupByOp,
    JoinOp,
    NotExpr,
    Operation,
)
from .core.series import ExplainableColumn, ExplainablePredicate
from .operators.asof import merge_asof
from .config import GLOBALS, toggle_sampling
from .session import get_spark
from .sources.readers import load_table, read_csv, read_json, read_parquet, to_explainable

__version__ = "0.1.0"

__all__ = [
    "ExplainableDataFrame",
    "concat",
    "merge_asof",
    "ExplainableColumn",
    "ExplainablePredicate",
    "Operation",
    "FilterOp",
    "GroupByOp",
    "JoinOp",
    "BJoinOp",
    "Comparison",
    "BoolExpr",
    "NotExpr",
    "get_spark",
    "toggle_sampling",
    "GLOBALS",
    "read_csv",
    "read_parquet",
    "read_json",
    "to_explainable",
    "load_table",
]
