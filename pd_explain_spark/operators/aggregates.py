"""The 13 named aggregate functions of the tracked group-by operator.

Reference surface: explainable_group_by_dataframe.py:22-485 exposes
``mean median std var sem size sum prod min max count nunique`` plus
generic ``agg``; results are renamed ``<col>_<agg>``.

Spark mapping (all JVM-side, codegen'd — no Python UDFs):
  mean            -> avg
  median          -> median (exact, Spark >= 3.4)
  std(ddof=1)     -> stddev_samp; general ddof via var_samp * (n-1)/(n-ddof)
  var(ddof=1)     -> var_samp (same generalization)
  sem(ddof=1)     -> stddev_samp / sqrt(count)   (composite)
  size            -> count(*)
  sum             -> sum
  prod            -> product
  min / max       -> min / max
  count           -> count(col)  (non-null, matching pandas)
  nunique         -> count(DISTINCT col)  (exact so the DuckDB oracle matches)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

AGG_NAMES = [
    "mean",
    "median",
    "std",
    "var",
    "sem",
    "size",
    "sum",
    "prod",
    "min",
    "max",
    "count",
    "nunique",
]

# aggs that only make sense on numeric columns (pandas numeric_only behavior)
NUMERIC_ONLY = {"mean", "median", "std", "var", "sem", "sum", "prod"}

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def is_numeric_type(dtype: T.DataType) -> bool:
    return isinstance(dtype, _NUMERIC_TYPES)


def agg_column(col: str, agg: str, ddof: int = 1) -> Column:
    """Build the Spark aggregate expression for one (column, agg-name) pair."""
    c = F.col(col)
    if agg == "mean":
        return F.avg(c)
    if agg == "median":
        return F.median(c)
    if agg == "std":
        if ddof == 1:
            return F.stddev_samp(c)
        n = F.count(c)
        return F.sqrt(F.var_samp(c) * (n - F.lit(1)) / (n - F.lit(ddof)))
    if agg == "var":
        if ddof == 1:
            return F.var_samp(c)
        n = F.count(c)
        return F.var_samp(c) * (n - F.lit(1)) / (n - F.lit(ddof))
    if agg == "sem":
        if ddof == 1:
            return F.stddev_samp(c) / F.sqrt(F.count(c))
        n = F.count(c)
        return F.sqrt(F.var_samp(c) * (n - F.lit(1)) / (n - F.lit(ddof))) / F.sqrt(n)
    if agg == "size":
        return F.count(F.lit(1))
    if agg == "sum":
        return F.sum(c)
    if agg == "prod":
        return F.product(c)
    if agg == "min":
        return F.min(c)
    if agg == "max":
        return F.max(c)
    if agg == "count":
        return F.count(c)
    if agg == "nunique":
        return F.count_distinct(c)
    raise ValueError(f"unsupported aggregate {agg!r}; known: {AGG_NAMES}")


def output_name(col: str, agg: str) -> str:
    """The reference's ``<col>_<agg>`` naming contract."""
    return f"{col}_{agg}"
