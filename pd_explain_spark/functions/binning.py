"""Binning / discretization functions.

Reference semantics: numeric equi-width (pd.cut) and quantile (pd.qcut)
binning (many_to_one_explainer.py:211-215), month and season datetime
bins (custom_bins/date_time_bin.py:11-100), date detection (:102-112).
Spark: pure built-in expressions (width_bucket / percentile_approx /
month / quarter) — usable inside any explainer plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MONTH_NAMES = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
SEASONS = {12: "Winter", 1: "Winter", 2: "Winter",
           3: "Spring", 4: "Spring", 5: "Spring",
           6: "Summer", 7: "Summer", 8: "Summer",
           9: "Fall", 10: "Fall", 11: "Fall"}


def equi_width_bucket(c: Column, lo: float, hi: float, n_bins: int) -> Column:
    """0-based equi-width bucket index, edges clamped (pd.cut analogue)."""
    width = (hi - lo) / n_bins
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((c.cast("double") - F.lit(lo)) / F.lit(width))),
    ).cast("int")


def quantile_edges(df: DataFrame, col: str, n_bins: int) -> list[float]:
    """Approx-quantile bin edges (pd.qcut analogue); dedupes equal edges."""
    probs = [i / n_bins for i in range(n_bins + 1)]
    edges = df.approxQuantile(col, probs, 0.001)
    out = []
    for e in edges:
        if not out or e > out[-1]:
            out.append(e)
    return out


def bucket_by_edges(c: Column, edges: list[float]) -> Column:
    """width_bucket against explicit (possibly quantile) edges, 0-based."""
    arr = F.array(*[F.lit(float(e)) for e in edges[1:-1]])
    return F.aggregate(arr, F.lit(0), lambda acc, e: acc + F.when(c.cast("double") >= e, 1).otherwise(0))


def month_bin(c: Column) -> Column:
    """Month-name label (reference MonthsDateTimeBin)."""
    return F.element_at(F.array(*[F.lit(m) for m in MONTH_NAMES]), F.month(c))


def season_bin(c: Column) -> Column:
    """Season label (reference SeasonsDateTimeBin: month -> 4 cuts)."""
    mapping = F.create_map(*[F.lit(x) for kv in SEASONS.items() for x in kv])
    return mapping[F.month(c)]


def is_datetime_column(df: DataFrame, col: str) -> bool:
    """Reference is_date (custom_bins/date_time_bin.py:102-112): schema check."""
    dtype = df.schema[col].dataType
    return isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType))


def interval_label(lo: float, hi: float, closed_right: bool = False) -> str:
    """Interval -> human string (many_to_one_explainer.py:191-196 renders
    'left <= name < right'); here as a standalone label."""
    return f"[{lo:.4g}, {hi:.4g}{']' if closed_right else ')'}"
