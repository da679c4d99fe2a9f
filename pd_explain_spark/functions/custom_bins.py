"""User-extensible bin plug-in API (reference custom_bins/date_time_bin.py,
legacy interface explain_ed.Measures.Bins.UserBin — SURVEY.md §8).

A UserBin turns a source/result column pair into binned columns the
explainers can histogram. The reference implementations are pandas
expressions; here a bin is a Spark Column transformation, so binning
stays JVM-side and composes with the single-pass histogram service.

Contract (matching the reference's method surface):
 * ``get_binned_source_column()`` / ``get_binned_result_column()`` —
   Spark Columns of bin keys;
 * ``get_bin_name()`` — display name of the binning;
 * ``get_bin_representation(key)`` — human label for a bin key.

Built-ins: MonthsDateTimeBin, SeasonsDateTimeBin (reference
date_time_bin.py:11-100), EquiWidthBin for numerics. Register custom
bins with ``register_bin`` and explainer callers can resolve them by
name via ``resolve_bin``.
"""

from __future__ import annotations

import calendar

from pyspark.sql import Column
from pyspark.sql import functions as F

SEASONS = ["Winter", "Spring", "Summer", "Autumn"]  # reference date_time_bin.py:8


class UserBin:
    """Base plug-in: subclass and override ``bin_column`` (one Column in,
    one bin-key Column out) plus ``get_bin_representation``."""

    name = "user"

    def __init__(self, source_column: Column, result_column: Column):
        self.source_column = source_column
        self.result_column = result_column

    # -- to override --------------------------------------------------------
    def bin_column(self, col: Column) -> Column:
        raise NotImplementedError("UserBin subclasses must implement bin_column")

    def get_bin_representation(self, key) -> str:
        return str(key)

    # -- reference method surface -------------------------------------------
    def get_binned_source_column(self) -> Column:
        return self.bin_column(self.source_column)

    def get_binned_result_column(self) -> Column:
        return self.bin_column(self.result_column)

    def get_bin_name(self) -> str:
        return self.name


class MonthsDateTimeBin(UserBin):
    """Datetime -> calendar month (reference MonthsDateTimeBin)."""

    name = "months"

    def bin_column(self, col: Column) -> Column:
        return F.month(col)

    def get_bin_representation(self, key) -> str:
        try:
            return calendar.month_name[int(key)]
        except (ValueError, IndexError, TypeError):
            return str(key)


class SeasonsDateTimeBin(UserBin):
    """Datetime -> season quarter (reference SeasonsDateTimeBin bins the
    month into 4 cuts; F.quarter is the same partition)."""

    name = "seasons"

    def bin_column(self, col: Column) -> Column:
        return F.quarter(col) - F.lit(1)  # 0-based like the reference pd.cut

    def get_bin_representation(self, key) -> str:
        try:
            return SEASONS[int(key)]
        except (ValueError, IndexError, TypeError):
            return str(key)


class EquiWidthBin(UserBin):
    """Numeric equi-width bins over a [lo, hi) range."""

    name = "equi-width"

    def __init__(self, source_column, result_column, lo: float, hi: float, n_bins: int = 10):
        super().__init__(source_column, result_column)
        self.lo, self.hi, self.n_bins = float(lo), float(hi), int(n_bins)

    def bin_column(self, col: Column) -> Column:
        width = (self.hi - self.lo) / self.n_bins or 1.0
        return F.least(
            F.lit(self.n_bins - 1),
            F.greatest(F.lit(0), F.floor((col.cast("double") - F.lit(self.lo)) / F.lit(width))),
        ).cast("int")

    def get_bin_representation(self, key) -> str:
        width = (self.hi - self.lo) / self.n_bins or 1.0
        k = int(key)
        closing = "]" if k == self.n_bins - 1 else ")"
        return f"[{self.lo + k * width:.4g}, {self.lo + (k + 1) * width:.4g}{closing}"


_REGISTRY: dict[str, type[UserBin]] = {
    MonthsDateTimeBin.name: MonthsDateTimeBin,
    SeasonsDateTimeBin.name: SeasonsDateTimeBin,
    EquiWidthBin.name: EquiWidthBin,
}


def register_bin(cls: type[UserBin]) -> type[UserBin]:
    """Register a custom bin class (usable as a decorator)."""
    if not issubclass(cls, UserBin):
        raise TypeError("custom bins must subclass UserBin")
    _REGISTRY[cls.name] = cls
    return cls


def resolve_bin(name: str) -> type[UserBin]:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"no bin registered under {name!r}; known: {sorted(_REGISTRY)}")
