"""ExplainableGroupedData: lazy grouped object with the 13 named aggs.

Mirrors the reference's ExpDataFrameGroupBy / ExpSeriesGroupBy
(core/explainable_group_by_dataframe.py:17, core/explainable_group_by_series.py:10)
without the class-swap hack — we own the facade, ``df.groupby(keys)``
returns this wrapper directly. Every agg returns an ExplainableDataFrame
whose lineage is a GroupByOp; result columns follow the ``<col>_<agg>``
naming contract (explainable_group_by_dataframe.py:22-485).

Spark notes: one ``groupBy(...).agg(...)`` — a single shuffle on the keys
with map-side partial aggregation; ``nunique`` is the one agg that cannot
partially aggregate (exact distinct), which is the correct price for
oracle parity (``approx_count_distinct`` is the documented scale path).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from ..operators.aggregates import (
    AGG_NAMES,
    NUMERIC_ONLY,
    agg_column,
    is_numeric_type,
    output_name,
)
from .operations import GroupByOp

if TYPE_CHECKING:  # pragma: no cover
    from .frame import ExplainableDataFrame


class ExplainableGroupedData:
    def __init__(self, frame: "ExplainableDataFrame", keys: list[str], selected: list[str] | None = None):
        missing = [k for k in keys if k not in frame.df.columns]
        if missing:
            raise KeyError(f"group key(s) not in columns: {missing}")
        self.frame = frame
        self.keys = keys
        self.selected = selected  # None = all non-key columns
        # last aggregated result, for the reference's groupby-level
        # explain() contract (explainable_group_by_dataframe.py:487-497)
        self._last_result = None

    # -- column projection on the grouped object ---------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            cols = [key]
        else:
            cols = list(key)
        missing = [c for c in cols if c not in self.frame.df.columns]
        if missing:
            raise KeyError(f"column(s) not in frame: {missing}")
        return ExplainableGroupedData(self.frame, self.keys, cols)

    # -- agg machinery ------------------------------------------------------
    def _value_columns(self, agg: str, numeric_only: bool | None = None) -> list[str]:
        """``numeric_only`` follows the reference contract
        (ref tests/test_exp_series.py:48-115): True filters to numeric
        columns, False keeps the selection but RAISES TypeError when a
        numeric-only aggregate hits a non-numeric column (pandas 2.x),
        None (default) silently filters — the existing behavior."""
        schema = {f.name: f.dataType for f in self.frame.df.schema.fields}
        if self.selected is not None:
            cols = [c for c in self.selected if c not in self.keys]
        else:
            cols = [c for c in self.frame.df.columns if c not in self.keys]
        if numeric_only:
            return [c for c in cols if is_numeric_type(schema[c])]
        if numeric_only is False and agg in NUMERIC_ONLY:
            bad = [c for c in cols if not is_numeric_type(schema[c])]
            if bad:
                raise TypeError(
                    f"agg function failed [how->{agg}]: column(s) {bad} are not numeric "
                    "(numeric_only=False)"
                )
            return cols
        if agg in NUMERIC_ONLY:
            cols = [c for c in cols if is_numeric_type(schema[c])]
        return cols

    def _run(self, agg_dict: dict[str, list[str]], ddof: int = 1, size: bool = False) -> "ExplainableDataFrame":
        from .frame import ExplainableDataFrame

        exprs = []
        column_mapping: dict[str, tuple[str, str]] = {}
        if size:
            exprs.append(agg_column("*", "size").alias("size"))
            column_mapping["size"] = ("*", "size")
        for col, aggs in agg_dict.items():
            for agg in aggs:
                out = output_name(col, agg)
                exprs.append(agg_column(col, agg, ddof=ddof).alias(out))
                column_mapping[out] = (col, agg)
        if not exprs:
            raise ValueError("no columns to aggregate")
        result = self.frame.df.groupBy(*self.keys).agg(*exprs)
        op = GroupByOp(
            source=self.frame.df,
            result=result,
            source_name=self.frame.name,
            keys=list(self.keys),
            agg_dict={k: list(v) for k, v in agg_dict.items()},
            column_mapping=column_mapping,
        )
        agg_label = "_".join(sorted({a for v in agg_dict.values() for a in v})) or "size"
        out = ExplainableDataFrame(
            result, name=f"{self.frame.name}_groupby_{agg_label}", operation=op
        )
        self._last_result = out
        return out

    def _named(
        self, agg: str, ddof: int = 1, numeric_only: bool | None = None
    ) -> "ExplainableDataFrame":
        if agg == "size":
            return self._run({}, size=True)
        cols = self._value_columns(agg, numeric_only=numeric_only)
        if not cols:
            raise ValueError(f"no applicable columns for agg {agg!r}")
        return self._run({c: [agg] for c in cols}, ddof=ddof)

    def drop_duplicates(self):
        """Per-group full-row dedup (reference
        explainable_group_by_dataframe.py:453-456). Because the group
        keys are part of every row, per-group dedup over all columns is
        exactly global dedup — one distinct over the parent frame, with
        partial aggregation before the shuffle."""
        return self.frame.drop_duplicates()

    def explain(self, **kwargs):
        """Groupby-level explain (reference
        explainable_group_by_dataframe.py:487-497): explains the LAST
        aggregation run through this groupby; warns and returns None
        when no aggregation has run yet — the reference prints 'no
        operation was found.' for the same state."""
        if self._last_result is None:
            import warnings

            warnings.warn("no operation was found.", stacklevel=2)
            return None
        return self._last_result.explain(**kwargs)

    def mean(self, numeric_only: bool | None = None):
        return self._named("mean", numeric_only=numeric_only)

    def median(self, numeric_only: bool | None = None):
        return self._named("median", numeric_only=numeric_only)

    def std(self, ddof: int = 1, numeric_only: bool | None = None):
        return self._named("std", ddof=ddof, numeric_only=numeric_only)

    def var(self, ddof: int = 1, numeric_only: bool | None = None):
        return self._named("var", ddof=ddof, numeric_only=numeric_only)

    def sem(self, ddof: int = 1, numeric_only: bool | None = None):
        return self._named("sem", ddof=ddof, numeric_only=numeric_only)

    def size(self):
        return self._named("size")

    def sum(self, numeric_only: bool | None = None):
        return self._named("sum", numeric_only=numeric_only)

    def prod(self, numeric_only: bool | None = None):
        return self._named("prod", numeric_only=numeric_only)

    def min(self, numeric_only: bool | None = None):
        return self._named("min", numeric_only=numeric_only)

    def max(self, numeric_only: bool | None = None):
        return self._named("max", numeric_only=numeric_only)

    def count(self):
        return self._named("count")

    def nunique(self):
        return self._named("nunique")

    # -- pandas groupby.transform / groupby.filter -------------------------
    _WINDOW_AGGS = {
        "mean": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c),
        "std": F.stddev_samp,
        "var": F.var_samp,
        "size": lambda c: F.count(F.lit(1)),
    }

    def transform(self, agg: str) -> "ExplainableDataFrame":
        """pandas ``groupby.transform``: the group aggregate broadcast back
        onto every row — output has the input's shape, value columns
        replaced by their group statistic. ONE shuffle (a window
        partitioned by the keys, no frame clause → whole-group), no join
        back. nunique uses collect_set (exact) — the documented cost."""
        from pyspark.sql import Window

        from .frame import ExplainableDataFrame

        if agg != "nunique" and agg not in self._WINDOW_AGGS:
            raise ValueError(
                f"transform supports {sorted(self._WINDOW_AGGS) + ['nunique']}, got {agg!r}"
            )
        w = Window.partitionBy(*self.keys)
        if agg == "nunique":
            # OVER must wrap the aggregate (collect_set), not the size()
            cols = {
                c: F.size(F.collect_set(F.col(c)).over(w))
                for c in self._value_columns(agg)
            }
        else:
            fn = self._WINDOW_AGGS[agg]
            cols = {c: fn(F.col(c)).over(w) for c in self._value_columns(agg)}
        if not cols:
            raise ValueError(f"no applicable columns for agg {agg!r}")
        out = self.frame.df.withColumns(cols)
        return ExplainableDataFrame(out, name=f"{self.frame.name}.transform({agg})")

    def apply(self, fn, schema) -> "ExplainableDataFrame":
        """pandas ``groupby.apply`` with a frame→frame callable, via
        Arrow ``applyInPandas``. ``schema`` (DDL string or StructType) is
        required — Spark must know the output shape before execution,
        unlike pandas which infers it from the first group.

        Scale shape: one shuffle on the keys, then the callable runs
        per group in Arrow batches on the executors. This is the
        documented Python escape hatch — for any agg/transform the named
        operators cover, prefer those (JVM codegen, no Python)."""
        from .frame import ExplainableDataFrame

        out = self.frame.df.groupBy(*self.keys).applyInPandas(fn, schema=schema)
        return ExplainableDataFrame(out, name=f"{self.frame.name}.apply")

    def filter_groups(self, predicate: str, **aggs: tuple) -> "ExplainableDataFrame":
        """pandas ``groupby.filter``: keep the original ROWS of groups
        whose aggregates satisfy ``predicate`` (SQL over the aliases given
        as ``name=(column, agg)`` kwargs — the distributed contract
        replacing pandas' per-group callable). One shuffle for the
        per-group aggregates + a semi join on the keys (AQE broadcasts the
        qualifying-group list when it is small)."""
        from ..operators.aggregates import agg_column
        from .frame import ExplainableDataFrame

        if not aggs:
            raise ValueError("filter_groups needs at least one name=(column, agg) kwarg")
        exprs = [agg_column(col, agg).alias(name) for name, (col, agg) in aggs.items()]
        qualifying = self.frame.df.groupBy(*self.keys).agg(*exprs).filter(F.expr(predicate))
        out = self.frame.df.join(qualifying.select(*self.keys), on=self.keys, how="semi")
        return ExplainableDataFrame(out, name=f"{self.frame.name}.filter_groups")

    def _callable_expr(self, col: str, fn) -> tuple:
        """Arrow-batched grouped-agg UDF for a user callable (reference
        ``groupby.aggregate(func)``, explainable_group_by_dataframe.py:22-48;
        SURVEY §2.6 maps it to pandas_udf GROUPED_AGG). The callable gets
        the group's values as a pandas Series and must return a scalar.
        This is the documented slow path — named aggs stay JVM-side."""
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        name = getattr(fn, "__name__", "agg").lstrip("<").rstrip(">") or "agg"

        # explicit functionType: the module uses lazy annotations, so the
        # inferred-signature form cannot see a real pd.Series hint here
        @pandas_udf("double", PandasUDFType.GROUPED_AGG)
        def _udaf(s):
            return float(fn(s))

        return _udaf(F.col(col)), name

    def aggregate(self, spec=None, ddof: int = 1, **kwargs):
        """pandas alias (reference explainable_group_by_dataframe.py:22)."""
        return self.agg(spec, ddof=ddof, **kwargs)

    def agg(self, spec=None, ddof: int = 1, **kwargs):
        """Generic agg: ``agg({'col': 'mean'})``, ``agg({'col': ['mean','sum']})``,
        ``agg('mean')``, named-style ``agg(out=('col','mean'))``, or a Python
        callable per column ``agg({'col': lambda s: ...})`` (grouped-agg
        pandas UDF; callable receives the group as a pandas Series)."""
        if spec is None and kwargs:
            # named aggregation: out_name=(col, agg)
            from .frame import ExplainableDataFrame

            exprs, agg_dict, column_mapping = [], {}, {}
            for out, (col, agg) in kwargs.items():
                if agg not in AGG_NAMES:
                    raise ValueError(f"unsupported aggregate {agg!r}")
                exprs.append(agg_column(col, agg, ddof=ddof).alias(out))
                agg_dict.setdefault(col, []).append(agg)
                column_mapping[out] = (col, agg)
            result = self.frame.df.groupBy(*self.keys).agg(*exprs)
            op = GroupByOp(
                source=self.frame.df,
                result=result,
                source_name=self.frame.name,
                keys=list(self.keys),
                agg_dict=agg_dict,
                column_mapping=column_mapping,
            )
            return ExplainableDataFrame(result, name=f"{self.frame.name}_groupby_agg", operation=op)
        if isinstance(spec, str):
            return self._named(spec, ddof=ddof)
        if callable(spec):
            cols = self._value_columns("mean")  # numeric columns only
            return self.agg({c: spec for c in cols}, ddof=ddof)
        if isinstance(spec, dict):
            agg_dict = {
                c: ([a] if isinstance(a, str) or callable(a) else list(a))
                for c, a in spec.items()
            }
            callables = {
                c: [a for a in aggs if callable(a)] for c, aggs in agg_dict.items()
            }
            for aggs in agg_dict.values():
                for a in aggs:
                    if not callable(a) and a not in AGG_NAMES:
                        raise ValueError(f"unsupported aggregate {a!r}")
            if not any(callables.values()):
                return self._run(agg_dict, ddof=ddof)
            # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM
            # aggregates in one agg() [INVALID_PANDAS_UDF_PLACEMENT]:
            # run the JVM aggs and the UDF aggs as two grouped passes and
            # join on the keys (null-safe — Spark keeps NULL key groups).
            # Both shuffles hash on the same keys, so AQE co-locates them.
            from .frame import ExplainableDataFrame

            jvm_exprs, udf_exprs, out_dict, column_mapping = [], [], {}, {}
            for col, aggs in agg_dict.items():
                for a in aggs:
                    if callable(a):
                        expr, aname = self._callable_expr(col, a)
                        out = output_name(col, aname)
                        udf_exprs.append(expr.alias(out))
                    else:
                        aname = a
                        out = output_name(col, a)
                        jvm_exprs.append(agg_column(col, a, ddof=ddof).alias(out))
                    out_dict.setdefault(col, []).append(aname)
                    column_mapping[out] = (col, aname)
            if jvm_exprs and udf_exprs:
                left = self.frame.df.groupBy(*self.keys).agg(*jvm_exprs)
                right = self.frame.df.groupBy(*self.keys).agg(*udf_exprs)
                r = right
                for k in self.keys:
                    r = r.withColumnRenamed(k, f"__r_{k}")
                cond = None
                for k in self.keys:
                    c = F.col(k).eqNullSafe(F.col(f"__r_{k}"))
                    cond = c if cond is None else (cond & c)
                result = left.join(r, cond, "inner").drop(*[f"__r_{k}" for k in self.keys])
            else:
                result = self.frame.df.groupBy(*self.keys).agg(*(jvm_exprs or udf_exprs))
            op = GroupByOp(
                source=self.frame.df,
                result=result,
                source_name=self.frame.name,
                keys=list(self.keys),
                agg_dict=out_dict,
                column_mapping=column_mapping,
            )
            return ExplainableDataFrame(
                result, name=f"{self.frame.name}_groupby_agg", operation=op
            )
        raise TypeError(f"unsupported agg spec: {spec!r}")

    aggregate = agg

    def __repr__(self) -> str:
        sel = f"[{self.selected}]" if self.selected else ""
        return f"ExplainableGroupedData({self.frame.name}.groupby({self.keys}){sel})"
