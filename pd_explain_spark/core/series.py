"""ExplainableColumn: the 1-D facade that records filter predicates.

Plays the role of the reference's ``ExpSeries`` used as a boolean mask
(core/explainable_series.py:30, :233-286): ``df['age'] > 30`` returns an
ExplainablePredicate carrying both the real Spark ``Column`` and a
``PredicateNode`` tree for lineage. We own the facade, so no
``_cmp_method`` monkey-patching is needed.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from .operations import BoolExpr, Comparison, NotExpr, PredicateNode

if TYPE_CHECKING:  # pragma: no cover
    from .frame import ExplainableDataFrame


class ExplainablePredicate:
    """A boolean mask: Spark Column + recorded predicate tree."""

    def __init__(self, frame: "ExplainableDataFrame", column: Column, tree: PredicateNode):
        self.frame = frame
        self.column = column
        self.tree = tree

    def __and__(self, other: "ExplainablePredicate") -> "ExplainablePredicate":
        return ExplainablePredicate(
            self.frame, self.column & other.column, BoolExpr("&", self.tree, other.tree)
        )

    def __or__(self, other: "ExplainablePredicate") -> "ExplainablePredicate":
        return ExplainablePredicate(
            self.frame, self.column | other.column, BoolExpr("|", self.tree, other.tree)
        )

    def __invert__(self) -> "ExplainablePredicate":
        return ExplainablePredicate(self.frame, ~self.column, NotExpr(self.tree))

    def __repr__(self) -> str:
        return f"ExplainablePredicate({self.tree.to_string()})"


class ExplainableColumn:
    """A named column of an ExplainableDataFrame.

    Comparison operators produce ExplainablePredicate (lineage-recorded);
    arithmetic produces plain Spark Columns (projection, not tracked —
    matching the reference's filter-only capture contract).
    """

    def __init__(self, frame: "ExplainableDataFrame", name: str):
        self.frame = frame
        self.name = name

    @property
    def spark(self) -> Column:
        return self.frame.df[self.name]

    def _cmp(self, op: str, other: Any) -> ExplainablePredicate:
        tree = Comparison(self.name, op, other)
        return ExplainablePredicate(self.frame, tree.to_spark(self.frame.df), tree)

    def __eq__(self, other: Any) -> ExplainablePredicate:  # type: ignore[override]
        return self._cmp("==", other)

    def __ne__(self, other: Any) -> ExplainablePredicate:  # type: ignore[override]
        return self._cmp("!=", other)

    def __le__(self, other: Any) -> ExplainablePredicate:
        return self._cmp("<=", other)

    def __lt__(self, other: Any) -> ExplainablePredicate:
        return self._cmp("<", other)

    def __ge__(self, other: Any) -> ExplainablePredicate:
        return self._cmp(">=", other)

    def __gt__(self, other: Any) -> ExplainablePredicate:
        return self._cmp(">", other)

    def isin(self, values) -> ExplainablePredicate:
        return self._cmp("in", tuple(values))

    def between(self, lo, hi) -> ExplainablePredicate:
        return self._cmp("between", (lo, hi))

    def isna(self) -> ExplainablePredicate:
        return self._cmp("isnull", None)

    def notna(self) -> ExplainablePredicate:
        return self._cmp("notnull", None)

    def str_contains(self, pat: str) -> ExplainablePredicate:
        return self._cmp("contains", pat)

    def str_startswith(self, pat: str) -> ExplainablePredicate:
        return self._cmp("startswith", pat)

    # -- arithmetic (untracked projections) --------------------------------
    def __add__(self, other):
        return self.spark + _unwrap(other)

    def __sub__(self, other):
        return self.spark - _unwrap(other)

    def __mul__(self, other):
        return self.spark * _unwrap(other)

    def __truediv__(self, other):
        return self.spark / _unwrap(other)

    def __rsub__(self, other):
        return _unwrap(other) - self.spark

    def __radd__(self, other):
        return _unwrap(other) + self.spark

    def __rmul__(self, other):
        return _unwrap(other) * self.spark

    # -- series-level operators --------------------------------------------
    def explain(self, explainer: str = "fedex", **kwargs):
        """Series-level explain (reference core/explainable_series.py:289-420):
        delegates to the owning frame's captured operation — the reference's
        ExpSeries.explain also explains the frame's last tracked op, the
        series itself only narrows what is displayed."""
        return self.frame.explain(explainer=explainer, **kwargs)

    def to_html(self, n: int = 20) -> str:
        """Render as a one-column table (reference
        core/explainable_series.py:421-427 renders Series via the frame
        path for display consistency)."""
        return self.frame.df.select(self.name).limit(n).toPandas().to_html()

    def b_join(self, other, on=None, how: str = "left"):
        """Series-level boolean-query join (reference R8 series flavor,
        core/explainable_series.py:112-163): the series is narrowed to a
        (join keys, value) frame carrying the owning frame's name, then
        joined with the frame-level prefix contract — non-key columns come
        out as ``<frame_name>_<col>`` on both sides, exactly like the
        reference's ``left_name + "_" + col`` renaming, and the result
        records a BJoinOp so ``explain()`` routes to the join explainers.

        ``other`` may be an ExplainableDataFrame or another
        ExplainableColumn (the reference requires a named Series; ours are
        always named by construction).
        """
        from .frame import ExplainableDataFrame

        if on is None:
            raise ValueError(
                "series b_join requires `on` (Spark frames have no index to join on)"
            )
        keys = [on] if isinstance(on, str) else list(on)

        def narrowed(col: "ExplainableColumn") -> ExplainableDataFrame:
            missing = [k for k in keys if k not in col.frame.df.columns]
            if missing:
                raise KeyError(f"join key(s) {missing} not in frame {col.frame.name!r}")
            cols = keys + ([col.name] if col.name not in keys else [])
            return ExplainableDataFrame(
                col.frame.df.select(*cols), name=col.frame.name
            )

        left = narrowed(self)
        right = narrowed(other) if isinstance(other, ExplainableColumn) else other
        return left.b_join(right, on=on, how=how)

    def std_int(self, grouped, target) -> float:
        """Standardized deviation of ``target``'s aggregated value from
        the mean of all groups: |v_target - mean(v)| / std(v)
        (reference core/explainable_series.py:103-104, which computes it
        over a pandas Series of per-group means).

        ``grouped`` is a two-column (group, value) result — an
        ExplainableDataFrame (e.g. ``df.groupby(k)[v].mean()``) or a
        plain Spark DataFrame. Computed in ONE aggregate pass (mean,
        sample std and the target's value share a single job); returns
        0.0 when the std is 0/undefined, like the reference's
        error-swallowing contract."""
        sdf = getattr(grouped, "df", grouped)
        key_col, val_col = sdf.columns[0], sdf.columns[1]
        row = sdf.agg(
            F.avg(val_col).alias("m"),
            F.stddev_samp(val_col).alias("s"),
            F.max(
                F.when(F.col(key_col).cast("string") == str(target), F.col(val_col))
            ).alias("t"),
        ).first()
        if row["s"] is None or row["s"] == 0 or row["t"] is None or row["m"] is None:
            return 0.0
        return abs(row["t"] - row["m"]) / row["s"]

    def calc_influence_std(self, df_agg, df_ex, g_att, g_agg, target) -> float:
        """Influence of an exclusion on the target group's standardized
        deviation (reference core/explainable_series.py:106-110):
        |std_int(df_ex.groupby(g_att)[g_agg].mean(), target) -
        std_int(df_agg, target)|; 0 on any failure, per the reference."""
        try:
            ex_sdf = getattr(df_ex, "df", df_ex)
            regrouped = ex_sdf.groupBy(g_att).agg(F.avg(g_agg).alias(g_agg))
            return abs(self.std_int(regrouped, target) - self.std_int(df_agg, target))
        except Exception:
            return 0.0

    def explain_outlier(self, target, dir: str | int = "high", **kwargs):
        """Convenience entry to the outlier explainer on the owning
        grouped frame (reference core/explainable_series.py:165-220 runs
        the bin-removal scan inline; here it routes to
        explainers/outlier.py, which runs the same algebra as one
        distributed aggregation over sum/count/sumsq partials)."""
        return self.frame.explain(
            explainer="outlier", target=target, dir=dir, **kwargs
        )

    def value_counts(self, normalize: bool = False, ascending: bool = False):
        """Reference R15 (core/explainable_series.py:80-100):
        groupBy(col).count() ordered by count."""
        from .frame import ExplainableDataFrame

        counts = self.frame.df.groupBy(self.name).agg(F.count(F.lit(1)).alias("count"))
        if normalize:
            # scalar-subquery cross join, NOT Window.partitionBy(): a global
            # window funnels every group through one task, a broadcast of the
            # single total row keeps the division fully parallel at high
            # group cardinality
            total = counts.agg(F.sum("count").alias("__total"))
            counts = (
                counts.crossJoin(F.broadcast(total))
                .withColumn("proportion", F.col("count") / F.col("__total"))
                .drop("count", "__total")
            )
            order_col = "proportion"
        else:
            order_col = "count"
        counts = counts.orderBy(F.col(order_col).asc() if ascending else F.col(order_col).desc())
        return ExplainableDataFrame(counts, name=f"{self.frame.name}.{self.name}.value_counts")

    def _scalar_agg(self, agg: str, ddof: int = 1):
        """Whole-column scalar aggregation (reference ExpSeries named aggs,
        core/explainable_series.py) — one Spark agg, returns a Python scalar.
        Numeric-only aggs raise TypeError on non-numeric columns, matching
        pandas (the reference's *_should_fail series tests assert this —
        Spark would silently return NULL for avg(string))."""
        from ..operators.aggregates import NUMERIC_ONLY, agg_column, is_numeric_type

        if agg in NUMERIC_ONLY:
            dtype = dict((f.name, f.dataType) for f in self.frame.df.schema.fields)[self.name]
            if not is_numeric_type(dtype):
                raise TypeError(f"cannot compute {agg!r} on non-numeric column {self.name!r} ({dtype.simpleString()})")
        return self.frame.df.agg(agg_column(self.name, agg, ddof=ddof).alias("v")).first()["v"]

    def drop_duplicates(self):
        """Series drop_duplicates (reference core/explainable_series.py:222-229):
        distinct values of this column, as a single-column frame."""
        from .frame import ExplainableDataFrame

        return ExplainableDataFrame(
            self.frame.df.select(self.name).distinct(),
            name=f"{self.frame.name}.{self.name}",
        )

    def size(self) -> int:
        """Row count including NULLs (pandas Series.size)."""
        return self.frame.df.count()

    def mean(self):
        return self._scalar_agg("mean")

    def median(self):
        return self._scalar_agg("median")

    def std(self, ddof: int = 1):
        return self._scalar_agg("std", ddof)

    def var(self, ddof: int = 1):
        return self._scalar_agg("var", ddof)

    def sem(self, ddof: int = 1):
        return self._scalar_agg("sem", ddof)

    def sum(self):
        return self._scalar_agg("sum")

    def prod(self):
        return self._scalar_agg("prod")

    def min(self):
        return self._scalar_agg("min")

    def max(self):
        return self._scalar_agg("max")

    def count(self):
        return self._scalar_agg("count")

    def mode(self):
        """pandas Series.mode: the most frequent value(s) — ties all
        kept, sorted ascending, NULLs excluded (pandas' dropna=True
        default). One map-combining value count, a broadcast of the
        single max-count row, and a filter — the mode set is never
        found by sorting the data. Returns an ExplainableDataFrame of
        one column (this column's name), like value_counts."""
        from .frame import ExplainableDataFrame

        counts = (
            self.frame.df.filter(F.col(self.name).isNotNull())
            .groupBy(self.name)
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        mx = counts.agg(F.max("__cnt").alias("__mx"))
        out = (
            counts.crossJoin(F.broadcast(mx))
            .filter(F.col("__cnt") == F.col("__mx"))
            .select(self.name)
            .orderBy(self.name)
        )
        return ExplainableDataFrame(out, name=f"{self.frame.name}.{self.name}.mode")

    def quantile(self, q: float = 0.5):
        """pandas Series.quantile (linear interpolation) — exact
        ``percentile`` agg, one job, scalar out."""
        from ..operators.aggregates import is_numeric_type

        dtype = dict((f.name, f.dataType) for f in self.frame.df.schema.fields)[self.name]
        if not is_numeric_type(dtype):
            raise TypeError(f"cannot compute quantile on non-numeric column {self.name!r}")
        return self.frame.df.agg(
            F.percentile(F.col(self.name), F.lit(float(q))).alias("v")
        ).first()["v"]

    def fillna(self, value) -> Column:
        """Expression form (like the arithmetic operators): use with
        ``df.withColumn`` or a projection."""
        return F.coalesce(self.spark, F.lit(value))

    def clip(self, lower=None, upper=None) -> Column:
        c = self.spark
        if lower is not None:
            c = F.greatest(c, F.lit(lower))
        if upper is not None:
            c = F.least(c, F.lit(upper))
        return c

    @property
    def str(self) -> "_StrAccessor":
        """pandas ``.str`` accessor. Boolean tests (contains/startswith/
        endswith/match) return lineage-recorded predicates — usable as
        masks with full explainer support; transforms return plain Spark
        Columns (projection, untracked, like arithmetic)."""
        return _StrAccessor(self)

    @property
    def dt(self) -> "_DtAccessor":
        """pandas ``.dt`` accessor: datetime part extraction as JVM
        expressions (no UDFs)."""
        return _DtAccessor(self)

    def cut(self, bins: list, labels: list | None = None) -> Column:
        """pandas ``pd.cut`` with explicit edges: right-closed intervals
        (lo, hi], values outside the edges → NULL. A when-chain, pure
        codegen. Default labels are pandas' interval strings."""
        if len(bins) < 2:
            raise ValueError("cut needs at least two bin edges")
        if labels is not None and len(labels) != len(bins) - 1:
            raise ValueError("labels must have len(bins) - 1 entries")
        c = self.spark
        expr = F.lit(None).cast("string")
        for i in range(len(bins) - 1):
            lo, hi = bins[i], bins[i + 1]
            lab = labels[i] if labels is not None else f"({lo}, {hi}]"
            expr = F.when((c > F.lit(lo)) & (c <= F.lit(hi)), F.lit(str(lab))).otherwise(expr)
        return expr

    def qcut(self, q: int | list, labels: list | None = None) -> Column:
        """pandas ``pd.qcut``: quantile-edge binning. ONE exact
        ``percentile`` aggregation computes every edge, then delegates to
        cut(); the lowest edge is widened a hair so the minimum lands in
        the first bin, exactly as pandas does."""
        fracs = (
            [i / q for i in range(q + 1)]
            if isinstance(q, int)
            else [float(x) for x in q]
        )
        row = self.frame.df.agg(
            *[
                F.percentile(self.spark, F.lit(p)).alias(f"q{i}")
                for i, p in enumerate(fracs)
            ]
        ).first()
        edges = [row[f"q{i}"] for i in range(len(fracs))]
        edges[0] = edges[0] - abs(edges[0]) * 1e-3 - 1e-9
        return self.cut(edges, labels=labels)

    def unique(self, limit: int | None = 1_000_000):
        """Distinct values as a driver-side list (pandas ``Series.unique``
        parity, which is inherently a materialization).

        ``limit`` caps the collect so a high-cardinality column (doc ids,
        timestamps) cannot OOM the driver at corpus scale — it raises if
        the distinct count exceeds the cap rather than truncating
        silently. Pass ``limit=None`` to opt out (you are asserting the
        column is low-cardinality). Same escape-hatch contract as
        ``get_dummies(values=...)``.
        """
        dist = self.frame.df.select(self.name).distinct()
        if limit is not None:
            rows = dist.limit(limit + 1).collect()
            if len(rows) > limit:
                raise ValueError(
                    f"unique() on {self.name!r} exceeds limit={limit} distinct "
                    "values; pass a higher limit or limit=None if the driver "
                    "can hold them"
                )
            return [r[0] for r in rows]
        return [r[0] for r in dist.collect()]

    def nunique(self) -> int:
        return self.frame.df.select(F.count_distinct(self.name)).first()[0]

    def to_frame(self) -> "ExplainableDataFrame":
        from .frame import ExplainableDataFrame

        return ExplainableDataFrame(
            self.frame.df.select(self.name), name=f"{self.frame.name}.{self.name}"
        )

    def __repr__(self) -> str:
        return f"ExplainableColumn({self.frame.name}.{self.name})"


def _unwrap(x):
    return x.spark if isinstance(x, ExplainableColumn) else x


class _StrAccessor:
    """pandas ``Series.str`` parity over a string column.

    Boolean tests return ExplainablePredicate (the reference records
    string-mask filters too — ExpSeries inherits pandas .str); transforms
    return Spark Columns that stay inside whole-stage codegen.
    """

    def __init__(self, col: ExplainableColumn):
        self._col = col

    def _pred(self, op: str, value) -> ExplainablePredicate:
        tree = Comparison(self._col.name, op, value)
        return ExplainablePredicate(self._col.frame, tree.to_spark(self._col.frame.df), tree)

    # boolean tests — lineage-recorded
    def contains(self, pat: str, regex: bool = False) -> ExplainablePredicate:
        return self._pred("rlike" if regex else "contains", pat)

    def startswith(self, pat: str) -> ExplainablePredicate:
        return self._pred("startswith", pat)

    def endswith(self, pat: str) -> ExplainablePredicate:
        return self._pred("endswith", pat)

    def match(self, pat: str) -> ExplainablePredicate:
        # pandas match anchors at the start
        pat = pat if pat.startswith("^") else f"^{pat}"
        return self._pred("rlike", pat)

    def isdigit(self) -> ExplainablePredicate:
        return self._pred("rlike", r"^[0-9]+$")

    # transforms — plain Columns
    def lower(self) -> Column:
        return F.lower(self._col.spark)

    def upper(self) -> Column:
        return F.upper(self._col.spark)

    def strip(self) -> Column:
        return F.trim(self._col.spark)

    def len(self) -> Column:
        return F.length(self._col.spark)

    def slice(self, start: int = 0, stop: int | None = None) -> Column:
        # pandas 0-based [start, stop) → SQL 1-based substring(pos, len)
        length = F.lit(2_147_483_647) if stop is None else F.lit(max(stop - start, 0))
        return F.substring(self._col.spark, start + 1, length)

    def replace(self, pat: str, repl: str, regex: bool = False) -> Column:
        if regex:
            return F.regexp_replace(self._col.spark, pat, repl)
        return F.replace(self._col.spark, F.lit(pat), F.lit(repl))

    def extract(self, pat: str, group: int = 1) -> Column:
        return F.regexp_extract(self._col.spark, pat, group)

    def split(self, pat: str = r"\s+") -> Column:
        return F.split(self._col.spark, pat)

    def pad(self, width: int, side: str = "left", fillchar: str = " ") -> Column:
        fn = F.lpad if side == "left" else F.rpad
        return fn(self._col.spark, width, fillchar)

    def zfill(self, width: int) -> Column:
        return F.lpad(self._col.spark, width, "0")

    def title(self) -> Column:
        return F.initcap(self._col.spark)


class _DtAccessor:
    """pandas ``Series.dt`` parity: JVM datetime part extraction."""

    def __init__(self, col: ExplainableColumn):
        self._col = col

    @property
    def year(self) -> Column:
        return F.year(self._col.spark)

    @property
    def month(self) -> Column:
        return F.month(self._col.spark)

    @property
    def day(self) -> Column:
        return F.dayofmonth(self._col.spark)

    @property
    def hour(self) -> Column:
        return F.hour(self._col.spark)

    @property
    def minute(self) -> Column:
        return F.minute(self._col.spark)

    @property
    def second(self) -> Column:
        return F.second(self._col.spark)

    @property
    def dayofweek(self) -> Column:
        # pandas: Monday=0..Sunday=6; Spark dayofweek: Sunday=1..Saturday=7
        return (F.dayofweek(self._col.spark) + 5) % 7

    @property
    def dayofyear(self) -> Column:
        return F.dayofyear(self._col.spark)

    @property
    def quarter(self) -> Column:
        return F.quarter(self._col.spark)

    @property
    def date(self) -> Column:
        return F.to_date(self._col.spark)

    @property
    def month_name(self) -> Column:
        return F.date_format(self._col.spark, "MMMM")

    @property
    def day_name(self) -> Column:
        return F.date_format(self._col.spark, "EEEE")

    def floor(self, freq: str) -> Column:
        unit = {"H": "hour", "D": "day", "T": "minute", "min": "minute", "S": "second"}.get(freq, freq)
        return F.date_trunc(unit, self._col.spark)
