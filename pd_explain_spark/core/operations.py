"""Lineage IR: the captured relational operations.

Mirrors the reference's ``fedex_generator.Operations`` constructor shapes
(reference: core/explainable_data_frame.py:706-710 Filter, :766 GroupBy,
:881/:961 Join, :1022 BJoin) but as plain dataclasses over *lazy* Spark
DataFrames — capture records the plan, no job runs until an explainer
consumes it.

The predicate tree (Comparison / BoolExpr / NotExpr) is our replacement
for the reference's string-based ``filter_query`` capture
(core/explainable_series.py:233-286): we own the API facade, so we record
a real expression tree instead of monkey-patching ``_cmp_method``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    pass

# ---------------------------------------------------------------------------
# Predicate expression tree
# ---------------------------------------------------------------------------

_OP_TO_SYMBOL = {
    "eq": "==",
    "ne": "!=",
    "le": "<=",
    "lt": "<",
    "ge": ">=",
    "gt": ">",
    "and": "&",
    "or": "|",
    "isin": "in",
    "between": "between",
    "contains": "contains",
    "startswith": "startswith",
    "isnull": "isnull",
    "notnull": "notnull",
}


@dataclass(frozen=True)
class PredicateNode:
    """Base class for recorded filter predicates."""

    def to_spark(self, df: DataFrame) -> Column:
        raise NotImplementedError

    def columns(self) -> list[str]:
        raise NotImplementedError

    def to_string(self) -> str:
        raise NotImplementedError


@dataclass(frozen=True)
class Comparison(PredicateNode):
    column: str
    op: str  # ==, !=, <=, <, >=, >, in, between, contains, startswith, endswith, rlike, isnull, notnull
    value: Any = None

    def to_spark(self, df: DataFrame) -> Column:
        c = df[self.column]
        if self.op == "==":
            return c == F.lit(self.value)
        if self.op == "!=":
            return c != F.lit(self.value)
        if self.op == "<=":
            return c <= F.lit(self.value)
        if self.op == "<":
            return c < F.lit(self.value)
        if self.op == ">=":
            return c >= F.lit(self.value)
        if self.op == ">":
            return c > F.lit(self.value)
        if self.op == "in":
            return c.isin(list(self.value))
        if self.op == "between":
            lo, hi = self.value
            return c.between(lo, hi)
        if self.op == "contains":
            return c.contains(self.value)
        if self.op == "startswith":
            return c.startswith(self.value)
        if self.op == "endswith":
            return c.endswith(self.value)
        if self.op == "rlike":
            return c.rlike(self.value)
        if self.op == "isnull":
            return c.isNull()
        if self.op == "notnull":
            return c.isNotNull()
        raise ValueError(f"unknown comparison op {self.op!r}")

    def columns(self) -> list[str]:
        return [self.column]

    def to_string(self) -> str:
        if self.op in ("isnull", "notnull"):
            return f"{self.column} {self.op}"
        return f"{self.column} {self.op} {self.value!r}"


@dataclass(frozen=True)
class BoolExpr(PredicateNode):
    op: str  # '&' or '|'
    left: PredicateNode
    right: PredicateNode

    def to_spark(self, df: DataFrame) -> Column:
        l, r = self.left.to_spark(df), self.right.to_spark(df)
        return (l & r) if self.op == "&" else (l | r)

    def columns(self) -> list[str]:
        seen: list[str] = []
        for c in self.left.columns() + self.right.columns():
            if c not in seen:
                seen.append(c)
        return seen

    def to_string(self) -> str:
        return f"({self.left.to_string()}) {self.op} ({self.right.to_string()})"


@dataclass(frozen=True)
class NotExpr(PredicateNode):
    child: PredicateNode

    def to_spark(self, df: DataFrame) -> Column:
        return ~self.child.to_spark(df)

    def columns(self) -> list[str]:
        return self.child.columns()

    def to_string(self) -> str:
        return f"~({self.child.to_string()})"


# ---------------------------------------------------------------------------
# Operations (lineage records)
# ---------------------------------------------------------------------------


@dataclass
class Operation:
    """Common lineage state: a lazy source plan, a lazy result plan, a name."""

    source: DataFrame | None = field(default=None, repr=False)
    result: DataFrame | None = field(default=None, repr=False)
    source_name: str = "df"

    @property
    def kind(self) -> str:
        return type(self).__name__

    def query_string(self) -> str:
        raise NotImplementedError


@dataclass
class FilterOp(Operation):
    """Row filter (reference Filter, core/explainable_data_frame.py:706-710).

    ``attribute`` is the primary filtered column (the reference records one);
    ``predicate`` keeps the full tree so compound filters explain correctly.
    """

    attribute: str | None = None
    op_str: str | None = None
    value: Any = None
    predicate: PredicateNode | None = None

    def query_string(self) -> str:
        if self.predicate is not None:
            return f"{self.source_name}[{self.predicate.to_string()}]"
        return f"{self.source_name}[{self.attribute} {self.op_str} {self.value!r}]"


@dataclass
class GroupByOp(Operation):
    """Group-by + aggregation (reference GroupBy, explainable_group_by_dataframe.py:52-57).

    ``agg_dict`` maps source column -> list of agg names; ``column_mapping``
    maps result column name -> (source column, agg name) including the
    ``<col>_<agg>`` naming contract.
    """

    keys: list[str] = field(default_factory=list)
    agg_dict: dict[str, list[str]] = field(default_factory=dict)
    column_mapping: dict[str, tuple[str, str]] = field(default_factory=dict)

    def query_string(self) -> str:
        return f"{self.source_name}.groupby({self.keys}).agg({self.agg_dict})"


@dataclass
class JoinOp(Operation):
    """Equi-join (reference Join, core/explainable_data_frame.py:881,961)."""

    left: DataFrame | None = field(default=None, repr=False)
    right: DataFrame | None = field(default=None, repr=False)
    on: list[str] = field(default_factory=list)
    how: str = "inner"
    left_name: str = "left"
    right_name: str = "right"

    def query_string(self) -> str:
        return f"{self.left_name}.join({self.right_name}, on={self.on}, how={self.how!r})"


@dataclass
class BJoinOp(JoinOp):
    """Boolean-query explain join (reference BJoin, core/explainable_data_frame.py:971-1030)."""

    def query_string(self) -> str:
        return f"{self.left_name}.b_join({self.right_name}, on={self.on})"


# ---------------------------------------------------------------------------
# pandas-style query-string parser (df.query("a > 3 and b == 'x'"))
# ---------------------------------------------------------------------------


class QueryStringError(ValueError):
    pass


def parse_query_string(expr: str, columns: list[str]) -> PredicateNode:
    """Parse a pandas ``DataFrame.query`` boolean expression into a
    PredicateNode tree — ast-walked against a whitelist, never eval'd
    (same discipline as the mini-language executor, SURVEY §2.3).

    Supported grammar: bare column names, literals, comparisons
    (== != < <= > >=), chained comparisons (``a < col <= b``),
    ``col in [..]`` / ``col not in [..]``, ``and`` / ``or`` / ``not``,
    parentheses. Anything else (calls, attributes, arithmetic, ``@var``)
    raises QueryStringError.
    """
    import ast as _ast

    try:
        tree = _ast.parse(expr.strip(), mode="eval").body
    except SyntaxError as e:
        raise QueryStringError(f"unparseable query: {expr!r} ({e.msg})") from None

    def lit(node: _ast.expr):
        if isinstance(node, _ast.Constant) and not isinstance(node.value, (bytes, complex)):
            return node.value
        if isinstance(node, _ast.UnaryOp) and isinstance(node.op, _ast.USub):
            inner = lit(node.operand)
            if isinstance(inner, (int, float)):
                return -inner
        if isinstance(node, (_ast.List, _ast.Tuple)):
            return [lit(e) for e in node.elts]
        raise QueryStringError(f"unsupported literal at {_ast.dump(node)[:80]}")

    _OPS = {
        _ast.Gt: ">", _ast.GtE: ">=", _ast.Lt: "<", _ast.LtE: "<=",
        _ast.Eq: "==", _ast.NotEq: "!=",
    }
    _FLIP = {">": "<", ">=": "<=", "<": ">", "<=": ">=", "==": "==", "!=": "!="}

    def colname(node: _ast.expr) -> str | None:
        if isinstance(node, _ast.Name):
            if node.id not in columns:
                raise QueryStringError(f"unknown column {node.id!r}")
            return node.id
        return None

    def single_cmp(left: _ast.expr, op: _ast.cmpop, right: _ast.expr) -> PredicateNode:
        if isinstance(op, (_ast.In, _ast.NotIn)):
            c = colname(left)
            if c is None:
                raise QueryStringError("'in' needs a column on the left")
            node: PredicateNode = Comparison(c, "in", lit(right))
            return NotExpr(node) if isinstance(op, _ast.NotIn) else node
        if type(op) not in _OPS:
            raise QueryStringError(f"unsupported operator {type(op).__name__}")
        lc, rc = colname(left), colname(right)
        if lc is not None and rc is None:
            return Comparison(lc, _OPS[type(op)], lit(right))
        if lc is None and rc is not None:  # 5 < col  →  col > 5
            return Comparison(rc, _FLIP[_OPS[type(op)]], lit(left))
        raise QueryStringError("comparison needs exactly one column side")

    def walk(node: _ast.expr) -> PredicateNode:
        if isinstance(node, _ast.BoolOp):
            sym = "&" if isinstance(node.op, _ast.And) else "|"
            out = walk(node.values[0])
            for v in node.values[1:]:
                out = BoolExpr(sym, out, walk(v))
            return out
        if isinstance(node, _ast.UnaryOp) and isinstance(node.op, _ast.Not):
            return NotExpr(walk(node.operand))
        if isinstance(node, _ast.Compare):
            parts = []
            left = node.left
            for op, right in zip(node.ops, node.comparators):
                parts.append(single_cmp(left, op, right))
                left = right
            out = parts[0]
            for p in parts[1:]:
                out = BoolExpr("&", out, p)
            return out
        raise QueryStringError(f"unsupported syntax at {_ast.dump(node)[:80]}")

    return walk(tree)
