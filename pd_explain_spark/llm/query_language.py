"""The constrained query mini-language of the automated-exploration loop
(SURVEY.md §2.3; reference automated_data_exploration.py:62-75).

Grammar (the de-facto spec from the reference's system prompt):

    query    := filter* group?
    filter   := '[' cond ']'
    cond     := df['col'] CMP literal | '(' cond ')' | cond '&' cond | cond '|' cond | '~' cond
    group    := ".groupby('col' | [cols])" ( "['col']" | "[[cols]]" )? '.' aggcall
    aggcall  := one of mean sum count nunique min max median std sem var size prod
                | agg({col: fn, ...})

The reference executes queries with ``eval(f"df{query}")``
(automated_data_exploration.py:352-366). We parse the string with
Python's ``ast`` module and *interpret* the tree against the
ExplainableDataFrame wrapper — nothing is ever eval'd, and only the
whitelisted constructs above are accepted, so LLM-generated text cannot
reach arbitrary code paths (never eval on an executor — SURVEY §2.3).

Includes the bracket-repair pass (ibid:301-350) as a light-touch
balance fix.
"""

from __future__ import annotations

import ast
from typing import Any

ALLOWED_AGGS = {
    "mean", "sum", "count", "nunique", "min", "max",
    "median", "std", "sem", "var", "size", "prod",
}

_CMP = {
    ast.Gt: "__gt__", ast.GtE: "__ge__", ast.Lt: "__lt__",
    ast.LtE: "__le__", ast.Eq: "__eq__", ast.NotEq: "__ne__",
}


class QueryParseError(ValueError):
    pass


def repair_brackets(query: str) -> str:
    """Balance [] and () the way the reference's repair pass does
    (automated_data_exploration.py:301-350): drop unmatched closers,
    append missing closers."""
    out: list[str] = []
    stack: list[str] = []
    pairs = {")": "(", "]": "["}
    in_str: str | None = None
    for ch in query:
        if in_str:
            out.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
            out.append(ch)
            continue
        if ch in "([":
            stack.append(ch)
            out.append(ch)
        elif ch in ")]":
            if stack and stack[-1] == pairs[ch]:
                stack.pop()
                out.append(ch)
            # else: unmatched closer — drop it
        else:
            out.append(ch)
    closers = {"(": ")", "[": "]"}
    while stack:
        out.append(closers[stack.pop()])
    return "".join(out)


def validate_query(query: str) -> str:
    """Parse-check a query string; returns the repaired form or raises."""
    q = repair_brackets(query.strip())
    tree = _parse(q)
    _Walker(frame=None, validate_only=True).visit_node(tree)
    return q


def execute_query(frame, query: str):
    """Run a mini-language query against an ExplainableDataFrame.

    Returns whatever the chain produces: an ExplainableDataFrame (filters)
    or the aggregated ExplainableDataFrame (groupby+agg) — lineage captured
    by the wrapper exactly as for hand-written calls.
    """
    q = repair_brackets(query.strip())
    tree = _parse(q)
    return _Walker(frame=frame).visit_node(tree)


def _parse(q: str) -> ast.expr:
    try:
        mod = ast.parse(f"df{q}", mode="eval")
    except SyntaxError as e:
        raise QueryParseError(f"unparseable query {q!r}: {e}") from None
    return mod.body


class _Walker:
    """Interprets the whitelisted AST against the wrapper (or just checks
    shape when validate_only)."""

    def __init__(self, frame, validate_only: bool = False):
        self.frame = frame
        self.validate_only = validate_only

    # -- entry ---------------------------------------------------------------
    def visit_node(self, node: ast.expr):
        if isinstance(node, ast.Name):
            if node.id != "df":
                raise QueryParseError(f"unknown name {node.id!r}")
            return self.frame
        if isinstance(node, ast.Subscript):
            base = self.visit_node(node.value)
            return self._subscript(base, node.slice)
        if isinstance(node, ast.Call):
            return self._call(node)
        raise QueryParseError(f"disallowed construct {ast.dump(node)[:60]}")

    # -- df[...] -------------------------------------------------------------
    def _subscript(self, base, sl: ast.expr):
        if isinstance(sl, ast.Constant) and isinstance(sl.value, str):
            return None if self.validate_only else base[sl.value]
        if isinstance(sl, (ast.List, ast.Tuple)):
            cols = [self._const_str(e) for e in sl.elts]
            return None if self.validate_only else base[cols]
        # boolean condition
        pred = self._condition(sl)
        return None if self.validate_only else base[pred]

    def _condition(self, node: ast.expr):
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1 or len(node.comparators) != 1:
                raise QueryParseError("chained comparisons not allowed")
            col = self._column_ref(node.left)
            op = type(node.ops[0])
            if op not in _CMP:
                raise QueryParseError(f"comparison {op.__name__} not allowed")
            lit = self._literal(node.comparators[0])
            return None if self.validate_only else getattr(col, _CMP[op])(lit)
        if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.BitAnd, ast.BitOr)):
            l = self._condition(node.left)
            r = self._condition(node.right)
            if self.validate_only:
                return None
            return (l & r) if isinstance(node.op, ast.BitAnd) else (l | r)
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Invert):
            c = self._condition(node.operand)
            return None if self.validate_only else ~c
        if isinstance(node, ast.Call):
            # df['col'].isin([...]) / .between(a, b) inside a condition
            return self._call(node, in_condition=True)
        raise QueryParseError(f"disallowed condition {ast.dump(node)[:60]}")

    def _column_ref(self, node: ast.expr):
        if (
            isinstance(node, ast.Subscript)
            and isinstance(node.value, ast.Name)
            and node.value.id == "df"
            and isinstance(node.slice, ast.Constant)
            and isinstance(node.slice.value, str)
        ):
            return None if self.validate_only else self.frame[node.slice.value]
        raise QueryParseError("condition left side must be df['col']")

    # -- calls ---------------------------------------------------------------
    def _call(self, node: ast.Call, in_condition: bool = False):
        if not isinstance(node.func, ast.Attribute):
            raise QueryParseError("only method calls are allowed")
        name = node.func.attr
        if in_condition:
            if name not in ("isin", "between"):
                raise QueryParseError(f"condition method {name!r} not allowed")
            col = self._column_ref(node.func.value)
            args = [self._literal(a) for a in node.args]
            if self.validate_only:
                return None
            return getattr(col, name)(*args) if name == "between" else col.isin(args[0])
        if name == "groupby":
            base = self.visit_node(node.func.value)
            if len(node.args) != 1:
                raise QueryParseError("groupby takes one argument")
            by = self._str_or_list(node.args[0])
            return None if self.validate_only else base.groupby(by)
        if name in ALLOWED_AGGS:
            base = self._grouped(node.func.value)
            if node.args or node.keywords:
                raise QueryParseError(f"{name}() takes no arguments here")
            return None if self.validate_only else getattr(base, name)()
        if name in ("agg", "aggregate"):
            base = self._grouped(node.func.value)
            if len(node.args) != 1 or not isinstance(node.args[0], ast.Dict):
                raise QueryParseError("agg takes a {col: fn} dict")
            spec: dict[str, Any] = {}
            for k, v in zip(node.args[0].keys, node.args[0].values):
                col = self._const_str(k)
                if isinstance(v, (ast.List, ast.Tuple)):
                    fns = [self._const_str(e) for e in v.elts]
                else:
                    fns = [self._const_str(v)]
                bad = set(fns) - ALLOWED_AGGS
                if bad:
                    raise QueryParseError(f"agg fns not allowed: {sorted(bad)}")
                spec[col] = fns
            return None if self.validate_only else base.agg(spec)
        raise QueryParseError(f"method {name!r} not allowed")

    def _grouped(self, node: ast.expr):
        """The receiver of an agg call: groupby(...) or groupby(...)[cols]."""
        if isinstance(node, ast.Subscript):
            base = self._grouped(node.value)
            if isinstance(node.slice, ast.Constant) and isinstance(node.slice.value, str):
                return None if self.validate_only else base[node.slice.value]
            if isinstance(node.slice, (ast.List, ast.Tuple)):
                cols = [self._const_str(e) for e in node.slice.elts]
                return None if self.validate_only else base[cols]
            raise QueryParseError("projection on grouped object must be str or list")
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) and node.func.attr == "groupby":
            return self._call(node)
        raise QueryParseError("aggregation must follow a groupby")

    # -- literals ------------------------------------------------------------
    def _literal(self, node: ast.expr):
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float, str, bool)):
            return node.value
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            v = self._literal(node.operand)
            if isinstance(v, (int, float)):
                return -v
        if isinstance(node, (ast.List, ast.Tuple)):
            return [self._literal(e) for e in node.elts]
        raise QueryParseError("only int/float/str/bool literals allowed")

    def _const_str(self, node: ast.expr) -> str:
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            return node.value
        raise QueryParseError("expected a string literal")

    def _str_or_list(self, node: ast.expr):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            return node.value
        if isinstance(node, (ast.List, ast.Tuple)):
            return [self._const_str(e) for e in node.elts]
        raise QueryParseError("groupby argument must be a string or list of strings")
