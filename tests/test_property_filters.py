"""Property-based differential testing of predicate capture.

Hypothesis generates random predicate trees (comparisons, between/isin,
conjunction/disjunction/negation) over lineitem; each tree is compiled
BOTH through the tracked ExplainableDataFrame filter API and to a SQL
WHERE clause for DuckDB, then row count + an order-insensitive key
checksum must agree. This covers the operator lattice of SURVEY §2.5
(R2's captured predicate grammar) far beyond the hand-written cases.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NUM_COLS = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 100000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}
STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
CMP_OPS = ["<", "<=", ">", ">=", "==", "!="]


def _leaf_strategy():
    num = st.tuples(
        st.just("cmp_num"),
        st.sampled_from(sorted(NUM_COLS)),
        st.sampled_from(CMP_OPS),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    )
    s = st.tuples(
        st.just("cmp_str"),
        st.sampled_from(sorted(STR_COLS)),
        st.sampled_from(["==", "!="]),
        st.integers(min_value=0, max_value=2),
    )
    btw = st.tuples(
        st.just("between"),
        st.sampled_from(sorted(NUM_COLS)),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    )
    isin = st.tuples(
        st.just("isin"),
        st.sampled_from(sorted(STR_COLS)),
        st.lists(st.integers(min_value=0, max_value=2), min_size=1, max_size=3),
    )
    return st.one_of(num, s, btw, isin)


def _tree_strategy():
    return st.recursive(
        _leaf_strategy(),
        lambda kids: st.one_of(
            st.tuples(st.just("and"), kids, kids),
            st.tuples(st.just("or"), kids, kids),
            st.tuples(st.just("not"), kids),
        ),
        max_leaves=4,
    )


def _scale(col: str, u: float) -> float:
    lo, hi = NUM_COLS[col]
    return round(lo + (hi - lo) * u, 4)


def _to_edf_pred(df, node):
    kind = node[0]
    if kind == "cmp_num":
        _, col, op, u = node
        v = _scale(col, u)
        c = df[col]
        return {
            "<": c < v, "<=": c <= v, ">": c > v,
            ">=": c >= v, "==": c == v, "!=": c != v,
        }[op]
    if kind == "cmp_str":
        _, col, op, i = node
        v = STR_COLS[col][i % len(STR_COLS[col])]
        return (df[col] == v) if op == "==" else (df[col] != v)
    if kind == "between":
        _, col, u1, u2 = node
        lo, hi = sorted((_scale(col, u1), _scale(col, u2)))
        return df[col].between(lo, hi)
    if kind == "isin":
        _, col, idxs = node
        vals = sorted({STR_COLS[col][i % len(STR_COLS[col])] for i in idxs})
        return df[col].isin(vals)
    if kind == "and":
        return _to_edf_pred(df, node[1]) & _to_edf_pred(df, node[2])
    if kind == "or":
        return _to_edf_pred(df, node[1]) | _to_edf_pred(df, node[2])
    if kind == "not":
        return ~_to_edf_pred(df, node[1])
    raise AssertionError(kind)


def _to_sql(node) -> str:
    kind = node[0]
    if kind == "cmp_num":
        _, col, op, u = node
        sqlop = {"==": "=", "!=": "<>"}.get(op, op)
        return f"({col} {sqlop} {_scale(col, u)})"
    if kind == "cmp_str":
        _, col, op, i = node
        sqlop = "=" if op == "==" else "<>"
        return f"({col} {sqlop} '{STR_COLS[col][i % len(STR_COLS[col])]}')"
    if kind == "between":
        _, col, u1, u2 = node
        lo, hi = sorted((_scale(col, u1), _scale(col, u2)))
        return f"({col} BETWEEN {lo} AND {hi})"
    if kind == "isin":
        _, col, idxs = node
        vals = ", ".join(f"'{v}'" for v in sorted({STR_COLS[col][i % len(STR_COLS[col])] for i in idxs}))
        return f"({col} IN ({vals}))"
    if kind == "and":
        return f"({_to_sql(node[1])} AND {_to_sql(node[2])})"
    if kind == "or":
        return f"({_to_sql(node[1])} OR {_to_sql(node[2])})"
    if kind == "not":
        return f"(NOT {_to_sql(node[1])})"
    raise AssertionError(kind)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=_tree_strategy())
def test_random_predicates_match_oracle(lineitem, duck, tree):
    out = lineitem[_to_edf_pred(lineitem, tree)]
    got = out.df.agg(
        {"l_orderkey": "count"}
    ).first()[0], out.df.agg({"l_orderkey": "sum"}).first()[0]
    want = duck.sql(
        f"SELECT count(l_orderkey), sum(l_orderkey) FROM lineitem WHERE {_to_sql(tree)}"
    ).fetchone()
    assert got[0] == want[0]
    assert (got[1] or 0) == (want[1] or 0)


# ---------------------------------------------------------------------------
# pandas-style query STRINGS: random expressions through parse_query_string
# must equal the same predicate built via the bracket-mask API
# ---------------------------------------------------------------------------

_QS_LEAF = st.one_of(
    st.tuples(
        st.just("num"),
        st.sampled_from(sorted(NUM_COLS)),
        st.sampled_from(CMP_OPS),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    ),
    st.tuples(
        st.just("in"),
        st.sampled_from(sorted(STR_COLS)),
        st.lists(st.integers(min_value=0, max_value=2), min_size=1, max_size=3),
    ),
    st.tuples(
        st.just("chain"),
        st.sampled_from(sorted(NUM_COLS)),
        st.floats(min_value=0.0, max_value=0.5, allow_nan=False),
        st.floats(min_value=0.5, max_value=1.0, allow_nan=False),
    ),
)


def _qs_leaf_to_parts(leaf):
    kind = leaf[0]
    if kind == "num":
        _, col, op, t = leaf
        lo, hi = NUM_COLS[col]
        v = round(lo + t * (hi - lo), 3)
        py_op = {"<": "<", "<=": "<=", ">": ">", ">=": ">=", "==": "==", "!=": "!="}[op]
        return f"{col} {py_op} {v}", f"{col} {op} {v}"
    if kind == "in":
        _, col, idxs = leaf
        opts = STR_COLS[col]
        vals = sorted({opts[i % len(opts)] for i in idxs})
        return f"{col} in {vals!r}", f"{col} IN ({', '.join(repr(v) for v in vals)})"
    _, col, t1, t2 = leaf
    lo, hi = NUM_COLS[col]
    a, b = round(lo + t1 * (hi - lo), 3), round(lo + t2 * (hi - lo), 3)
    return f"{a} <= {col} < {b}", f"({col} >= {a} AND {col} < {b})"


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    leaves=st.lists(_QS_LEAF, min_size=1, max_size=3),
    ops=st.lists(st.sampled_from(["and", "or"]), min_size=2, max_size=2),
    negate=st.booleans(),
)
def test_query_string_matches_duckdb(lineitem, duck, leaves, ops, negate):
    parts = [_qs_leaf_to_parts(leaf) for leaf in leaves]
    py = parts[0][0]
    sql = parts[0][1]
    for (p, s), op in zip(parts[1:], ops):
        py = f"({py}) {op} ({p})"
        sql = f"({sql}) {'AND' if op == 'and' else 'OR'} ({s})"
    if negate:
        py, sql = f"not ({py})", f"NOT ({sql})"
    got = lineitem.query(py).df.count()
    want = duck.sql(f"SELECT count(*) FROM lineitem WHERE {sql}").fetchone()[0]
    assert got == want
