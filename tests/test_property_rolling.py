"""Property-based differential testing of the bucketed global-order paths.

The no-`by` variants of cumsum / shift / rolling / rank repair
cross-bucket dependencies with carries and ghost rows
(operators/rolling.py) — exactly the code where subtle semantics bugs
live (ties at bucket boundaries, duplicate order keys, tiny buckets).
Hypothesis generates random integer frames with HEAVY duplication in the
order column and small num_buckets so every boundary path is exercised,
then compares against pandas computed on the same rows.

Determinism note: with duplicate order keys the engine breaks ties by all
remaining columns, so the pandas oracle sorts by the same composite key.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pd_explain_spark.operators.rolling import cumagg_col, rank_col, shift_col

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),   # order key: heavy ties
        st.integers(min_value=-50, max_value=50), # value
    ),
    min_size=4,
    max_size=60,
)


def _frame(spark, rows):
    # unique rid makes the tie-break total so spark/pandas agree exactly
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    return (
        spark.createDataFrame(data, "rid long, k long, v long"),
        pd.DataFrame(data, columns=["rid", "k", "v"]),
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS, agg=st.sampled_from(["sum", "max", "min"]))
def test_cumagg_bucketed_matches_pandas(spark, rows, agg):
    df, pdf = _frame(spark, rows)
    got = {
        r["rid"]: r["out"]
        for r in cumagg_col(df, "v", on="k", agg=agg, out_name="out", num_buckets=4).collect()
    }
    spdf = pdf.sort_values(["k", "rid", "v"]).reset_index(drop=True)
    want = dict(zip(spdf["rid"], getattr(spdf["v"], f"cum{agg}")()))
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS, periods=st.integers(min_value=1, max_value=5))
def test_shift_bucketed_matches_pandas(spark, rows, periods):
    df, pdf = _frame(spark, rows)
    got = {
        r["rid"]: r["out"]
        for r in shift_col(df, "v", on="k", periods=periods, out_name="out", num_buckets=4).collect()
    }
    spdf = pdf.sort_values(["k", "rid", "v"]).reset_index(drop=True)
    shifted = spdf["v"].shift(periods)
    want = {
        rid: (None if pd.isna(x) else int(x))
        for rid, x in zip(spdf["rid"], shifted)
    }
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS, method=st.sampled_from(["min", "dense", "first"]))
def test_rank_bucketed_matches_pandas(spark, rows, method):
    df, pdf = _frame(spark, rows)
    got = {
        r["rid"]: r["out"]
        for r in rank_col(df, "v", method=method, out_name="out", num_buckets=4).collect()
    }
    if method == "first":
        # pandas rank(method='first') breaks ties by position; the engine
        # breaks them by the remaining columns — sort so both agree
        spdf = pdf.sort_values(["v", "rid", "k"]).reset_index(drop=True)
        want = dict(zip(spdf["rid"], (spdf.index + 1)))
    else:
        want = {
            rid: int(x)
            for rid, x in zip(pdf["rid"], pdf["v"].rank(method=method).astype(int))
        }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS, width=st.integers(min_value=2, max_value=6))
def test_rolling_rows_bucketed_matches_pandas(spark, rows, width):
    from pd_explain_spark.operators.rolling import rolling_agg

    df, pdf = _frame(spark, rows)
    got = {
        r["rid"]: r["out"]
        for r in rolling_agg(
            df, on="k", window=width, aggs={"out": ("v", "sum")}, num_buckets=4
        ).collect()
    }
    spdf = pdf.sort_values(["k", "rid", "v"]).reset_index(drop=True)
    want = dict(zip(spdf["rid"], spdf["v"].rolling(width, min_periods=1).sum().astype(int)))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=ROWS,
    alpha=st.sampled_from([0.05, 0.3, 0.7, 0.95]),
    method=st.sampled_from(["max", "average"]),
)
def test_rank_max_average_bucketed_matches_pandas(spark, rows, alpha, method):
    df, pdf = _frame(spark, rows)
    got = {
        r["rid"]: r["out"]
        for r in rank_col(df, "v", method=method, out_name="out", num_buckets=4).collect()
    }
    want = dict(zip(pdf["rid"], pdf["v"].rank(method=method)))
    assert {k: float(v) for k, v in got.items()} == {
        k: float(v) for k, v in want.items()
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS, alpha=st.sampled_from([0.05, 0.3, 0.7, 0.95]))
def test_ewm_bucketed_matches_pandas(spark, rows, alpha):
    """Keyless ewm (buckets + ghosts + tiles + lag carry) vs pandas'
    exact recursion, under heavy order-key ties and tiny buckets."""
    from pd_explain_spark.operators.ewm import ewm_mean

    df, pdf = _frame(spark, rows)
    got = {
        r["rid"]: r["out"]
        for r in ewm_mean(
            df, "v", on="k", alpha=alpha, out_name="out", num_buckets=3
        ).collect()
    }
    spdf = pdf.sort_values(["k", "rid", "v"]).reset_index(drop=True)
    want = dict(zip(spdf["rid"], spdf["v"].ewm(alpha=alpha, adjust=True).mean()))
    for rid, w in want.items():
        assert abs(got[rid] - w) < 1e-9, (rid, got[rid], w)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=ROWS,
    intervals=st.lists(
        st.tuples(st.integers(-5, 12), st.integers(0, 8)),
        min_size=1,
        max_size=6,
    ),
    closed=st.sampled_from(["both", "left", "right", "neither"]),
)
def test_range_join_matches_naive(spark, rows, intervals, closed):
    """Bucketed range join vs an in-memory nested loop over the same
    rows, across all four closures, degenerate (lo == hi) and empty
    intervals included."""
    from pd_explain_spark.operators.rangejoin import range_join

    df, pdf = _frame(spark, rows)
    iv = [(i, float(lo), float(lo + width)) for i, (lo, width) in enumerate(intervals)]
    ivdf = spark.createDataFrame(iv, "iid long, lo double, hi double")
    got = {
        (r["rid"], r["iid"])
        for r in range_join(
            df, ivdf, on="v", lo="lo", hi="hi", closed=closed, num_buckets=3
        ).collect()
    }
    lo_op = {"both": "<=", "left": "<=", "right": "<", "neither": "<"}[closed]
    hi_op = {"both": "<=", "left": "<", "right": "<=", "neither": "<"}[closed]
    import operator

    ops = {"<=": operator.le, "<": operator.lt}
    want = {
        (rid, iid)
        for rid, v in zip(pdf["rid"], pdf["v"])
        for iid, lo, hi in iv
        if ops[lo_op](lo, v) and ops[hi_op](v, hi)
    }
    assert got == want
