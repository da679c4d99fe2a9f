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
