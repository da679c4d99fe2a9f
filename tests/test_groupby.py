"""13-agg matrix differential tests vs DuckDB (reference agg surface,
explainable_group_by_dataframe.py:22-485; naming contract <col>_<agg>)."""

import pytest

from pd_explain_spark import GroupByOp
from tests.conftest import assert_df_equal

AGG_SQL = {
    "mean": "avg({c})",
    "median": "median({c})",
    "std": "stddev_samp({c})",
    "var": "var_samp({c})",
    "sem": "stddev_samp({c}) / sqrt(count({c}))",
    "sum": "sum({c})",
    "prod": "product({c})",
    "min": "min({c})",
    "max": "max({c})",
    "count": "count({c})",
    "nunique": "count(DISTINCT {c})",
}


@pytest.mark.parametrize("agg", sorted(AGG_SQL))
def test_series_agg_matches_oracle(lineitem, duck, agg):
    out = lineitem.groupby("l_returnflag")["l_quantity"].agg(agg)
    expr = AGG_SQL[agg].format(c="l_quantity")
    sql = f"SELECT l_returnflag, {expr} AS l_quantity_{agg} FROM lineitem GROUP BY 1"
    if agg in ("count", "nunique", "min", "max", "sum", "prod", "median"):
        # integral/exact aggs: compare as floats anyway via assert_df_equal
        pass
    assert_df_equal(out, duck.sql(sql))
    assert isinstance(out.operation, GroupByOp)
    assert out.operation.keys == ["l_returnflag"]
    assert out.operation.agg_dict == {"l_quantity": [agg]}


def test_size(lineitem, duck):
    out = lineitem.groupby("l_returnflag").size()
    assert_df_equal(
        out, duck.sql("SELECT l_returnflag, count(*) AS size FROM lineitem GROUP BY 1")
    )


def test_multi_key_mean(lineitem, duck):
    out = lineitem.groupby(["l_returnflag", "l_linestatus"])[["l_quantity", "l_extendedprice"]].mean()
    assert_df_equal(
        out,
        duck.sql(
            """SELECT l_returnflag, l_linestatus,
                      avg(l_quantity) AS l_quantity_mean,
                      avg(l_extendedprice) AS l_extendedprice_mean
               FROM lineitem GROUP BY 1, 2"""
        ),
    )


def test_frame_level_mean_numeric_only(orders, duck):
    out = orders.groupby("o_orderpriority").mean()
    # numeric columns only; <col>_<agg> naming
    assert set(out.df.columns) == {
        "o_orderpriority", "o_orderkey_mean", "o_custkey_mean", "o_totalprice_mean"
    }
    assert_df_equal(
        out,
        duck.sql(
            """SELECT o_orderpriority, avg(o_orderkey) AS o_orderkey_mean,
                      avg(o_custkey) AS o_custkey_mean, avg(o_totalprice) AS o_totalprice_mean
               FROM orders GROUP BY 1"""
        ),
    )


def test_agg_dict(lineitem, duck):
    out = lineitem.groupby("l_linestatus").agg({"l_quantity": ["mean", "sum"], "l_tax": "max"})
    assert_df_equal(
        out,
        duck.sql(
            """SELECT l_linestatus, avg(l_quantity) AS l_quantity_mean,
                      sum(l_quantity) AS l_quantity_sum, max(l_tax) AS l_tax_max
               FROM lineitem GROUP BY 1"""
        ),
    )


def test_std_ddof_0(lineitem, duck):
    out = lineitem.groupby("l_returnflag")["l_quantity"].std(ddof=0)
    assert_df_equal(
        out,
        duck.sql(
            "SELECT l_returnflag, stddev_pop(l_quantity) AS l_quantity_std FROM lineitem GROUP BY 1"
        ),
    )


def test_named_agg_kwargs(lineitem, duck):
    out = lineitem.groupby("l_returnflag").agg(
        total_qty=("l_quantity", "sum"), n=("l_orderkey", "count")
    )
    assert_df_equal(
        out,
        duck.sql(
            "SELECT l_returnflag, sum(l_quantity) AS total_qty, count(l_orderkey) AS n FROM lineitem GROUP BY 1"
        ),
    )


def test_bad_key_raises(lineitem):
    with pytest.raises(KeyError):
        lineitem.groupby("nope")


def test_bad_agg_raises(lineitem):
    with pytest.raises(ValueError):
        lineitem.groupby("l_returnflag").agg({"l_quantity": "quantile"})


def test_callable_agg_grouped_udf(lineitem, duck):
    """R5 generic agg(func): Arrow grouped-agg UDF, oracle-checked."""
    out = lineitem.groupby("l_returnflag").agg(
        {"l_quantity": lambda s: s.max() - s.min()}
    )
    assert out.columns == ["l_returnflag", "l_quantity_lambda"]
    want = {
        r[0]: r[1]
        for r in duck.sql(
            "SELECT l_returnflag, max(l_quantity) - min(l_quantity) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    got = {r["l_returnflag"]: r["l_quantity_lambda"] for r in out.df.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    assert isinstance(out.operation, GroupByOp)
    assert out.operation.agg_dict == {"l_quantity": ["lambda"]}


def test_callable_agg_mixed_with_named(lineitem, duck):
    def spread(s):
        return s.max() - s.min()

    out = lineitem.groupby("l_returnflag").agg({"l_quantity": ["mean", spread]})
    assert set(out.columns) == {"l_returnflag", "l_quantity_mean", "l_quantity_spread"}
    want = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            "SELECT l_returnflag, avg(l_quantity), max(l_quantity) - min(l_quantity) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for r in out.df.collect():
        w = want[r["l_returnflag"]]
        assert abs(r["l_quantity_mean"] - w[0]) < 1e-9
        assert abs(r["l_quantity_spread"] - w[1]) < 1e-9


# ------------------------------------------------- transform / filter_groups
def test_groupby_transform_matches_oracle(lineitem, duck):
    out = lineitem[["l_returnflag", "l_quantity", "l_extendedprice"]] \
        .groupby("l_returnflag")[["l_quantity", "l_extendedprice"]].transform("mean")
    assert_df_equal(
        out.df.select("l_returnflag",
                      out.df["l_quantity"].alias("l_quantity"),
                      out.df["l_extendedprice"].alias("l_extendedprice")),
        duck.sql(
            """SELECT l_returnflag,
                      avg(l_quantity) OVER (PARTITION BY l_returnflag) AS l_quantity,
                      avg(l_extendedprice) OVER (PARTITION BY l_returnflag) AS l_extendedprice
               FROM lineitem"""
        ),
    )
    # same shape as input
    assert out.df.count() == lineitem.df.count()


def test_groupby_filter_groups_matches_oracle(orders, duck):
    out = orders.groupby("o_orderpriority").filter_groups(
        "n > 295", n=("o_orderkey", "count")
    )
    assert_df_equal(
        out[["o_orderkey", "o_orderpriority"]],
        duck.sql(
            """SELECT o_orderkey, o_orderpriority FROM orders
               WHERE o_orderpriority IN (
                 SELECT o_orderpriority FROM orders
                 GROUP BY o_orderpriority HAVING count(o_orderkey) > 295)"""
        ),
    )


def test_groupby_transform_nunique_and_errors(lineitem):
    out = lineitem[["l_returnflag", "l_linestatus"]] \
        .groupby("l_returnflag")[["l_linestatus"]].transform("nunique")
    import pyspark.sql.functions as F
    assert out.df.filter(F.col("l_linestatus") > 2).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        lineitem.groupby("l_returnflag").transform("median")
    with _pt.raises(ValueError):
        lineitem.groupby("l_returnflag").filter_groups("1=1")


def test_groupby_apply_frame_to_frame(lineitem, duck):
    """groupby.apply via applyInPandas: per-group demeaned quantity must
    match the window-function oracle."""
    from tests.conftest import assert_df_equal

    def demean(pdf):
        pdf = pdf[["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]].copy()
        pdf["q_demeaned"] = (pdf["l_quantity"] - pdf["l_quantity"].mean()).round(6)
        return pdf

    got = lineitem.groupby("l_returnflag").apply(
        demean,
        "l_orderkey long, l_linenumber long, l_returnflag string, "
        "l_quantity double, q_demeaned double",
    )
    assert_df_equal(
        got.df,
        duck.sql(
            """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
                      round(l_quantity - avg(l_quantity) OVER (PARTITION BY l_returnflag), 6)
                        AS q_demeaned
               FROM lineitem"""
        ),
    )


def test_query_string_matches_bracket_filter(lineitem):
    """df.query(pandas-style string) == the bracket-mask filter, and the
    predicate lands in lineage for the explainers."""
    q = lineitem.query("l_quantity > 45 and l_returnflag == 'A'")
    mask = lineitem[(lineitem["l_quantity"] > 45) & (lineitem["l_returnflag"] == "A")]
    assert q.df.count() == mask.df.count() > 0
    from pd_explain_spark import FilterOp

    assert isinstance(q.operation, FilterOp)
    assert set(q.operation.predicate.columns()) == {"l_quantity", "l_returnflag"}

    import pytest as _pytest
    from pd_explain_spark.core.operations import QueryStringError

    with _pytest.raises(QueryStringError):
        lineitem.query("__import__('os').system('true')")
    with _pytest.raises(QueryStringError):
        lineitem.query("no_such_column > 3")


def test_numeric_only_contract_matches_reference(lineitem):
    """Reference contract (ref tests/test_exp_series.py:48-115):
    numeric_only=True filters to numeric columns; numeric_only=False on a
    numeric selection works; numeric_only=False on a non-numeric column
    raises TypeError; min/max accept strings either way."""
    import pytest

    g = lineitem.groupby("l_returnflag")
    cols_true = set(g.mean(numeric_only=True).df.columns)
    assert "l_linestatus_mean" not in cols_true  # string col filtered
    assert "l_quantity_mean" in cols_true

    ok = g["l_quantity"].mean(numeric_only=False)
    assert "l_quantity_mean" in ok.df.columns

    with pytest.raises(TypeError):
        g["l_linestatus"].mean(numeric_only=False)
    with pytest.raises(TypeError):
        g["l_linestatus"].sem(numeric_only=False)

    # min/max are not numeric-only aggs: strings pass through both ways
    assert "l_linestatus_max" in g["l_linestatus"].max(numeric_only=False).df.columns


def test_aggregate_alias_matches_agg(lineitem):
    a = lineitem.groupby("l_returnflag").agg({"l_quantity": "mean"})
    b = lineitem.groupby("l_returnflag").aggregate({"l_quantity": "mean"})
    assert sorted(map(tuple, a.df.collect())) == sorted(map(tuple, b.df.collect()))


def test_groupby_drop_duplicates_is_global_distinct(spark):
    from pd_explain_spark import to_explainable

    df = to_explainable(
        spark.createDataFrame(
            [("a", 1), ("a", 1), ("a", 2), ("b", 1)], ["g", "v"]
        ),
        name="gdd",
    )
    out = df.groupby("g").drop_duplicates()
    assert sorted(map(tuple, out.df.collect())) == [("a", 1), ("a", 2), ("b", 1)]


def test_groupby_explain_before_and_after_agg(lineitem):
    import warnings

    g = lineitem.groupby("l_returnflag")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert g.explain() is None
        assert any("no operation" in str(x.message) for x in w)
    g["l_quantity"].mean()
    # the selected-column child shares no state; rebuild through the SAME object
    g2 = lineitem.groupby("l_returnflag")
    g2.mean(numeric_only=True)
    exp = g2.explain()
    assert exp is not None
