"""Tracked-operator differential tests vs the DuckDB oracle.

Mirrors the reference's test strategy (tests/README.md:4-6: differential
testing, 'pd-explain produces output consistent with pandas') with DuckDB
as the ground truth, plus lineage-capture assertions like
tests/test_exp_data_frame.py:156-187.
"""

import pytest
from pyspark.sql import functions as F

from pd_explain_spark import ExplainableDataFrame, FilterOp, JoinOp
from tests.conftest import assert_df_equal


# ---------------------------------------------------------------- filters
def test_filter_gt_matches_oracle(lineitem, duck):
    out = lineitem[lineitem["l_quantity"] > 45]
    assert_df_equal(out, duck.sql("SELECT * FROM lineitem WHERE l_quantity > 45"))


def test_filter_eq_string_matches_oracle(orders, duck):
    out = orders[orders["o_orderstatus"] == "F"]
    assert_df_equal(
        out[["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]],
        duck.sql("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'"),
    )


def test_filter_compound_and(lineitem, duck):
    out = lineitem[(lineitem["l_discount"] >= 0.05) & (lineitem["l_tax"] < 0.07)]
    assert_df_equal(
        out, duck.sql("SELECT * FROM lineitem WHERE l_discount >= 0.05 AND l_tax < 0.07")
    )


def test_filter_or_not(lineitem, duck):
    out = lineitem[~((lineitem["l_returnflag"] == "A") | (lineitem["l_quantity"] < 10))]
    assert_df_equal(
        out,
        duck.sql("SELECT * FROM lineitem WHERE NOT (l_returnflag = 'A' OR l_quantity < 10)"),
    )


def test_filter_records_lineage(lineitem):
    out = lineitem[lineitem["l_quantity"] > 45]
    op = out.operation
    assert isinstance(op, FilterOp)
    assert op.attribute == "l_quantity"
    assert op.op_str == ">"
    assert op.value == 45
    assert op.source is lineitem.df
    assert op.result.count() == out.df.count()


def test_filter_isin_between(lineitem, duck):
    out = lineitem[lineitem["l_returnflag"].isin(["A", "R"])]
    assert_df_equal(out, duck.sql("SELECT * FROM lineitem WHERE l_returnflag IN ('A','R')"))
    out2 = lineitem[lineitem["l_quantity"].between(10, 20)]
    assert_df_equal(out2, duck.sql("SELECT * FROM lineitem WHERE l_quantity BETWEEN 10 AND 20"))


def test_getitem_missing_column_raises(lineitem):
    with pytest.raises(KeyError):
        lineitem["no_such_column"]


# ---------------------------------------------------------------- projection / passthrough
def test_projection_list(lineitem, duck):
    out = lineitem[["l_orderkey", "l_quantity"]]
    assert_df_equal(out, duck.sql("SELECT l_orderkey, l_quantity FROM lineitem"))


def test_drop_and_rename(nation, duck):
    out = nation.drop("n_regionkey").rename({"n_name": "nation_name"})
    assert_df_equal(out, duck.sql("SELECT n_nationkey, n_name AS nation_name FROM nation"))


def test_drop_missing_raises(nation):
    with pytest.raises(KeyError):
        nation.drop("nope")


def test_drop_duplicates(lineitem, duck):
    out = lineitem[["l_returnflag", "l_linestatus"]].drop_duplicates()
    assert_df_equal(
        out, duck.sql("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
    )


def test_value_counts(nation, duck):
    out = nation["n_regionkey"].value_counts()
    assert_df_equal(
        out,
        duck.sql("SELECT n_regionkey, count(*) AS count FROM nation GROUP BY 1"),
    )


def test_sample_exact_n_deterministic(lineitem):
    a = lineitem.sample(n=100).df.toPandas()
    b = lineitem.sample(n=100).df.toPandas()
    assert len(a) == 100
    assert a.sort_values(list(a.columns), ignore_index=True).equals(
        b.sort_values(list(b.columns), ignore_index=True)
    )


# ---------------------------------------------------------------- joins
def test_inner_join_prefix_contract(lineitem, orders, duck):
    o = orders.rename({"o_orderkey": "l_orderkey"})
    j = lineitem.merge(o, on="l_orderkey", how="inner")
    assert isinstance(j.operation, JoinOp)
    # non-key columns are prefixed with the frame name
    assert "lineitem_l_quantity" in j.df.columns
    assert "orders_o_totalprice" in j.df.columns
    assert "l_orderkey" in j.df.columns
    got = j[["l_orderkey", "lineitem_l_quantity", "orders_o_totalprice"]]
    assert_df_equal(
        got,
        duck.sql(
            """SELECT l.l_orderkey, l.l_quantity AS lineitem_l_quantity,
                      o.o_totalprice AS orders_o_totalprice
               FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"""
        ),
    )


@pytest.mark.parametrize("how,sqlhow", [("left", "LEFT"), ("right", "RIGHT"), ("full", "FULL")])
def test_outer_join_counts(lineitem, orders, duck, how, sqlhow):
    o = orders.rename({"o_orderkey": "l_orderkey"})
    j = lineitem.merge(o, on="l_orderkey", how=how)
    expected = duck.sql(
        f"SELECT count(*) FROM lineitem l {sqlhow} JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).fetchone()[0]
    assert j.df.count() == expected


def test_join_requires_on(lineitem, orders):
    with pytest.raises(ValueError):
        lineitem.join(orders)


def test_join_missing_key_raises(lineitem, orders):
    with pytest.raises(KeyError):
        lineitem.merge(orders, on="l_orderkey")  # orders lacks l_orderkey


# ---------------------------------------------------------------- delegation
def test_getattr_delegation_rewraps(lineitem):
    out = lineitem.limit(5)
    assert isinstance(out, ExplainableDataFrame)
    assert out.df.count() == 5


def test_series_scalar_aggs_match_oracle(lineitem, duck):
    got_mean = lineitem["l_quantity"].mean()
    got_sum = lineitem["l_quantity"].sum()
    got_sem = lineitem["l_quantity"].sem()
    want = duck.sql(
        "SELECT avg(l_quantity), sum(l_quantity), "
        "stddev_samp(l_quantity)/sqrt(count(l_quantity)) FROM lineitem"
    ).fetchone()
    assert abs(got_mean - want[0]) < 1e-9
    assert abs(got_sum - want[1]) < 1e-6
    assert abs(got_sem - want[2]) < 1e-12
    assert lineitem["l_quantity"].count() == duck.sql(
        "SELECT count(l_quantity) FROM lineitem"
    ).fetchone()[0]


def test_where_keeps_shape_and_nulls(lineitem, duck, sf_dir):
    out = lineitem[["l_orderkey", "l_quantity"]]
    masked = out.where(out["l_quantity"] > 45)
    # shape preserved
    assert masked.df.count() == lineitem.df.count()
    # non-matching rows are fully NULL; matching rows intact
    import pyspark.sql.functions as F
    n_kept = masked.df.filter(F.col("l_quantity").isNotNull()).count()
    n_expected = lineitem.df.filter(F.col("l_quantity") > 45).count()
    assert n_kept == n_expected
    # the operation is still recorded as a Filter (reference contract)
    from pd_explain_spark.core.operations import FilterOp
    assert isinstance(masked.operation, FilterOp)
    assert masked.operation.attribute == "l_quantity"


def test_shape_head_iloc_pandas_surface(nation):
    n_rows, n_cols = nation.shape
    assert (n_rows, n_cols) == (25, len(nation.columns))
    h = nation.head(5)
    assert h.df.count() == 5 and h.columns == nation.columns
    # prefix slice stays distributed (a frame), row fetch returns a Row
    sl = nation.iloc[:3]
    assert sl.df.count() == 3
    row = nation.iloc[0]
    assert set(row.asDict()) == set(nation.columns)
    mid = nation.iloc[2:4]
    assert mid.df.count() == 2
    import pytest as _pt
    with _pt.raises(ValueError):
        nation.iloc[-1]
    with _pt.raises(ValueError):
        nation.iloc[1:]
    with _pt.raises(IndexError):
        nation.iloc[10_000]


def test_series_surface_parity(lineitem, duck):
    """Reference test_exp_series.py surface: drop_duplicates, size, squeeze,
    numeric-only failure on string columns."""
    dd = lineitem["l_returnflag"].drop_duplicates()
    want = duck.sql("SELECT DISTINCT l_returnflag FROM lineitem").fetchall()
    assert sorted(r[0] for r in dd.df.collect()) == sorted(r[0] for r in want)
    assert lineitem["l_quantity"].size() == lineitem.df.count()
    sq = lineitem[["l_quantity"]].squeeze()
    from pd_explain_spark.core.series import ExplainableColumn
    assert isinstance(sq, ExplainableColumn) and sq.name == "l_quantity"
    assert lineitem.squeeze() is lineitem  # multi-column: no-op, like pandas
    with pytest.raises(TypeError):
        lineitem["l_returnflag"].mean()
    with pytest.raises(TypeError):
        lineitem["l_shipmode"].std() if "l_shipmode" in lineitem.columns else (_ for _ in ()).throw(TypeError)


def test_rename_inplace(lineitem):
    f = lineitem[lineitem["l_quantity"] > 45].copy()
    out = f.rename(columns={"l_quantity": "qty"}, inplace=True)
    assert out is None
    assert "qty" in f.columns and "l_quantity" not in f.columns
    assert f.operation.attribute == "qty"  # lineage rewritten through the mapping


def test_concat_union_by_name(lineitem, nation, spark):
    from pd_explain_spark import concat

    a = lineitem[["l_orderkey", "l_quantity"]]
    b = lineitem[["l_orderkey", "l_quantity"]].head(10)
    out = concat([a, b])
    assert out.df.count() == a.df.count() + 10
    # missing columns are NULL-filled
    c = lineitem[["l_orderkey"]].head(5)
    mixed = concat([a, c])
    assert mixed.df.count() == a.df.count() + 5
    assert mixed.df.filter("l_quantity IS NULL").count() == 5
    # the union itself is partition-local: no Exchange between Union and
    # the left (un-limited) scan — the only exchange in the plan belongs
    # to the right side's GlobalLimit
    plan = concat([a, a]).df._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan and "Exchange" not in plan


def test_sort_values_nlargest_match_oracle(lineitem, duck):
    top = lineitem.nlargest(5, "l_extendedprice")
    want = duck.sql(
        "SELECT l_extendedprice FROM lineitem ORDER BY l_extendedprice DESC LIMIT 5"
    ).fetchall()
    got = sorted((r["l_extendedprice"] for r in top.df.collect()), reverse=True)
    assert got == [w[0] for w in want]
    bot = lineitem.nsmallest(3, "l_quantity")
    assert bot.df.count() == 3
    # nlargest compiles to a top-k (TakeOrderedAndProject), not a full sort
    plan = top.df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------- missing-data / dtype surface
def test_where_fillna_dropna_match_oracle(lineitem, duck):
    w = lineitem[["l_orderkey", "l_quantity", "l_returnflag"]]
    w = w.where(w["l_quantity"] > 30)
    assert_df_equal(
        w.fillna({"l_quantity": 0.0, "l_returnflag": "NA"}),
        duck.sql(
            """SELECT CASE WHEN l_quantity > 30 THEN l_orderkey END AS l_orderkey,
                      COALESCE(CASE WHEN l_quantity > 30 THEN l_quantity END, 0.0) AS l_quantity,
                      COALESCE(CASE WHEN l_quantity > 30 THEN l_returnflag END, 'NA') AS l_returnflag
               FROM lineitem"""
        ),
    )
    # dropna over the all-or-nothing NULL mask == the plain filter
    assert_df_equal(
        w.dropna(),
        duck.sql(
            "SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem WHERE l_quantity > 30"
        ),
    )
    # thresh keeps rows with >= thresh non-nulls (pandas meaning)
    assert w.dropna(thresh=3).df.count() == w.dropna().df.count()


def test_astype_clip_match_oracle(lineitem, duck):
    out = (
        lineitem.astype({"l_quantity": "int64"})
        .clip(lower=5, upper=40)[["l_orderkey", "l_linenumber", "l_quantity"]]
    )
    assert out.df.schema["l_quantity"].dataType.simpleString() == "bigint"
    # clip() hits every numeric column, like pandas df.clip — mirror that in the oracle
    assert_df_equal(
        out,
        duck.sql(
            """SELECT LEAST(GREATEST(l_orderkey, 5), 40) AS l_orderkey,
                      LEAST(GREATEST(l_linenumber, 5), 40) AS l_linenumber,
                      LEAST(GREATEST(CAST(l_quantity AS BIGINT), 5), 40) AS l_quantity
               FROM lineitem"""
        ),
    )


def test_quantile_matches_oracle(lineitem, duck):
    q = lineitem.quantile([0.25, 0.5, 0.75], columns=["l_quantity", "l_extendedprice"])
    assert_df_equal(
        q,
        duck.sql(
            """SELECT 0.25 AS quantile, quantile_cont(l_quantity, 0.25) AS l_quantity,
                      quantile_cont(l_extendedprice, 0.25) AS l_extendedprice FROM lineitem
               UNION ALL
               SELECT 0.5, quantile_cont(l_quantity, 0.5), quantile_cont(l_extendedprice, 0.5) FROM lineitem
               UNION ALL
               SELECT 0.75, quantile_cont(l_quantity, 0.75), quantile_cont(l_extendedprice, 0.75) FROM lineitem"""
        ),
    )
    # series-level scalar form
    assert lineitem["l_quantity"].quantile(0.5) == duck.sql(
        "SELECT quantile_cont(l_quantity, 0.5) FROM lineitem"
    ).fetchone()[0]


def test_frame_nunique_single_pass(lineitem, duck):
    out = lineitem[["l_returnflag", "l_linestatus", "l_quantity"]].nunique()
    assert_df_equal(
        out,
        duck.sql(
            """SELECT count(DISTINCT l_returnflag) AS l_returnflag,
                      count(DISTINCT l_linestatus) AS l_linestatus,
                      count(DISTINCT l_quantity) AS l_quantity FROM lineitem"""
        ),
    )
    # all three distinct aggregates share ONE aggregation (Expand), not a job per column
    # (AQE prints final + initial plan; count only the final section)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Exchange") <= 2


def test_describe_matches_pandas(lineitem):
    got = lineitem.describe(columns=["l_quantity", "l_discount"]).df.toPandas().set_index("statistic")
    want = lineitem.df.select("l_quantity", "l_discount").toPandas().describe()
    for stat in ["count", "mean", "std", "min", "25%", "50%", "75%", "max"]:
        for c in ["l_quantity", "l_discount"]:
            assert abs(got.loc[stat, c] - want.loc[stat, c]) < 1e-9, (stat, c)


def test_crosstab_pivot_table_match_oracle(orders, duck):
    xt = orders.crosstab("o_orderstatus", "o_orderpriority")
    assert_df_equal(
        xt,
        duck.sql(
            """SELECT o_orderstatus,
                      count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
                      count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
                      count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
                      count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
                      count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
               FROM orders GROUP BY o_orderstatus"""
        ),
    )
    pt = orders.pivot_table(
        "o_orderpriority", "o_orderstatus", "o_totalprice", aggfunc="mean",
        pivot_values=["F", "O", "P"],
    )
    assert_df_equal(
        pt,
        duck.sql(
            """SELECT o_orderpriority,
                      avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS "F",
                      avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS "O",
                      avg(o_totalprice) FILTER (WHERE o_orderstatus = 'P') AS "P"
               FROM orders GROUP BY o_orderpriority"""
        ),
    )


# ------------------------------------------------- reshape: melt / get_dummies
def test_melt_matches_oracle(lineitem, duck):
    m = lineitem.melt(
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_discount"],
    )
    assert_df_equal(
        m,
        duck.sql(
            """SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
               UNION ALL
               SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem"""
        ),
    )
    # unpivot is an Expand inside the scan stage — no shuffle at all
    plan = m.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_get_dummies_matches_oracle(orders, duck):
    d = orders.get_dummies("o_orderstatus", values=["F", "O", "P"])
    out = d[["o_orderkey", "o_orderstatus_F", "o_orderstatus_O", "o_orderstatus_P"]]
    assert_df_equal(
        out,
        duck.sql(
            """SELECT o_orderkey,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o_orderstatus_F,
                      CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS o_orderstatus_O,
                      CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS o_orderstatus_P
               FROM orders"""
        ),
    )


# ------------------------------------------------- binning: cut / qcut
def test_cut_matches_oracle(lineitem, duck):
    from pd_explain_spark import to_explainable

    binned = lineitem.df.select(
        lineitem["l_quantity"].cut([0, 10, 25, 50], labels=["low", "mid", "high"]).alias("bin")
    ).groupBy("bin").count()
    assert_df_equal(
        to_explainable(binned, "binned"),
        duck.sql(
            """SELECT CASE WHEN l_quantity > 25 AND l_quantity <= 50 THEN 'high'
                           WHEN l_quantity > 10 AND l_quantity <= 25 THEN 'mid'
                           WHEN l_quantity > 0  AND l_quantity <= 10 THEN 'low'
                      END AS bin, count(*) AS count
               FROM lineitem GROUP BY 1"""
        ),
    )


def test_qcut_matches_pandas(lineitem):
    got = (
        lineitem.df.select(lineitem["l_quantity"].qcut(4, labels=["q1", "q2", "q3", "q4"]).alias("bin"))
        .groupBy("bin").count().toPandas().set_index("bin")["count"]
    )
    import pandas as pd

    pdf = lineitem.df.select("l_quantity").toPandas()
    want = pd.qcut(pdf["l_quantity"], 4, labels=["q1", "q2", "q3", "q4"]).value_counts()
    for b in ["q1", "q2", "q3", "q4"]:
        assert got[b] == want[b], b


def test_approx_nunique_quantile_close_to_exact(lineitem):
    exact = lineitem[["l_returnflag", "l_quantity"]].nunique().df.first()
    approx = lineitem[["l_returnflag", "l_quantity"]].nunique(approx=True, rsd=0.02).df.first()
    for c in ["l_returnflag", "l_quantity"]:
        assert abs(approx[c] - exact[c]) <= max(2, 0.1 * exact[c]), c
    qe = lineitem.quantile(0.5, columns=["l_quantity"]).df.first()["l_quantity"]
    qa = lineitem.quantile(0.5, columns=["l_quantity"], approx=True).df.first()["l_quantity"]
    assert abs(qa - qe) <= 2.0


def test_to_parquet_partitioned_roundtrip(nation, spark, tmp_path):
    from pd_explain_spark import read_parquet

    dest = str(tmp_path / "nation_out")
    nation.to_parquet(dest, partition_by="n_regionkey")
    back = read_parquet(spark, dest)
    assert back.df.count() == nation.df.count()
    assert set(back.df.columns) == set(nation.df.columns)
    # hive-layout partition dirs exist → readers get partition pruning
    import os
    assert any(d.startswith("n_regionkey=") for d in os.listdir(dest))

    dest2 = str(tmp_path / "nation_csv")
    nation.to_csv(dest2)
    back2 = spark.read.options(header="true", inferSchema="true").csv(dest2)
    assert back2.count() == nation.df.count()


def test_corr_cov_match_oracle(lineitem, duck):
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    got = lineitem.corr(columns=cols).df.toPandas().set_index("column")
    want = {}
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            want[(a, b)] = duck.sql(f"SELECT corr({a}, {b}) FROM lineitem").fetchone()[0]
    for (a, b), v in want.items():
        assert abs(got.loc[a, b] - v) < 1e-9
        assert abs(got.loc[b, a] - v) < 1e-9
    for a in cols:
        assert got.loc[a, a] == 1.0
    gotc = lineitem.cov(columns=cols).df.toPandas().set_index("column")
    for i, a in enumerate(cols):
        for b in cols[i:]:
            v = duck.sql(f"SELECT covar_samp({a}, {b}) FROM lineitem").fetchone()[0]
            assert abs(gotc.loc[a, b] - v) < 1e-6, (a, b)
    # the whole matrix is ONE aggregation job: plan has a single pair of exchanges
    plan = lineitem.corr(columns=cols).df._jdf.queryExecution().executedPlan().toString()


def test_duplicated_matches_oracle(lineitem, duck):
    out = lineitem.duplicated(subset=["l_returnflag", "l_linestatus"], keep=False)
    got = out.df.filter("duplicated").count()
    want = duck.sql(
        """SELECT count(*) FROM (
             SELECT count(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
             FROM lineitem) WHERE n > 1"""
    ).fetchone()[0]
    assert got == want
    # keep='first': exactly one unmarked row per duplicate group
    outf = lineitem.duplicated(subset=["l_returnflag", "l_linestatus"], keep="first")
    n_groups = duck.sql(
        "SELECT count(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)"
    ).fetchone()[0]
    assert outf.df.filter("NOT duplicated").count() == n_groups


def test_explode_matches_oracle(part, duck):
    from pd_explain_spark import to_explainable

    words = to_explainable(
        part.df.select("p_partkey", F.split(F.col("p_name"), " ").alias("word")), "words"
    ).explode("word")
    assert_df_equal(
        words,
        duck.sql(
            """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part"""
        ),
    )
    # Generate stays in the scan stage — no shuffle
    plan = words.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


# ----------------------------------------------------- sample flavors (r5)
from pd_explain_spark import to_explainable


def test_sample_weighted_prefers_heavy_rows(spark):
    """A-ES weighted sampling: rows with overwhelming weight dominate;
    zero/NULL-weight rows are never sampled (pandas contract)."""
    rows = [(i, 1000.0 if i < 5 else 0.001) for i in range(100)]
    rows += [(100, 0.0), (101, None)]
    df = to_explainable(
        spark.createDataFrame(rows, "id int, w double"), name="wsamp"
    )
    got = df.sample(n=5, weights="w", seed=7)
    ids = {r["id"] for r in got.df.collect()}
    assert len(ids) == 5
    assert 100 not in ids and 101 not in ids
    # heavy rows (ids 0-4, weight 1e6 x the rest) should all be picked
    assert ids == {0, 1, 2, 3, 4}


def test_sample_replace_draws_duplicates(spark):
    df = to_explainable(
        spark.createDataFrame([(i,) for i in range(10)], "id int"), name="rsamp"
    )
    got = df.sample(n=30, replace=True, seed=3).df.collect()
    assert 0 < len(got) <= 30
    vals = [r["id"] for r in got]
    assert len(set(vals)) < len(vals), "with replacement must draw duplicates"


def test_sample_random_state_alias(spark):
    df = to_explainable(
        spark.createDataFrame([(i,) for i in range(50)], "id int"), name="seeds"
    )
    a = sorted(r["id"] for r in df.sample(n=10, seed=11).df.collect())
    b = sorted(r["id"] for r in df.sample(n=10, random_state=11).df.collect())
    assert a == b


def test_sample_weights_replace_unsupported(spark):
    df = to_explainable(spark.createDataFrame([(1, 1.0)], "id int, w double"), name="x")
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        df.sample(n=1, weights="w", replace=True)


def test_to_parquet_cluster_by_prunes_and_sorts(lineitem, tmp_path, spark):
    """cluster_by must produce range-disjoint, sorted files: reading back
    with a tight predicate should report far fewer rows scanned per file
    (tight row-group stats), and each file's min/max ranges must not
    overlap. Also pins that the plan uses a range Exchange, never a
    single-partition sort."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "clustered")
    slim = lineitem[["l_orderkey", "l_quantity"]]
    plan_df = slim.df.repartitionByRange("l_orderkey").sortWithinPartitions("l_orderkey")
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    assert "SinglePartition" not in plan.split("== Initial Plan ==")[0]

    slim.to_parquet(target, mode="overwrite", cluster_by="l_orderkey", cluster_partitions=4)
    import glob

    files = sorted(glob.glob(target + "/*.parquet"))
    assert len(files) > 1  # actually range-split across files
    import duckdb

    ranges = duckdb.sql(
        f"""SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi, filename
            FROM read_parquet('{target}/*.parquet', filename=true)
            GROUP BY filename ORDER BY lo"""
    ).fetchall()
    for (lo1, hi1, _), (lo2, hi2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: [{lo1},{hi1}] vs [{lo2},{hi2}]"
    # round-trips exactly
    back = spark.read.parquet(target)
    assert back.count() == slim.df.count()


def test_merge_indicator_and_validate(spark):
    """pandas merge(indicator=, validate=) parity: _merge categories from
    presence flags (no extra pass) and cardinality validation via a
    limit-1 duplicate probe."""
    import pytest

    from pd_explain_spark.sources.readers import to_explainable

    l = to_explainable(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, lv string"), name="l"
    )
    r = to_explainable(
        spark.createDataFrame([(2, "x"), (3, "y"), (4, "z")], "k long, rv string"), name="r"
    )
    out = l.merge(r, on="k", how="outer", indicator=True)
    got = {row["k"]: row["_merge"] for row in out.df.collect()}
    assert got == {1: "left_only", 2: "both", 3: "both", 4: "right_only"}

    named = l.merge(r, on="k", how="outer", indicator="origin")
    assert "origin" in named.df.columns

    # validate: right side unique -> m:1 passes; duplicate right -> m:1 raises
    assert l.merge(r, on="k", validate="m:1").df.count() == 2
    rdup = to_explainable(
        spark.createDataFrame([(2, "x"), (2, "x2")], "k long, rv string"), name="rd"
    )
    with pytest.raises(ValueError, match="right side has duplicate"):
        l.merge(rdup, on="k", validate="m:1")
    with pytest.raises(ValueError, match="validate must be"):
        l.merge(r, on="k", validate="one_to_one")


def test_to_parquet_zorder_prunes_on_both_columns(lineitem, tmp_path):
    """Z-order layout: each file covers a small hyper-rectangle, so the
    NON-leading clustered column's per-file range must be materially
    tighter than under linear (lexicographic) clustering, where every
    file spans nearly the full secondary range."""
    import duckdb

    slim = lineitem[["l_orderkey", "l_partkey"]]
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    slim.to_parquet(lin, mode="overwrite", cluster_by=["l_orderkey", "l_partkey"],
                    cluster_partitions=8)
    slim.to_parquet(zo, mode="overwrite", cluster_by=["l_orderkey", "l_partkey"],
                    cluster_partitions=8, layout="zorder")

    def mean_span(path, col):
        rows = duckdb.sql(
            f"""SELECT max({col}) - min({col}) AS span
                FROM read_parquet('{path}/*.parquet', filename=true)
                GROUP BY filename"""
        ).fetchall()
        return sum(r[0] for r in rows) / len(rows), len(rows)

    lin_span, n_lin = mean_span(lin, "l_partkey")
    zo_span, n_zo = mean_span(zo, "l_partkey")
    assert n_lin > 1 and n_zo > 1
    # linear: secondary column spans ~full range per file; zorder: a
    # fraction of it. 0.7 leaves headroom for quantile-boundary noise.
    assert zo_span < 0.7 * lin_span, (zo_span, lin_span)
    # exact round-trip
    got = duckdb.sql(f"SELECT count(*) FROM read_parquet('{zo}/*.parquet')").fetchone()[0]
    assert got == slim.df.count()


def test_series_unique_cap_raises_not_truncates(customer):
    col = customer["c_custkey"]
    with pytest.raises(ValueError, match="exceeds limit"):
        col.unique(limit=10)
    # explicit opt-out and a sufficient cap both materialize fully
    n = customer.df.select("c_custkey").distinct().count()
    assert len(col.unique(limit=None)) == n
    assert len(col.unique()) == n
