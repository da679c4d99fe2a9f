"""`.str` / `.dt` accessor parity vs the DuckDB oracle.

Boolean .str tests must behave exactly like comparison operators: produce
an ExplainablePredicate, drive a tracked FilterOp, and support explain().
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pd_explain_spark import ExplainablePredicate, FilterOp, load_table, to_explainable
from tests.conftest import assert_df_equal


@pytest.fixture(scope="module")
def part(spark, sf_dir):
    return load_table(spark, sf_dir, "part")


@pytest.fixture(scope="module")
def events_e(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_str_predicates_filter_and_lineage(part, duck):
    mask = part["p_type"].str.contains("AND")  # matches STANDARD
    assert isinstance(mask, ExplainablePredicate)
    out = part[mask]
    assert isinstance(out.operation, FilterOp)
    assert out.operation.attribute == "p_type"
    assert out.df.count() > 0
    assert_df_equal(
        out[["p_partkey", "p_type"]],
        duck.sql("SELECT p_partkey, p_type FROM part WHERE p_type LIKE '%AND%'"),
    )
    out2 = part[part["p_name"].str.startswith("b") & part["p_brand"].str.endswith("3")]
    assert_df_equal(
        out2[["p_partkey"]],
        duck.sql(
            """SELECT p_partkey FROM part
               WHERE p_name LIKE 'b%' AND p_brand LIKE '%3'"""
        ),
    )
    out3 = part[part["p_type"].str.match(r"STAND")]
    assert out3.df.count() > 0
    assert_df_equal(
        out3[["p_partkey"]],
        duck.sql("SELECT p_partkey FROM part WHERE regexp_matches(p_type, '^STAND')"),
    )


def test_str_transforms_match_oracle(part, duck):
    got = part.df.select(
        "p_partkey",
        part["p_name"].str.upper().alias("up"),
        part["p_name"].str.len().alias("n"),
        part["p_name"].str.slice(0, 5).alias("head5"),
        part["p_name"].str.replace(" ", "_").alias("snake"),
        part["p_name"].str.extract(r"^(\w+)", 1).alias("first_word"),
        part["p_name"].str.title().alias("t"),
    )
    assert_df_equal(
        to_explainable(got, "t"),
        duck.sql(
            """SELECT p_partkey, upper(p_name) AS up, length(p_name) AS n,
                      substring(p_name, 1, 5) AS head5,
                      replace(p_name, ' ', '_') AS snake,
                      regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
                      -- DuckDB has no initcap; build it for the oracle
                      list_aggregate(
                        list_transform(string_split(p_name, ' '),
                                       x -> upper(x[1]) || lower(x[2:])), 'string_agg', ' ')
                      AS t
               FROM part"""
        ),
    )


def test_dt_parts_match_oracle(events_e, duck, sf_dir):
    duck.execute(
        f"CREATE OR REPLACE VIEW ev2 AS SELECT * FROM read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    c = events_e["ts"]
    got = events_e.df.select(
        "event_id",
        c.dt.year.alias("y"), c.dt.month.alias("m"), c.dt.day.alias("d"),
        c.dt.hour.alias("h"), c.dt.dayofweek.alias("dow"),
        c.dt.quarter.alias("q"), c.dt.dayofyear.alias("doy"),
        c.dt.month_name.alias("mn"), c.dt.day_name.alias("dn"),
    )
    assert_df_equal(
        to_explainable(got, "t"),
        duck.sql(
            """SELECT event_id, year(ts) AS y, month(ts) AS m, day(ts) AS d,
                      hour(ts) AS h, isodow(ts) - 1 AS dow,
                      quarter(ts) AS q, dayofyear(ts) AS doy,
                      monthname(ts) AS mn, dayname(ts) AS dn
               FROM ev2"""
        ),
    )


def test_str_mask_explain_runs(part):
    out = part[part["p_type"].str.contains("BRASS")]
    exp = out.explain(top_k=1)
    assert exp is not None


def test_series_mode_ties_and_nulls(spark, sf_dir):
    """pandas-parity .mode(): all tied most-frequent values, ascending,
    NULLs excluded; frame.mode(column) delegates."""
    from pd_explain_spark import to_explainable

    df = spark.createDataFrame(
        [(1,), (1,), (2,), (2,), (3,), (None,), (None,), (None,)],
        "x INT",
    )
    e = to_explainable(df, name="t")
    assert [r["x"] for r in e["x"].mode().df.collect()] == [1, 2]
    assert [r["x"] for r in e.mode("x").df.collect()] == [1, 2]
    # pandas differential on the same data
    import pandas as pd

    pdf = pd.DataFrame({"x": [1, 1, 2, 2, 3, None, None, None]})
    assert [r["x"] for r in e["x"].mode().df.collect()] == pdf["x"].mode().astype(int).tolist()
