"""rolling / shift / diff / cumsum vs the DuckDB window-function oracle.

The no-`by` variants deliberately use small num_buckets so the
range-bucket + ghost-row/carry paths (operators/rolling.py) are actually
exercised across bucket boundaries.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pd_explain_spark.operators.rolling import cumsum_col, diff_col, rolling_agg, shift_col
from pd_explain_spark.sources.readers import read_parquet_df
from tests.conftest import assert_df_equal


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    ev = read_parquet_df(spark, os.path.join(sf_dir, "events.parquet"))
    # integer cents make cumulative sums exact on both engines
    return ev.select(
        "event_id", "ts", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


@pytest.fixture(scope="module")
def duck_events(duck, sf_dir):
    duck.execute(
        f"""CREATE OR REPLACE VIEW ev AS
            SELECT event_id, ts, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')"""
    )
    return duck


def test_rolling_time_window_by_key(events, duck_events):
    got = rolling_agg(
        events,
        on="ts",
        window="1 hour",
        aggs={"roll_sum": ("cents", "sum"), "roll_n": ("cents", "count")},
        by="event_type",
    ).select("event_id", "roll_sum", "roll_n")
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id,
                      sum(cents) OVER w AS roll_sum,
                      count(cents) OVER w AS roll_n
               FROM ev
               WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
        ),
    )


def test_rolling_time_window_bucketed_no_by(events, duck_events):
    got = rolling_agg(
        events,
        on="ts",
        window="30 minutes",
        aggs={"roll_sum": ("cents", "sum")},
        num_buckets=5,
    ).select("event_id", "roll_sum")
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id, sum(cents) OVER
                 (ORDER BY epoch_us(ts) RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
                 AS roll_sum
               FROM ev"""
        ),
    )


def test_rolling_row_window_bucketed_no_by(events, duck_events):
    got = rolling_agg(
        events,
        on="ts",
        window=5,
        aggs={"roll_max": ("cents", "max")},
        num_buckets=4,
    ).select("event_id", "roll_max")
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id, max(cents) OVER
                 (ORDER BY ts, event_id, cents ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                 AS roll_max
               FROM ev"""
        ),
    )


def test_shift_and_diff_bucketed_no_by(events, duck_events):
    got = shift_col(events, "cents", on="ts", periods=3, num_buckets=4).select(
        "event_id", "cents_shift"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id, lag(cents, 3) OVER (ORDER BY ts, event_id, cents) AS cents_shift
               FROM ev"""
        ),
    )
    got = diff_col(events, "cents", on="ts", by="event_type").select("event_id", "cents_diff")
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id,
                      cents - lag(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id, cents)
                      AS cents_diff
               FROM ev"""
        ),
    )


def test_cumsum_bucketed_no_by(events, duck_events):
    got = cumsum_col(events, "cents", on="ts", num_buckets=6).select("event_id", "cents_cumsum")
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id, sum(cents) OVER
                 (ORDER BY ts, event_id, cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cents_cumsum
               FROM ev"""
        ),
    )


def test_rolling_min_periods(events):
    out = rolling_agg(
        events,
        on="ts",
        window=10,
        aggs={"m": ("cents", "mean")},
        by="event_type",
        min_periods=10,
    )
    # the first 9 rows of every event_type have < 10 trailing rows → NULL
    n_types = events.select("event_type").distinct().count()
    assert out.filter(F.col("m").isNull()).count() == 9 * n_types


def test_frame_rolling_api(spark, sf_dir):
    from pd_explain_spark import load_table

    ev = load_table(spark, sf_dir, "events")
    r = ev.rolling("1 hour", on="ts", by="event_type").mean("value")
    assert "value_roll_mean" in r.df.columns
    c = ev.cumsum("value", on="ts", by="event_type")
    assert "value_cumsum" in c.df.columns
