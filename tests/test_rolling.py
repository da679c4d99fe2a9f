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


# ------------------------------------------------- cumulative family / rank
def test_cummax_cummin_bucketed_no_by(events, duck_events):
    got = cumsum_col(events, "cents", on="ts")  # smoke reuse of fixture frame
    from pd_explain_spark.operators.rolling import cumagg_col, rank_col

    got = cumagg_col(events, "cents", on="ts", agg="max", num_buckets=5).select(
        "event_id", "cents_cummax"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id, max(cents) OVER
                 (ORDER BY ts, event_id, cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cents_cummax
               FROM ev"""
        ),
    )
    got = cumagg_col(events, "cents", on="ts", agg="min", by="event_type").select(
        "event_id", "cents_cummin"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id, min(cents) OVER
                 (PARTITION BY event_type
                  ORDER BY ts, event_id, cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cents_cummin
               FROM ev"""
        ),
    )


@pytest.mark.parametrize("method,duck_fn", [("min", "rank()"), ("dense", "dense_rank()")])
def test_rank_bucketed_matches_oracle(events, duck_events, method, duck_fn):
    from pd_explain_spark.operators.rolling import rank_col

    got = rank_col(events, "cents", method=method, num_buckets=6).select(
        "event_id", "cents_rank"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            f"""SELECT event_id, {duck_fn} OVER (ORDER BY cents) AS cents_rank
                FROM ev"""
        ),
    )


def test_rank_descending_and_first(events, duck_events):
    from pd_explain_spark.operators.rolling import rank_col

    got = rank_col(events, "cents", method="min", ascending=False, num_buckets=6).select(
        "event_id", "cents_rank"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            "SELECT event_id, rank() OVER (ORDER BY cents DESC) AS cents_rank FROM ev"
        ),
    )
    # 'first' assigns unique ranks 1..n
    got = rank_col(events, "cents", method="first", num_buckets=6)
    n = got.count()
    assert got.select("cents_rank").distinct().count() == n


def test_pct_change_resample_idxmax(spark, sf_dir, duck_events):
    from pd_explain_spark import load_table

    ev = load_table(spark, sf_dir, "events")
    pc = ev.pct_change("value", on="ts", by="event_type")
    assert "value_pct_change" in pc.df.columns

    r = ev.resample("1 hour", on="ts", by="event_type").agg({"value": "sum"})
    assert_df_equal(
        r.df.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("w"),
            "event_type",
            F.round("value_sum", 6).alias("value_sum"),
        ),
        duck_events.sql(
            """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS w, event_type,
                      round(sum(value), 6) AS value_sum
               FROM events GROUP BY 1, 2"""
        ),
    )

    want = duck_events.sql(
        "SELECT arg_max(event_id, cents) FROM ev"
    ).fetchone()[0]
    from pd_explain_spark import to_explainable
    evc = to_explainable(
        ev.df.select("event_id", F.round(F.col("value") * 100).cast("long").alias("cents")),
        "evc",
    )
    assert evc.idxmax("cents", "event_id") == want


def test_timestamp_ntz_and_tz_order_columns_agree(events):
    """Regression: events.ts arrives as TIMESTAMP_NTZ (parquet micros with
    isAdjustedToUTC=false); unix_micros() alone rejects that type. Every
    ordered operator must accept BOTH timestamp flavors and produce the
    same result on identical instants (session tz is UTC)."""
    from pd_explain_spark.operators.asof import merge_asof

    dts = dict(events.dtypes)["ts"]
    other = "timestamp" if dts == "timestamp_ntz" else "timestamp_ntz"
    flipped = events.withColumn("ts", F.col("ts").cast(other))

    for frame in (events, flipped):
        out = rolling_agg(
            frame, on="ts", window="1 hour",
            aggs={"roll_sum": ("cents", "sum")}, by="event_type",
        )
        assert dict(out.dtypes)["roll_sum"] == "bigint"

    a = rolling_agg(events, on="ts", window="1 hour",
                    aggs={"s": ("cents", "sum")}, by="event_type")
    b = rolling_agg(flipped, on="ts", window="1 hour",
                    aggs={"s": ("cents", "sum")}, by="event_type")
    assert (
        a.select("event_id", "s").exceptAll(b.select("event_id", "s")).count() == 0
    )

    marks = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("ts")
    ).agg(F.avg("cents").alias("mark"))
    j = merge_asof(flipped.limit(200), marks.withColumn("ts", F.col("ts").cast(other)),
                   on="ts", by="event_type")
    assert j.filter(F.col("mark").isNotNull()).count() > 0


def test_epoch_micros_ntz_is_dst_free(spark):
    """NTZ epoch mapping must be linear even in a DST-observing session
    timezone: 01:30 -> 03:30 across the US spring-forward wall clock is
    exactly 2h of micros when the wall clock is read timezone-free."""
    from pd_explain_spark.operators.timeutil import epoch_micros
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.createDataFrame(
            [("2024-03-10 01:30:00",), ("2024-03-10 03:30:00",)], "s string"
        ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
        micros = [
            r[0]
            for r in df.select(epoch_micros(F.col("ts"), "timestamp_ntz")).collect()
        ]
        assert abs(micros[1] - micros[0]) == 2 * 3600 * 1_000_000
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_bucketed_ops_survive_high_bucket_counts(events, duck_events):
    """Scale guard: num_buckets in the hundreds must stay correct AND keep
    the bucket plumbing flat — bucket assignment is a Bucketizer binary
    search and carries are one array-literal lookup (operators/
    bucketing.py), so plan DEPTH no longer grows with num_buckets. With
    the sf0.001 events table most buckets hold 0-2 rows, which also
    stresses the multi-bucket ghost fan-out harder than the default 64."""
    got = cumsum_col(events, "cents", on="ts", num_buckets=256).select(
        "event_id", "cents_cumsum"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id, sum(cents) OVER
                 (ORDER BY ts, event_id, cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cents_cumsum
               FROM ev"""
        ),
    )
    got = shift_col(events, "cents", on="ts", periods=3, num_buckets=256).select(
        "event_id", "cents_shift"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id, lag(cents, 3) OVER (ORDER BY ts, event_id, cents)
                 AS cents_shift FROM ev"""
        ),
    )
    # plan depth stays bounded: the carry lookup is ONE flat array literal,
    # not a 256-arm nested when-chain (string form would blow past 100k
    # chars of CASE WHEN nesting otherwise)
    plan = got._jdf.queryExecution().analyzed().toString()
    assert plan.count("CASE WHEN") < 10


def test_rolling_var_and_median(events, duck_events):
    """pandas rolling(...).var() / .median() parity — var_samp and exact
    median are both plain Spark window aggregates, so they ride the same
    partitioned-window plan as sum/mean (no extra pass, no UDF)."""
    got = rolling_agg(
        events, on="ts", window="1 hour",
        aggs={"roll_var": ("cents", "var"), "roll_med": ("cents", "median")},
        by="event_type",
    ).select("event_id", "roll_var", "roll_med")
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id,
                      var_samp(cents) OVER w AS roll_var,
                      median(cents) OVER w AS roll_med
               FROM ev
               WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
        ),
    )


def test_rank_max_and_average(events, duck_events):
    """pandas rank(method='max'/'average') — derived from the min rank
    plus the ORDER BY peer count in the same window pass. cents has real
    ties at sf0.001, so the tie arithmetic is actually exercised."""
    from pd_explain_spark.operators.rolling import rank_col

    got = rank_col(events, "cents", method="max", num_buckets=6).select(
        "event_id", "cents_rank"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id,
                      CAST(rank() OVER (ORDER BY cents) + count(*) OVER (PARTITION BY cents) - 1
                           AS INT) AS cents_rank
               FROM ev"""
        ),
    )
    got = rank_col(events, "cents", method="average", num_buckets=6).select(
        "event_id", "cents_rank"
    )
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id,
                      rank() OVER (ORDER BY cents)
                        + (count(*) OVER (PARTITION BY cents) - 1) / 2.0 AS cents_rank
               FROM ev"""
        ),
    )


def test_expanding_bucketed_no_by(events, duck_events):
    """Keyless expanding sum/mean/count: one cumagg_multi pass (bucketed
    prefix scan), mean derived as s1/n."""
    from pd_explain_spark.operators.rolling import expanding_agg

    got = expanding_agg(
        events, on="ts",
        aggs={
            "exp_sum": ("cents", "sum"),
            "exp_mean": ("cents", "mean"),
            "exp_n": ("cents", "count"),
        },
        num_buckets=6,
    ).select("event_id", "exp_sum", F.round("exp_mean", 6).alias("exp_mean"), "exp_n")
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id,
                      CAST(sum(cents) OVER w AS BIGINT) AS exp_sum,
                      round(CAST(sum(cents) OVER w AS DOUBLE) / count(cents) OVER w, 6) AS exp_mean,
                      count(cents) OVER w AS exp_n
               FROM ev
               WINDOW w AS (ORDER BY ts, event_id, cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        ),
    )


def test_expanding_var_std_by_key(events, duck_events):
    """Per-key expanding var/std via the sum-of-squares identity vs
    DuckDB's exact window var_samp/stddev_samp (round to absorb the
    identity's FP cancellation)."""
    from pd_explain_spark.operators.rolling import expanding_agg

    got = expanding_agg(
        events, on="ts",
        aggs={"exp_var": ("cents", "var"), "exp_std": ("cents", "std")},
        by="event_type",
    ).select(
        "event_id", F.round("exp_var", 4).alias("exp_var"), F.round("exp_std", 4).alias("exp_std")
    )
    assert_df_equal(
        got,
        duck_events.sql(
            """SELECT event_id,
                      round(var_samp(cents) OVER w, 4) AS exp_var,
                      round(stddev_samp(cents) OVER w, 4) AS exp_std
               FROM ev
               WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id, cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        ),
    )


def test_expanding_min_periods_masks_early_rows(events):
    from pd_explain_spark.operators.rolling import expanding_agg

    out = expanding_agg(
        events, on="ts", aggs={"m": ("cents", "mean")}, by="event_type", min_periods=5
    )
    # each group's first 4 rows must be NULL, later rows populated
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("ts", "event_id", "cents")
    flagged = out.withColumn("__rn", F.row_number().over(w))
    assert flagged.filter((F.col("__rn") < 5) & F.col("m").isNotNull()).count() == 0
    assert flagged.filter((F.col("__rn") >= 5) & F.col("m").isNull()).count() == 0


def test_ewm_mean_matches_pandas_by_key(events):
    """Distributed ewm vs pandas' exact recursion, per event_type."""
    import pandas as pd

    from pd_explain_spark.operators.ewm import ewm_mean

    got = (
        ewm_mean(events, "cents", on="ts", alpha=0.25, by="event_type")
        .select("event_id", "event_type", "ts", "cents", "cents_ewm")
        .toPandas()
        .sort_values(["event_type", "ts", "event_id"], ignore_index=True)
    )
    want = (
        got[["event_id", "event_type", "ts", "cents"]]
        .assign(
            ref=lambda d: d.groupby("event_type")["cents"].transform(
                lambda s: s.ewm(alpha=0.25, adjust=True).mean()
            )
        )
    )
    assert (got["cents_ewm"] - want["ref"]).abs().max() < 1e-9


def test_ewm_mean_matches_pandas_keyless_bucketed(events):
    """Keyless global ewm: bucketed + ghost-row lookback, vs pandas over
    the fully sorted stream. Small num_buckets so the cross-bucket ghost
    path is really exercised."""
    from pd_explain_spark.operators.ewm import ewm_mean

    got = (
        ewm_mean(events, "cents", on="ts", alpha=0.4, num_buckets=5)
        .select("event_id", "ts", "cents", "cents_ewm")
        .toPandas()
        .sort_values(["ts", "event_id"], ignore_index=True)
    )
    ref = got["cents"].ewm(alpha=0.4, adjust=True).mean()
    assert (got["cents_ewm"] - ref).abs().max() < 1e-9


def test_ewm_mean_skips_nulls_like_pandas(spark):
    import pandas as pd

    from pd_explain_spark.operators.ewm import ewm_mean

    pdf = pd.DataFrame(
        {"i": range(12), "x": [1.0, None, 3.0, None, None, 6.0, 7.0, None, 9.0, 10.0, None, 12.0]}
    )
    df = spark.createDataFrame(pdf)
    got = (
        ewm_mean(df, "x", on="i", alpha=0.5, num_buckets=3)
        .select("i", "x_ewm")
        .toPandas()
        .sort_values("i", ignore_index=True)
    )
    ref = pdf["x"].ewm(alpha=0.5, adjust=True, ignore_na=False).mean()
    import numpy as np

    assert np.allclose(got["x_ewm"].to_numpy(), ref.to_numpy(), atol=1e-12, equal_nan=True)


def test_fill_ordered_matches_oracle(spark, duck, sf_dir):
    """ffill/bfill vs DuckDB's IGNORE NULLS window fills, on a column
    with planted NULLs, keyless (bucketed + boundary carry) AND by-key."""
    import os

    from pd_explain_spark.operators.rolling import fill_ordered
    from pd_explain_spark.sources.readers import read_parquet_df

    ev = read_parquet_df(spark, os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "event_type",
        F.when(F.col("event_id") % 3 != 0, F.round(F.col("value") * 100).cast("long")).alias("v"),
    )
    duck.execute(
        f"""CREATE OR REPLACE VIEW evn AS
            SELECT event_id, ts, event_type,
                   CASE WHEN event_id % 3 <> 0 THEN CAST(round(value*100) AS BIGINT) END AS v
            FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')"""
    )
    for method, fn in (("ffill", "last_value"), ("bfill", "first_value")):
        frame = (
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            if method == "ffill"
            else "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
        )
        got = fill_ordered(ev, "v", on="ts", method=method, num_buckets=5).select(
            "event_id", "v"
        )
        assert_df_equal(
            got,
            duck.sql(
                f"""SELECT event_id, {fn}(v IGNORE NULLS) OVER
                      (ORDER BY ts, event_id, event_type, v {frame}) AS v
                    FROM evn"""
            ),
        )
        got_by = fill_ordered(ev, "v", on="ts", method=method, by="event_type").select(
            "event_id", "v"
        )
        assert_df_equal(
            got_by,
            duck.sql(
                f"""SELECT event_id, {fn}(v IGNORE NULLS) OVER
                      (PARTITION BY event_type ORDER BY ts, event_id, v {frame}) AS v
                    FROM evn"""
            ),
        )


def test_interpolate_ordered_matches_pandas(spark):
    """Linear (time-weighted) interpolation vs pandas interpolate
    (method='time' on a numeric index == 'index'): interior NULL runs
    lerped, leading NULLs kept, trailing NULLs forward-filled. Keyless
    path with tiny buckets so NULL runs cross bucket boundaries."""
    import numpy as np
    import pandas as pd

    from pd_explain_spark.operators.rolling import interpolate_ordered

    rng = np.random.default_rng(7)
    t = np.sort(rng.choice(np.arange(0, 3000), size=220, replace=False)).astype(float)
    v = rng.normal(50, 10, 220)
    mask = rng.random(220) < 0.35
    mask[:3] = True   # leading NULL run
    mask[-3:] = True  # trailing NULL run
    v_masked = np.where(mask, np.nan, v)
    pdf = pd.DataFrame({"t": t, "v": v_masked})
    df = spark.createDataFrame(pdf)

    got = (
        interpolate_ordered(df, "v", on="t", num_buckets=4)
        .toPandas()
        .sort_values("t", ignore_index=True)
    )
    want = pdf.set_index("t")["v"].interpolate(method="index").reset_index(drop=True)
    g = got["v"].to_numpy()
    w = want.to_numpy()
    assert np.isnan(g[:3]).all()  # leading stays NULL
    both = ~np.isnan(w)
    assert np.allclose(g[both], w[both], atol=1e-5)


def test_pct_change_zero_lag_matches_pandas(spark):
    """A zero previous value follows pandas / IEEE-754 instead of
    raising under Spark 4's ANSI division: v/0 -> +-inf, 0/0 -> NaN,
    null v or null lag -> null. Surfaced by the r8 noop-write bench at
    sf0.1 (the count()-pruned bench and zero-free sf0.01 correctness
    runs never executed the division)."""
    import math

    import pandas as pd

    from pd_explain_spark import to_explainable

    pdf = pd.DataFrame(
        {
            "ts": [1, 2, 3, 4, 5, 6],
            "value": [0.0, 5.0, 0.0, -2.0, 0.0, 0.0],
        }
    )
    want = pdf["value"].pct_change(fill_method=None).tolist()
    got = (
        to_explainable(spark.createDataFrame(pdf), "z")
        .pct_change("value", on="ts")
        .df.orderBy("ts")
        .select("value_pct_change")
        .collect()
    )
    got = [r[0] for r in got]
    assert got[0] is None and math.isnan(want[0])
    for g, w in zip(got[1:], want[1:]):
        if math.isnan(w):
            assert g is not None and math.isnan(g)
        else:
            assert g == w


def test_pct_change_negative_zero_lag_sign(spark):
    """A NEGATIVE-zero lag flips the infinity sign (IEEE v / -0.0), the
    case Spark's -0.0 == 0.0 comparison semantics would otherwise fold
    into the +0.0 branch — differential vs pandas."""
    import math

    import pandas as pd

    from pd_explain_spark import to_explainable

    pdf = pd.DataFrame(
        {"ts": [1, 2, 3, 4, 5], "value": [-0.0, 5.0, -0.0, -2.0, 0.0]}
    )
    want = pdf["value"].pct_change(fill_method=None).tolist()
    got = [
        r[0]
        for r in to_explainable(spark.createDataFrame(pdf), "nz")
        .pct_change("value", on="ts")
        .df.orderBy("ts")
        .select("value_pct_change")
        .collect()
    ]
    assert got[1] == want[1] == float("-inf")   # 5 / -0.0
    assert got[3] == want[3] == float("inf")    # -2 / -0.0
    assert got[4] == want[4] == -1.0            # (0 - -2) / -2
    # 0 / -0.0 is NaN regardless of the zero's sign
    pdf2 = pd.DataFrame({"ts": [1, 2], "value": [-0.0, 0.0]})
    want2 = pdf2["value"].pct_change(fill_method=None).tolist()
    got2 = [
        r[0]
        for r in to_explainable(spark.createDataFrame(pdf2), "nz2")
        .pct_change("value", on="ts")
        .df.orderBy("ts")
        .select("value_pct_change")
        .collect()
    ]
    assert math.isnan(got2[1]) and math.isnan(want2[1])
