"""merge_asof differential tests against pandas.merge_asof.

pandas is the semantics oracle here (the reference exposes the pandas
API, so pd.merge_asof IS the contract); the DuckDB ASOF JOIN oracle for
the driver lives in __spark_entry__ (`asof_join_events`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pd_explain_spark.operators.asof import merge_asof


def _random_frames(seed: int, n_left=200, n_right=60, n_sym=4):
    rng = np.random.default_rng(seed)
    lpd = pd.DataFrame(
        {
            "ts": rng.uniform(0, 100, n_left).round(3),
            "sym": rng.choice([f"s{i}" for i in range(n_sym)], n_left),
            "lv": np.arange(n_left),
        }
    )
    rpd = pd.DataFrame(
        {
            "ts": rng.uniform(0, 100, n_right).round(3),
            "sym": rng.choice([f"s{i}" for i in range(n_sym)], n_right),
            "rv": np.arange(n_right) * 10.0,
        }
    )
    # merge_asof requires unique (sym, ts) on the right for a deterministic
    # answer; drop collisions (ts already near-unique at 3 decimals)
    rpd = rpd.drop_duplicates(subset=["sym", "ts"]).drop_duplicates(subset=["ts"])
    lpd = lpd.drop_duplicates(subset=["ts"])
    return lpd, rpd


def _expect(lpd, rpd, **kw):
    out = pd.merge_asof(lpd.sort_values("ts"), rpd.sort_values("ts"), on="ts", **kw)
    return out.sort_values(["ts"]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("use_by", [True, False])
def test_merge_asof_matches_pandas(spark, direction, use_by):
    lpd, rpd = _random_frames(seed=7)
    l, r = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    kw = {"by": "sym"} if use_by else {}
    got = (
        merge_asof(l, r, on="ts", direction=direction, num_buckets=8, **({"by": ["sym"]} if use_by else {}))
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    want = _expect(lpd, rpd, direction=direction, **kw)
    lcol = "lv"
    assert got[lcol].tolist() == want[lcol].tolist()
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist(), direction


def test_merge_asof_tolerance_and_exact(spark):
    lpd, rpd = _random_frames(seed=11)
    l, r = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    got = (
        merge_asof(l, r, on="ts", by=["sym"], tolerance=5.0)
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    want = _expect(lpd, rpd, by="sym", tolerance=5.0)
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()

    got = (
        merge_asof(l, r, on="ts", by=["sym"], allow_exact_matches=False)
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    want = _expect(lpd, rpd, by="sym", allow_exact_matches=False)
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()


def test_merge_asof_timestamp_on(spark):
    base = pd.Timestamp("2024-01-01")
    lpd = pd.DataFrame(
        {"ts": [base + pd.Timedelta(minutes=m) for m in [1, 30, 65, 200]], "lv": [1, 2, 3, 4]}
    )
    rpd = pd.DataFrame(
        {"ts": [base + pd.Timedelta(minutes=m) for m in [0, 60, 120]], "rv": [10.0, 20.0, 30.0]}
    )
    l, r = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    got = merge_asof(l, r, on="ts", num_buckets=2).toPandas().sort_values("ts")
    assert got["rv"].tolist() == [10.0, 10.0, 20.0, 30.0]
    # tolerance in SECONDS for timestamp on-columns
    got = merge_asof(l, r, on="ts", tolerance=10 * 60, num_buckets=2).toPandas().sort_values("ts")
    assert got["rv"].fillna(-1).tolist() == [10.0, -1, 20.0, -1]


def test_merge_asof_suffix_and_missing_key(spark):
    lpd = pd.DataFrame({"ts": [1.0], "v": [1]})
    rpd = pd.DataFrame({"ts": [0.5], "v": [2]})
    l, r = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    out = merge_asof(l, r, on="ts")
    assert "v_right" in out.columns and "v" in out.columns
    with pytest.raises(KeyError):
        merge_asof(l, r, on="nope")


# ---------------------------------------------------------------- range join
def test_range_join_matches_inequality_join(spark, duck, sf_dir):
    """Bucketed range join == DuckDB's naive inequality join, including an
    interval spanning many buckets and overlapping intervals (a value in
    two bands matches both)."""
    import os

    from pd_explain_spark.operators.rangejoin import range_join
    from pd_explain_spark.sources.readers import read_parquet_df
    from pyspark.sql import functions as F

    ev = read_parquet_df(spark, os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "value"
    )
    bands = spark.createDataFrame(
        [
            ("tiny", 0.0, 5.0),
            ("low", 5.0, 20.0),
            ("mid", 20.0, 60.0),
            ("wide", 10.0, 90.0),   # spans several buckets AND overlaps low/mid/high
            ("high", 60.0, 100.0),
            ("all", -1e9, 1e9),     # covers every bucket
        ],
        "band string, lo double, hi double",
    )
    got = range_join(ev, bands, on="value", lo="lo", hi="hi", closed="left", num_buckets=8)
    duck.execute("CREATE OR REPLACE TABLE bands(band VARCHAR, lo DOUBLE, hi DOUBLE)")
    duck.execute(
        """INSERT INTO bands VALUES ('tiny',0,5),('low',5,20),('mid',20,60),
           ('wide',10,90),('high',60,100),('all',-1e9,1e9)"""
    )
    from tests.conftest import assert_df_equal

    assert_df_equal(
        got.select("event_id", "band"),
        duck.sql(
            """SELECT e.event_id, b.band FROM events e
               JOIN bands b ON e.value >= b.lo AND e.value < b.hi"""
        ),
    )
    # left join keeps non-matching rows with NULL band
    narrow = bands.filter(F.col("band") == "tiny")
    lgot = range_join(ev, narrow, on="value", lo="lo", hi="hi", how="left", closed="left")
    assert lgot.count() >= ev.count()
    assert lgot.filter(F.col("band").isNull()).count() == ev.filter(
        ~((F.col("value") >= 0.0) & (F.col("value") < 5.0))
    ).count()


def test_range_join_never_nested_loop(spark, sf_dir):
    """The plan must be a hash equi-join on the bucket id — never
    BroadcastNestedLoopJoin / CartesianProduct, which is what naked
    inequality predicates plan as and what dies at 100 TB."""
    import os

    from pd_explain_spark.operators.rangejoin import range_join
    from pd_explain_spark.sources.readers import read_parquet_df

    ev = read_parquet_df(spark, os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "value"
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 50.0, 100.0)], "band string, lo double, hi double"
    )
    out = range_join(ev, bands, on="value", lo="lo", hi="hi")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
