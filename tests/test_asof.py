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
