"""Regression pins for the round-11 ADVICE fixes.

Each test nails one reviewed defect so it cannot silently return:
the events __all__ export gap, the reliable-checkpoint file cleaner,
the bootstrap replicate-census fail-loud guard, and the
column-pruning-proof Mann-Whitney empty-side guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pd_explain_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("advice_r12")


# ---------------------------------------------------------------- __all__ export


def test_rfm_segments_in_events_module_all():
    # rfm_segments was exported from the package __init__ but missing
    # from events.py's own __all__, so `from ...events import *`
    # silently dropped it
    from pd_explain_spark.functions import events

    assert "rfm_segments" in events.__all__
    ns: dict = {}
    exec("from pd_explain_spark.functions.events import *", ns)
    assert callable(ns["rfm_segments"])


def test_package_all_subset_of_module_alls():
    # the same gap anywhere else: every function the package __init__
    # re-exports from functions/* must appear in its home module __all__
    import importlib
    import inspect

    import pd_explain_spark as pkg

    for name in getattr(pkg, "__all__", []):
        obj = getattr(pkg, name)
        if not inspect.isfunction(obj):
            continue
        mod_name = obj.__module__
        if not mod_name.startswith("pd_explain_spark.functions."):
            continue
        mod = importlib.import_module(mod_name)
        mod_all = getattr(mod, "__all__", None)
        if mod_all is not None:
            assert name in mod_all, f"{name} missing from {mod_name}.__all__"


# ---------------------------------------------------------------- checkpoint cleaner


def test_checkpoint_file_cleaner_enabled(spark):
    # checkpoint_df switches iterative loops to reliable checkpoint()
    # when a dir is configured; without the reference-tracking cleaner
    # the dir grows unboundedly per round on exactly that cluster shape
    assert (
        spark.conf.get("spark.cleaner.referenceTracking.cleanCheckpoints")
        == "true"
    )


# ---------------------------------------------------------------- bootstrap census


def test_bootstrap_mean_ci_fails_loud_on_tiny_input(spark):
    # one row cannot populate all 100 Poisson replicate lanes (w=0 lanes
    # are dropped); the rank lookup must raise, not return NULL lo/hi
    from pd_explain_spark.functions.profiling import bootstrap_mean_ci

    tiny = spark.createDataFrame([(1, 10.0)], "event_id bigint, value double")
    out = bootstrap_mean_ci(tiny, "value", "event_id", n_boot=100, seed=42)
    with pytest.raises(Exception, match="replicates have non-zero weight"):
        out.collect()


def test_bootstrap_mean_ci_guard_survives_column_pruning(spark):
    from pd_explain_spark.functions.profiling import bootstrap_mean_ci

    tiny = spark.createDataFrame([(1, 10.0)], "event_id bigint, value double")
    out = bootstrap_mean_ci(tiny, "value", "event_id", n_boot=100, seed=42)
    with pytest.raises(Exception, match="replicates have non-zero weight"):
        out.select("hi_micro").collect()


def test_bootstrap_mean_ci_normal_path_unchanged(spark):
    from pd_explain_spark.functions.profiling import bootstrap_mean_ci

    df = spark.range(500).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 17).cast("double").alias("value"),
    )
    row = bootstrap_mean_ci(df, "value", "event_id", n_boot=100, seed=42).first()
    assert row["n"] == 500
    assert row["lo_micro"] is not None and row["hi_micro"] is not None
    assert row["lo_micro"] <= row["mean_micro"] <= row["hi_micro"]


# ---------------------------------------------------------------- MWU pruning guard


def test_mann_whitney_empty_side_raises_even_when_n_a_pruned(spark):
    # the guard used to live only in the n_a output column; selecting
    # u_micro alone let Catalyst prune the raise_error and emit garbage
    from pd_explain_spark.functions.drift import mann_whitney_u

    a = spark.createDataFrame([(float(i),) for i in range(5)], "v double")
    b = spark.createDataFrame([], "v double")
    out = mann_whitney_u(a, b, "v")
    for col in ("u_micro", "z_micro", "n_b"):
        with pytest.raises(Exception, match="empty sample side"):
            out.select(col).collect()


def test_mann_whitney_normal_path_unchanged(spark):
    from pd_explain_spark.functions.drift import mann_whitney_u

    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    b = spark.createDataFrame([(float(i) + 2.0,) for i in range(10)], "v double")
    row = mann_whitney_u(a, b, "v").first()
    assert row["n_a"] == 10 and row["n_b"] == 10
    # shifted-up B: U_a below the n_a*n_b/2 midpoint, z negative
    assert row["z_micro"] < 0
