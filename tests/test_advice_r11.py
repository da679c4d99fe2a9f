"""Regression pins for the round-10 ADVICE fixes.

Each test nails one reviewed defect so it cannot silently return:
the checkpoint fault-tolerance gate, the compound-interval validator
grammar, typed audio codec errors, non-finite SQL double literals, and
the bench retime load instrumentation.
"""

from __future__ import annotations

import datetime

import pytest

from pd_explain_spark.session import checkpoint_df, get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("advice_r11")


# ---------------------------------------------------------------- checkpoint gate


def test_checkpoint_df_local_without_dir(spark):
    # no checkpoint dir configured -> localCheckpoint flavor: the plan
    # collapses to a scan leaf and the data survives
    if spark.sparkContext.getCheckpointDir():
        pytest.skip("a checkpoint dir leaked in from another test")
    df = checkpoint_df(spark.range(10).selectExpr("id", "id * 2 AS v"))
    assert df.count() == 10
    assert "Scan ExistingRDD" in df._jdf.queryExecution().executedPlan().toString()


def test_checkpoint_df_reliable_with_dir(spark, tmp_path):
    # a configured checkpoint dir (the cluster deployment shape) switches
    # to RELIABLE checkpoint: blocks land in the dir, results identical
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        df = checkpoint_df(spark.range(10).selectExpr("id", "id * 2 AS v"))
        assert df.count() == 10
        assert any((tmp_path / "ckpt").rglob("*")), "checkpoint dir unused"
    finally:
        # PySpark has no unset API; point it at a scratch dir so later
        # tests see a fresh-but-valid config rather than this tmp_path
        spark.sparkContext.setCheckpointDir("/tmp/spark_graft_ckpt_tests")


def test_duplicate_components_identical_on_both_paths(spark, tmp_path):
    from pd_explain_spark.functions.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a bigint, id_b bigint",
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc"))
    try:
        reliable = sorted(map(tuple, duplicate_components(pairs).collect()))
    finally:
        spark.sparkContext.setCheckpointDir("/tmp/spark_graft_ckpt_tests")
    assert len({c for _, c in reliable}) == 3
    assert all(c == min(i, c) for i, c in reliable)


# ---------------------------------------------------------------- interval grammar


def test_validate_within_accepts_compound_daytime():
    from pd_explain_spark.functions.events import _validate_within

    assert _validate_within("1 hour 30 minutes") == "1 HOUR 30 MINUTE"
    assert _validate_within("2 days 4 hours 5 seconds") == "2 DAY 4 HOUR 5 SECOND"


def test_validate_within_accepts_yearmonth_single_family():
    from pd_explain_spark.functions.events import _validate_within

    assert _validate_within("1 month") == "1 MONTH"
    assert _validate_within("1 year 6 months") == "1 YEAR 6 MONTH"


@pytest.mark.parametrize(
    "bad",
    [
        "1 month 3 days",  # mixes ANSI interval families
        "0 seconds",  # non-positive
        "0 hours 0 minutes",
        "5 fortnights",  # unknown unit
        "1 hour 2 hours",  # repeated unit
        "1 hour; DROP TABLE x",  # injection shape
        "",
    ],
)
def test_validate_within_rejects(bad):
    from pd_explain_spark.functions.events import _validate_within

    with pytest.raises(ValueError):
        _validate_within(bad)


def test_validate_within_timedelta_and_none():
    from pd_explain_spark.functions.events import _validate_within

    assert _validate_within(datetime.timedelta(minutes=5)) == "300000000 MICROSECOND"
    assert _validate_within(None) is None
    with pytest.raises(ValueError):
        _validate_within(None, required=True)


def test_sessionize_compound_gap_parses(spark):
    from pd_explain_spark.streaming.windows import sessionize

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 01:00:00"),
         (1, "2024-01-01 03:00:00")],
        "user_id bigint, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    # 1h30m gap: the 1h step stays in-session, the 2h step breaks it
    assert sessionize(ev, gap="1 hour 30 minutes").count() == 2


# ---------------------------------------------------------------- audio codec typing


def test_wav_decode_unsupported_codec_is_typed():
    from pd_explain_spark.functions.multimodal import (
        UnsupportedCodecError,
        _wav_decode,
    )

    for payload in (b"ID3\x04rest-of-mp3", b"OggS....", b"fLaC....",
                    b"\xff\xfb\x90\x00", b"\x00\x00\x00 ftypM4A "):
        with pytest.raises(UnsupportedCodecError):
            _wav_decode(payload)
    # corrupt garbage stays a PLAIN ValueError (never the typed one)
    with pytest.raises(ValueError) as ei:
        _wav_decode(b"garbage-not-audio")
    assert not isinstance(ei.value, UnsupportedCodecError)


def test_audio_features_raises_on_mp3_even_without_pcm_in_message(spark):
    from pd_explain_spark.functions.multimodal import audio_features

    rows = spark.createDataFrame(
        [(1, "audio", bytearray(b"ID3\x04fake-mp3-payload"))],
        "media_id bigint, kind string, payload binary",
    )
    with pytest.raises(Exception) as ei:
        audio_features(rows, unsupported="raise").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    # null mode: same payload -> NULL features, no crash
    out = audio_features(rows, unsupported="null").collect()
    assert len(out) == 1 and out[0]["n_samples"] is None


def test_audio_features_validates_mode_param(spark):
    from pd_explain_spark.functions.multimodal import audio_features

    rows = spark.createDataFrame(
        [(1, "audio", bytearray(b"x"))],
        "media_id bigint, kind string, payload binary",
    )
    with pytest.raises(ValueError, match="raise.*null|null.*raise"):
        audio_features(rows, unsupported="bogus")


# ---------------------------------------------------------------- SQL double literals


def test_sql_double_array_nonfinite_parses(spark):
    from pyspark.sql import functions as F

    from pd_explain_spark.functions.similarity import _sql_double_array

    expr = _sql_double_array([1.5, float("nan"), float("inf"), float("-inf")])
    row = spark.range(1).select(F.expr(expr).alias("a")).collect()[0]
    vals = row["a"]
    assert vals[0] == 1.5
    assert vals[1] != vals[1]  # NaN
    assert vals[2] == float("inf") and vals[3] == float("-inf")


# ---------------------------------------------------------------- bench retime guard


def test_bench_load_instrumentation():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert bench.RETIME_LOAD_MAX >= 4.0
    load = bench._loadavg1()
    assert load is None or load >= 0.0
