"""Regression pins for the round-9 ADVICE findings (fixed in r10).

1. k_anonymize_generalize: iterative local recoding — released classes
   must reach k among PUBLISHED rows (test lives in test_governance.py).
2. kaplan_meier: fail loud (raise_error in the plan) instead of an
   arbitrary silent .limit() truncation when distinct durations exceed
   max_durations.
3. gram_moments: int64 batch Gram matmul must not wrap silently —
   chunked / object-dtype fallback keeps the moments exact for any
   magnitude.
4. robust_anomalies: input frames that already carry med/mad columns
   raise a clear error instead of an ambiguous-reference failure.
5. funnel_user_times / sessionize / interval_join: the time-window
   string is validated up front (ValueError naming the bad value), and
   datetime.timedelta is accepted.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- kaplan_meier


def test_kaplan_meier_raises_beyond_max_durations(spark):
    from pd_explain_spark.functions.events import kaplan_meier

    rows = [(i, i % 2) for i in range(1, 21)]  # 20 distinct durations
    df = spark.createDataFrame(rows, "dur INT, event INT")
    with pytest.raises(Exception, match="max_durations"):
        kaplan_meier(df, "dur", "event", max_durations=10).collect()
    # under the bound the same frame computes normally
    assert kaplan_meier(df, "dur", "event", max_durations=20).count() == 10


def test_kaplan_meier_curve_unchanged_by_guard(spark):
    """The textbook check still holds with the guard in the plan:
    6 subjects, events at t=1 (1 of 6) and t=3 (1 of 4), censored 2,4,5.
    S(1) = 5/6, S(3) = 5/6 * 3/4 = 0.625."""
    from pd_explain_spark.functions.events import kaplan_meier

    rows = [(1, 1), (2, 0), (3, 1), (3, 0), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, "dur INT, event INT")
    out = {r["duration"]: r for r in kaplan_meier(df, "dur", "event").collect()}
    assert out[1]["n_at_risk"] == 6 and out[1]["n_events"] == 1
    assert out[1]["survival_micro"] == 833333
    assert out[3]["n_at_risk"] == 4 and out[3]["survival_micro"] == 625000


# ------------------------------------------------------------- gram_moments


def _py_moments(vecs, scale):
    q = [[round(x * scale) for x in v] for v in vecs]
    d = len(q[0])
    sums = [sum(r[i] for r in q) for i in range(d)]
    S = [[sum(r[i] * r[j] for r in q) for j in range(d)] for i in range(d)]
    return len(q), sums, S


def test_gram_moments_exact_beyond_int64_matmul(spark):
    """q values at scale=1e9: a single row's q^2 = 2.5e19 > 2^63, so a
    plain int64 matmul would wrap silently — the object-dtype fallback
    must keep every moment exact."""
    from pd_explain_spark.functions.linalg import gram_moments

    vecs = [[5.0, -3.0], [4.0, 2.0], [-5.0, 5.0]]
    df = spark.createDataFrame([(v,) for v in vecs], "embedding array<double>")
    got = gram_moments(df, scale=1_000_000_000)
    assert got == _py_moments(vecs, 1_000_000_000)


def test_gram_moments_exact_chunked_large_batch(spark):
    """Moderate magnitudes where one row is safe but a big Arrow batch
    is not: 4000 rows of q ~ 2e9 -> batch * A^2 ~ 1.6e22 >> 2^63. The
    row-chunked path must agree with exact Python math."""
    from pd_explain_spark.functions.linalg import gram_moments

    vecs = [[2.0 + (i % 7) * 0.001, -1.0 - (i % 5) * 0.002] for i in range(4000)]
    df = (
        spark.createDataFrame([(v,) for v in vecs], "embedding array<double>")
        .coalesce(1)
    )
    got = gram_moments(df, scale=1_000_000_000)
    assert got == _py_moments(vecs, 1_000_000_000)


# --------------------------------------------------------- robust_anomalies


def test_robust_anomalies_rejects_med_mad_collision(spark):
    from pd_explain_spark.functions.drift import robust_anomalies

    df = spark.createDataFrame(
        [(1, 1.0, 0.0)], "g INT, value DOUBLE, med DOUBLE"
    )
    with pytest.raises(ValueError, match="med"):
        robust_anomalies(df, "value", by=["g"])


# ------------------------------------------------------- within validation


def test_funnel_within_validation(spark):
    from pd_explain_spark.functions.events import funnel_user_times

    df = spark.createDataFrame(
        [(1, "view", datetime.datetime(2024, 1, 1))],
        "user_id INT, event_type STRING, ts TIMESTAMP",
    )
    for bad in ("nonsense", "10 parsecs", "1 hour); DROP TABLE x", "-3 days"):
        with pytest.raises(ValueError, match="within"):
            funnel_user_times(df, ["view", "click"], within=bad)
    # timedelta and '<int> <unit>' both build a valid plan
    funnel_user_times(df, ["view", "click"], within="90 minutes").collect()
    funnel_user_times(
        df, ["view", "click"], within=datetime.timedelta(hours=1, seconds=30)
    ).collect()
    with pytest.raises(ValueError, match="positive"):
        funnel_user_times(df, ["view", "click"], within=datetime.timedelta(0))


def test_funnel_timedelta_equals_string_window(spark):
    from pd_explain_spark.functions.events import funnel_user_times

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "view", t0), (1, "click", t0 + datetime.timedelta(minutes=50)),
        (2, "view", t0), (2, "click", t0 + datetime.timedelta(minutes=70)),
    ]
    df = spark.createDataFrame(rows, "user_id INT, event_type STRING, ts TIMESTAMP")

    def conv(within):
        out = funnel_user_times(df, ["view", "click"], within=within).collect()
        return sorted(r["user_id"] for r in out if r["t_click"] is not None)

    assert conv("1 hour") == [1]
    assert conv(datetime.timedelta(hours=1)) == [1]


def test_sessionize_and_interval_join_validate_window(spark):
    from pd_explain_spark.streaming.windows import interval_join, sessionize

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)],
        "user_id INT, ts TIMESTAMP, value DOUBLE",
    )
    with pytest.raises(ValueError, match="within"):
        sessionize(df, gap="30 furlongs")
    with pytest.raises(ValueError, match="required"):
        sessionize(df, gap=None)
    with pytest.raises(ValueError, match="within"):
        interval_join(df, df, on="user_id", within="x' OR 1=1")


# ----------------------------------------------------------- train_bpe guard


def test_train_bpe_auto_routes_over_ceiling_to_distributed(spark):
    """VERDICT r9 task #5: an over-ceiling distinct-word table must NOT
    reach the driver trainer's collect. auto -> distributed (same merge
    sequence — asserted here), explicit driver -> ValueError."""
    import pd_explain_spark.functions.bpe as bpe

    rows = [(i, f"w{i} w{i} shared pair shared pair") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")

    # the corpus has > 5 distinct words -> over the planted ceiling
    called = {"driver": 0}
    orig = bpe._train_bpe_driver

    def spy(*a, **k):
        called["driver"] += 1
        return orig(*a, **k)

    bpe._train_bpe_driver = spy
    try:
        m_auto, _ = bpe.train_bpe(df, num_merges=3, max_words=5, strategy="auto")
        auto_merges = [(r["rank"], r["left"], r["right"]) for r in m_auto.collect()]
        assert called["driver"] == 0, "auto must not collect an over-ceiling table"
        with pytest.raises(ValueError, match="max_words"):
            bpe.train_bpe(df, num_merges=3, max_words=5, strategy="driver")
        # under the ceiling the driver path runs and learns the same merges
        m_drv, _ = bpe.train_bpe(df, num_merges=3, max_words=10_000, strategy="auto")
        drv_merges = [(r["rank"], r["left"], r["right"]) for r in m_drv.collect()]
        assert called["driver"] == 1
        assert drv_merges == auto_merges
    finally:
        bpe._train_bpe_driver = orig


def test_get_dummies_category_ceiling(spark):
    """The last unbounded driver collect (r9 VERDICT soft spot): the
    distinct-category discovery probes at most max_categories+1 rows
    and raises over the ceiling; values= skips discovery entirely."""
    from pd_explain_spark import to_explainable

    df = spark.createDataFrame([(i, f"c{i}") for i in range(20)], "id INT, cat STRING")
    e = to_explainable(df, name="t")
    with pytest.raises(ValueError, match="max_categories"):
        e.get_dummies("cat", max_categories=5)
    # explicit values bypass discovery even over the ceiling
    out = e.get_dummies("cat", values=["c1", "c2"], max_categories=5)
    assert "cat_c1" in out.df.columns and "cat_c2" in out.df.columns
    # under the ceiling the discovery path still works
    assert len(e.get_dummies("cat").df.columns) == 2 + 20
