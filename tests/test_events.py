"""Product-analytics operators (functions/events.py): ordered-funnel
strictness and cohort-retention arithmetic on planted event logs."""

import datetime as dt

import pytest

from pd_explain_spark.functions.events import cohort_retention, event_funnel


def _ts(day, hour=0):
    return dt.datetime(2024, 3, day, hour)


def test_event_funnel_respects_order_and_strictness(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, "view", _ts(1, 1)), (1, "click", _ts(1, 2)), (1, "purchase", _ts(1, 3)),
        # u2's only click is BEFORE its view -> stops at view
        (2, "click", _ts(1, 1)), (2, "view", _ts(1, 2)),
        # u3 stops at click (no purchase)
        (3, "view", _ts(2, 1)), (3, "click", _ts(2, 2)),
        # u4 purchases without ever viewing -> counts nowhere
        (4, "purchase", _ts(1, 1)),
        # u5: click at the SAME timestamp as view -> strictly-after fails
        (5, "view", _ts(3, 4)), (5, "click", _ts(3, 4)),
        # null user/ts rows are ignored
        (None, "view", _ts(1, 1)), (6, "view", None),
    ]
    df = spark.createDataFrame(rows, "user_id INT, event_type STRING, ts TIMESTAMP")
    out = {r["step"]: r for r in
           event_funnel(df, ["view", "click", "purchase"]).collect()}
    assert [out[s]["step_order"] for s in ("view", "click", "purchase")] == [0, 1, 2]
    assert out["view"]["n_users"] == 4          # u1, u2, u3, u5
    assert out["click"]["n_users"] == 2         # u1, u3
    assert out["purchase"]["n_users"] == 1      # u1
    assert out["view"]["conversion_micro"] == 1_000_000
    assert out["click"]["conversion_micro"] == 500_000
    assert out["purchase"]["conversion_micro"] == 250_000


def test_event_funnel_empty_step0_and_guards(spark):
    df = spark.createDataFrame(
        [(1, "click", _ts(1))], "user_id INT, event_type STRING, ts TIMESTAMP"
    )
    out = {r["step"]: r for r in event_funnel(df, ["view", "click"]).collect()}
    assert out["view"]["n_users"] == 0 and out["view"]["conversion_micro"] is None
    assert out["click"]["n_users"] == 0
    with pytest.raises(ValueError):
        event_funnel(df, ["view"])
    with pytest.raises(ValueError):
        event_funnel(df, ["view", "view"])


def test_cohort_retention_arithmetic(spark):
    rows = [
        (1, _ts(1, 1)), (1, _ts(1, 9)), (1, _ts(2, 1)),   # cohort d1, back on d2
        (2, _ts(1, 5)),                                    # cohort d1, never back
        (3, _ts(2, 3)), (3, _ts(4, 3)),                    # cohort d2, back at +2
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    got = {
        (r["cohort_day"], r["day_offset"]): (r["n_users"], r["retention_micro"])
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-03-01", 0): (2, 1_000_000),
        ("2024-03-01", 1): (1, 500_000),
        ("2024-03-02", 0): (1, 1_000_000),
        ("2024-03-02", 2): (1, 1_000_000),
    }


def test_event_funnel_conversion_window(spark):
    """within= bounds each step to the conversion window after the
    previous anchor: a purchase 3 days after the click drops out of a
    '1 day' funnel but stays in the unbounded one."""
    rows = [
        (1, "view", _ts(1, 1)), (1, "click", _ts(1, 2)), (1, "purchase", _ts(4, 2)),
        (2, "view", _ts(1, 1)), (2, "click", _ts(1, 2)), (2, "purchase", _ts(1, 3)),
    ]
    df = spark.createDataFrame(rows, "user_id INT, event_type STRING, ts TIMESTAMP")
    loose = {r["step"]: r["n_users"] for r in
             event_funnel(df, ["view", "click", "purchase"]).collect()}
    tight = {r["step"]: r["n_users"] for r in
             event_funnel(df, ["view", "click", "purchase"], within="1 day").collect()}
    assert loose == {"view": 2, "click": 2, "purchase": 2}
    assert tight == {"view": 2, "click": 2, "purchase": 1}


def test_cooccurrence_pairs_lift_arithmetic(spark):
    from pd_explain_spark.functions.events import cooccurrence_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "a"),          # duplicate item dedupes
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "basket INT, item STRING")
    out = {(r["item_a"], r["item_b"]): r for r in
           cooccurrence_pairs(df, "basket", "item", min_pairs=1).collect()}
    ab = out[("a", "b")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"], ab["n_baskets"]) == (2, 3, 2, 4)
    # lift = 2*4/(3*2) = 1.333...
    assert ab["lift_micro"] == 1_333_333
    ac = out[("a", "c")]
    assert (ac["n_ab"], ac["n_a"], ac["n_b"]) == (1, 3, 2)
    assert ac["lift_micro"] == 666_667
    # min_pairs prunes singletons
    pruned = cooccurrence_pairs(df, "basket", "item", min_pairs=2).collect()
    assert [(r["item_a"], r["item_b"]) for r in pruned] == [("a", "b")]
    import pytest as _p
    with _p.raises(ValueError):
        cooccurrence_pairs(df, "basket", "item", min_pairs=0)


def test_funnel_latency_exact_quantiles(spark):
    from pd_explain_spark.functions.events import funnel_latency, funnel_user_times

    rows = []
    # users 1..4 convert with latencies 10, 20, 30, 40 minutes;
    # user 5 never purchases
    for u, mins in [(1, 10), (2, 20), (3, 30), (4, 40)]:
        rows += [(u, "view", _ts(1, 0)),
                 (u, "click", dt.datetime(2024, 3, 1, 0, mins // 2)),
                 (u, "purchase", dt.datetime(2024, 3, 1, 0, mins))]
    rows += [(5, "view", _ts(1, 0)), (5, "click", _ts(1, 1))]
    df = spark.createDataFrame(rows, "user_id INT, event_type STRING, ts TIMESTAMP")
    t = {r["user_id"]: r for r in
         funnel_user_times(df, ["view", "click", "purchase"]).collect()}
    assert t[5]["t_purchase"] is None and t[1]["t_purchase"] is not None
    got = {r["q"]: r["latency_us"] for r in
           funnel_latency(df, ["view", "click", "purchase"], qs=[0.5, 0.9]).collect()}
    # rank-ceil over [10, 20, 30, 40] min: p50 -> rank 2 (20 min),
    # p90 -> rank 4 (40 min)
    assert got == {0.5: 20 * 60 * 1_000_000, 0.9: 40 * 60 * 1_000_000}


def test_ab_test_report_arithmetic_and_guards(spark):
    import math

    from pd_explain_spark.functions.events import ab_test_report

    # A: 60/100 convert, B: 50/100
    rows = [("A", 1)] * 60 + [("A", 0)] * 40 + [("B", 1)] * 50 + [("B", 0)] * 50
    df = spark.createDataFrame(rows, "variant STRING, converted INT")
    r = ab_test_report(df, "variant", "converted").collect()[0]
    assert (r["n_a"], r["successes_a"], r["n_b"], r["successes_b"]) == (100, 60, 100, 50)
    assert (r["rate_a_micro"], r["rate_b_micro"]) == (600_000, 500_000)
    pp = 110 / 200
    z = (0.6 - 0.5) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert r["z_micro"] == math.floor(z * 1e6 + 0.5)
    assert not r["significant"]          # |z| ~ 1.42 < 1.96
    # degenerate: both arms 100% -> se = 0 -> z 0, not NaN
    const = spark.createDataFrame([("A", 1)] * 3 + [("B", 1)] * 3,
                                  "variant STRING, converted INT")
    r0 = ab_test_report(const, "variant", "converted").collect()[0]
    assert r0["z_micro"] == 0 and r0["significant"] is False
    with pytest.raises(ValueError):
        ab_test_report(df.filter("variant = 'A'"), "variant", "converted")
    three = df.union(spark.createDataFrame([("C", 1)], "variant STRING, converted INT"))
    with pytest.raises(ValueError):
        ab_test_report(three, "variant", "converted")


def test_cohort_retention_week_granularity(spark):
    from pd_explain_spark.functions.events import cohort_retention

    # 2024-03-01 is a Friday (week of Mon 2024-02-26); 2024-03-12 falls
    # in the week of Mon 2024-03-11 = offset 2 weeks
    rows = [(1, _ts(1)), (1, _ts(12)), (2, _ts(1))]
    got = {
        (r["cohort_day"], r["day_offset"]): (r["n_users"], r["retention_micro"])
        for r in cohort_retention(
            spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP"),
            granularity="week",
        ).collect()
    }
    assert got == {
        ("2024-02-26", 0): (2, 1_000_000),
        ("2024-02-26", 2): (1, 500_000),
    }
    import pytest as _p
    with _p.raises(ValueError):
        cohort_retention(
            spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP"),
            granularity="month",
        )


def test_kaplan_meier_textbook_example(spark):
    """Classic worked KM example: durations 1,2+,3,4+,5 (+'s censored).
    S(1) = 4/5, S(3) = 4/5 * 2/3, S(5) = 0 (last at-risk subject
    churns). Censored-only durations emit no row; at-risk counts
    respect censoring."""
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "dur INT, event INT")
    from pd_explain_spark.functions.events import kaplan_meier

    out = {r["duration"]: r for r in kaplan_meier(df, "dur", "event").collect()}
    assert sorted(out) == [1, 3, 5]
    assert (out[1]["n_at_risk"], out[1]["n_events"]) == (5, 1)
    assert (out[3]["n_at_risk"], out[3]["n_events"]) == (3, 1)
    assert (out[5]["n_at_risk"], out[5]["n_events"]) == (1, 1)
    import math

    s1 = math.floor(math.exp(math.floor(math.log(4 / 5) * 1e9 + 0.5) / 1e9) * 1e6 + 0.5)
    assert out[1]["survival_micro"] == s1                      # ~0.8
    assert abs(out[3]["survival_micro"] - 533_333) <= 1        # 4/5 * 2/3
    assert out[5]["survival_micro"] == 0                       # d == n
    # everyone-churns-at-once edge: one duration, S drops to 0 there
    allchurn = spark.createDataFrame([(2, 1), (2, 1)], "dur INT, event INT")
    r = kaplan_meier(allchurn, "dur", "event").collect()
    assert len(r) == 1 and r[0]["survival_micro"] == 0 and r[0]["n_at_risk"] == 2
