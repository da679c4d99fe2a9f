"""Property-based invariants of the round-11 statistics operators.

Same standard as test_property_r7/r8: small integer domains force dense
ties, and every Hypothesis example checks the distributed operator
against pure-Python reference math or a mathematical invariant the
estimator must satisfy (rank statistics are invariant under strictly
monotone transforms; trimming is invariant under outlier growth).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_small = st.integers(min_value=-8, max_value=8)
_sample = st.lists(_small, min_size=2, max_size=20)
_pairs = st.lists(st.tuples(_small, _small), min_size=3, max_size=20)


def _avg_ranks(vals):
    out = [0.0] * len(vals)
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        for k in range(i, j + 1):
            out[order[k]] = (i + j) / 2 + 1
        i = j + 1
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=_sample, b=_sample)
def test_mann_whitney_matches_python_reference(spark, a, b):
    from pd_explain_spark.functions.drift import mann_whitney_u

    da = spark.createDataFrame([(float(v),) for v in a], "value double")
    db = spark.createDataFrame([(float(v),) for v in b], "value double")
    r = mann_whitney_u(da, db, "value").collect()[0]
    ranks = _avg_ranks(a + b)
    ra = sum(ranks[: len(a)])
    na, nb = len(a), len(b)
    ua = ra - na * (na + 1) / 2
    ub = na * nb - ua
    assert r["u_micro"] == math.floor(min(ua, ub) * 1e6 + 0.5)
    # z is NULL exactly when the tie-corrected variance vanishes
    n = na + nb
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(a + b).values())
    sigma2 = na * nb / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))
    if sigma2 > 0:
        z = (ua - na * nb / 2.0) / math.sqrt(sigma2)
        assert r["z_micro"] == math.floor(z * 1e6 + 0.5)
    else:
        assert r["z_micro"] is None


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=_pairs)
def test_spearman_invariant_under_monotone_transform(spark, pairs):
    from pd_explain_spark.functions.profiling import spearman_corr

    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pairs], "a double, b double"
    )
    base = spearman_corr(df, "a", "b").collect()[0]["rho_micro"]
    # x -> 2x^3 + 5 (strictly monotone) must not move rho at all
    warped = df.selectExpr("2 * a * a * a + 5 AS a", "b")
    assert spearman_corr(warped, "a", "b").collect()[0]["rho_micro"] == base


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(min_value=0, max_value=40), min_size=8, max_size=25))
def test_trimmed_stats_matches_sorted_slice(spark, vals):
    from pd_explain_spark.functions.sketches import trimmed_stats

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    r = trimmed_stats(df, "x", alpha=0.2).collect()[0]
    n = len(vals)
    k = int(math.floor(0.2 * n))
    kept = sorted(vals)[k:n - k]
    want = math.floor(sum(v * 1000 for v in kept) / len(kept) / 1000 * 1e6 + 0.5)
    assert r["trimmed_mean_micro"] == want
    # the trimmed mean ignores a huge injected outlier pair entirely
    df2 = spark.createDataFrame(
        [(float(v),) for v in vals] + [(1e6,), (-1e6,)], "x double"
    )
    n2 = n + 2
    k2 = int(math.floor(0.2 * n2))
    if k2 >= 1:
        kept2 = sorted(vals + [10**6, -(10**6)])[k2:n2 - k2]
        want2 = math.floor(
            sum(v * 1000 for v in kept2) / len(kept2) / 1000 * 1e6 + 0.5
        )
        assert trimmed_stats(df2, "x", alpha=0.2).collect()[0][
            "trimmed_mean_micro"
        ] == want2


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 12), st.booleans(), st.booleans()),
        min_size=4,
        max_size=24,
    )
)
def test_log_rank_symmetric_under_group_swap(spark, rows):
    from pd_explain_spark.functions.events import log_rank_test

    data = [(t, int(e), "a" if g else "b") for t, e, g in rows]
    if len({g for *_, g in data}) < 2:
        data.append((1, 1, "a"))
        data.append((1, 1, "b"))
    df = spark.createDataFrame(data, "t bigint, e int, g string")
    r1 = log_rank_test(df, "t", "e", "g").collect()[0]
    swapped = [(t, e, "b" if g == "a" else "a") for t, e, g in data]
    r2 = log_rank_test(
        spark.createDataFrame(swapped, "t bigint, e int, g string"), "t", "e", "g"
    ).collect()[0]
    # swapping group labels mirrors O-E: chi2 identical, z negated
    assert r1["chi2_micro"] == r2["chi2_micro"]
    if r1["z_micro"] is not None:
        assert abs(r1["z_micro"] + r2["z_micro"]) <= 1  # rounding half-ulp
    # observed/expected bookkeeping: o totals conserve
    assert r1["o_a"] + r2["o_a"] == sum(e for _, e, _ in data)
