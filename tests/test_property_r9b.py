"""Property-based invariants of the round-9 third-wave operators.

Same standard as test_property_r7/r8: tiny domains force dense
collisions/ties, and every Hypothesis example checks the distributed
operator against pure-Python reference math.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_basket = st.integers(min_value=0, max_value=4)
_item = st.sampled_from(["a", "b", "c"])
_bi_rows = st.lists(st.tuples(_basket, _item), min_size=0, max_size=25)

_group = st.sampled_from(["g", "h"])
_vals = st.lists(
    st.tuples(_group, st.integers(min_value=-20, max_value=20)),
    min_size=0,
    max_size=25,
)

_quasi = st.lists(
    st.tuples(st.sampled_from(["x", "y", "z"]), st.sampled_from(["p", "q"])),
    min_size=0,
    max_size=20,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_bi_rows)
def test_cooccurrence_matches_bruteforce(spark, rows):
    """cooccurrence_pairs == brute-force per-basket set intersection:
    support counts, marginals, and the exact lift rounding, for
    arbitrary duplicate (basket, item) rows."""
    from pd_explain_spark.functions.events import cooccurrence_pairs

    df = spark.createDataFrame(rows or [(None, None)], "basket INT, item STRING")
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["n_a"], r["n_b"],
                                     r["n_baskets"], r["lift_micro"])
        for r in cooccurrence_pairs(df, "basket", "item", min_pairs=1).collect()
    }
    baskets: dict = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    nb = len(baskets)
    items: dict = {}
    pairs: dict = {}
    for b, s in baskets.items():
        for i in s:
            items[i] = items.get(i, 0) + 1
        ss = sorted(s)
        for x in range(len(ss)):
            for y in range(x + 1, len(ss)):
                k = (ss[x], ss[y])
                pairs[k] = pairs.get(k, 0) + 1
    want = {}
    for (ia, ib), nab in pairs.items():
        lift = math.floor(nab * nb / (items[ia] * items[ib]) * 1e6 + 0.5)
        want[(ia, ib)] = (nab, items[ia], items[ib], nb, lift)
    assert got == want, rows


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_robust_anomalies_matches_reference_math(spark, rows):
    """robust_anomalies == pure-Python median/MAD/modified-z over each
    group, including rank-ceil medians on even counts, MAD=0 skips, and
    the exact micro rounding."""
    from pd_explain_spark.functions.drift import robust_anomalies

    df = spark.createDataFrame(
        [(i, g, float(v)) for i, (g, v) in enumerate(rows)] or [(0, None, None)],
        "id INT, g STRING, value DOUBLE",
    )
    got = {r["id"]: r["z_micro"] for r in
           robust_anomalies(df, "value", by=["g"], z_thresh=3.5).collect()}

    def med(xs):
        xs = sorted(xs)
        return xs[max(1, math.ceil(0.5 * len(xs))) - 1]

    groups: dict = {}
    for i, (g, v) in enumerate(rows):
        groups.setdefault(g, []).append((i, float(v)))
    want = {}
    for g, members in groups.items():
        vals = [v for _, v in members]
        m = med(vals)
        mad = med([abs(v - m) for v in vals])
        if mad <= 0:
            continue
        for i, v in members:
            z = 0.6745 * (v - m) / mad
            if abs(z) > 3.5:
                want[i] = math.floor(z * 1e6 + 0.5)
    assert got == want, rows


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_quasi, st.integers(min_value=1, max_value=4))
def test_k_anonymize_is_exactly_the_large_classes(spark, rows, k):
    """k_anonymize keeps precisely the rows whose quasi tuple occurs
    >= k times — no more, no less — for arbitrary class shapes."""
    from pd_explain_spark.functions.profiling import k_anonymize

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id INT, a STRING, b STRING",
    )
    kept = sorted(r["id"] for r in k_anonymize(df, ["a", "b"], k=k).collect())
    from collections import Counter

    sizes = Counter(rows)
    want = sorted(i for i, t in enumerate(rows) if sizes[t] >= k)
    assert kept == want, (rows, k)
