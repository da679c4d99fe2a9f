"""Property-based invariants of the round-8 third-session operators.

Same standard as test_property_r7: tiny alphabets force dense collisions,
and every Hypothesis example checks the distributed operator against
pure-Python reference math.
"""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["aa", "ab", "ba", "bb", "cc"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)

_vals = st.lists(
    st.one_of(st.integers(min_value=-50, max_value=50), st.none()),
    min_size=0,
    max_size=30,
)
_qs = st.lists(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals, _qs)
def test_exact_quantiles_matches_sorted_rank(spark, vals, qs):
    """exact_quantiles == the value at rank ceil(q*N) of the sorted
    non-null values, for arbitrary duplicates/negatives/NULLs and
    arbitrary q, across forced-refinement settings."""
    from pd_explain_spark.functions.sketches import exact_quantiles

    df = spark.createDataFrame([(v,) for v in vals], "v int")
    out = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "v", qs, n_bins=4, max_collect=3).collect()
    }
    clean = sorted(v for v in vals if v is not None)
    if not clean:
        assert out == {}
        return
    for q in qs:
        want = clean[max(1, math.ceil(q * len(clean))) - 1]
        assert out[q] == want, (q, vals)


def _py_winnow(text: str, k: int, w: int) -> set:
    toks = text.split()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_winnow_fingerprints_match_reference(spark, corpus):
    """The distributed winnowed-fingerprint index equals the pure-Python
    winnowing of every document (min per sliding window, whole-doc min
    when fewer than `window` grams)."""
    from pd_explain_spark.functions.dedup import winnow_fingerprint_index

    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id bigint, text string"
    )
    got: dict = {}
    for r in winnow_fingerprint_index(docs, k=2, window=3).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    want = {
        i: _py_winnow(t, 2, 3) for i, t in enumerate(corpus) if _py_winnow(t, 2, 3)
    }
    assert got == want, corpus


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus, st.integers(min_value=4, max_value=6))
def test_hll_registers_match_reference(spark, corpus, p):
    """The distributed HLL register table equals pure-Python register
    math (bucket = low p bits of the 60-bit md5 int, rho = leading-zero
    rank of the high bits) on every example."""
    from pd_explain_spark.functions.sketches import hll_sketch

    df = spark.createDataFrame([(t,) for t in corpus], "v string")
    got = {r["bucket"]: r["rho"] for r in hll_sketch(df, "v", p=p).collect()}
    m, w_bits = 1 << p, 60 - p
    want: dict = {}
    for t in corpus:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        b, v = h % m, h >> p
        rho = (w_bits + 1) if v == 0 else w_bits - v.bit_length() + 1
        want[b] = max(want.get(b, 0), rho)
    assert got == want, corpus
