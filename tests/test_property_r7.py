"""Property-based invariants of the round-7 operators.

Hypothesis builds small corpora from a tiny alphabet (dense hash/shingle
collisions in few examples) and checks the distributed operators against
pure-Python reference math on EVERY example — the same standard the
round-6 dedup/LM operators carry (tests/test_property_dedup6.py).
"""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["aa", "ab", "ba", "bb", "cc"])
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=5)


def _md5_int(s: str, width: int = 15) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:width], 16)


def _grams(text: str) -> list:
    t = text.split()
    return t + [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]


def _py_dsir_weights(raw, target, n_buckets, smoothing=1.0):
    """Pure-Python mirror of functions/mixing.py dsir_weights."""

    def buckets(docs):
        out = []
        for _, text in docs:
            out.append([_md5_int(g) % n_buckets for g in _grams(text)])
        return out

    braw, btgt = buckets(raw), buckets(target)
    cr, ct = {}, {}
    for bs in braw:
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
    for bs in btgt:
        for b in bs:
            ct[b] = ct.get(b, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    B = n_buckets * smoothing
    lr = {
        b: math.log((ct.get(b, 0) + smoothing) / (tt + B))
        - math.log((cr.get(b, 0) + smoothing) / (tr + B))
        for b in set(cr) | set(ct)
    }
    out = {}
    for (i, _), bs in zip(raw, braw):
        # mirror the engine shape: integer count per bucket, then sum
        cnt = {}
        for b in bs:
            cnt[b] = cnt.get(b, 0) + 1
        w = sum(c * lr[b] for b, c in sorted(cnt.items()))
        out[i] = (len(bs), w)
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus, _corpus)
def test_dsir_weights_match_python_reference(spark, raw_docs, target_docs):
    """Per-doc DSIR log weights equal the closed-form hashed-ngram
    importance model for arbitrary corpora (rows conserved, zero-gram
    docs at 0.0)."""
    from pd_explain_spark.functions.mixing import dsir_weights

    raw = list(enumerate(raw_docs))
    target = [(100 + i, d) for i, d in enumerate(target_docs)]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dsir_weights(rdf, tdf, n_buckets=64).collect()}
    expect = _py_dsir_weights(raw, target, 64)
    assert set(got) == {i for i, _ in raw}
    for i, (n_grams, w) in expect.items():
        assert got[i]["n_grams"] == n_grams
        # round-tolerant compare: engine sums in a different order
        assert abs(got[i]["log_weight"] - round(w, 4)) <= 1e-4 + 1e-9


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus, _corpus)
def test_minhash_against_subset_of_exact_with_equal_values(spark, new_docs, corp_docs):
    """Cross-corpus MinHash pairs are a subset of the exact cross-corpus
    Jaccard pairs with IDENTICAL values (LSH only generates candidates;
    verification is exact), under both pruned and unpruned signatures."""
    from pd_explain_spark.functions.dedup import (
        minhash_pairs_against,
        near_dup_pairs_against,
    )

    new = [(100 + i, d) for i, d in enumerate(new_docs)]
    corp = list(enumerate(corp_docs))
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    cdf = spark.createDataFrame(corp, "doc_id long, text string")
    exact = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in near_dup_pairs_against(ndf, cdf, threshold=0.2).collect()
    }
    for max_df in (None, 0.6):
        mh = {
            (r["new_id"], r["corpus_id"]): r["jaccard"]
            for r in minhash_pairs_against(
                ndf, cdf, num_hashes=8, bands=4, threshold=0.2,
                max_df=max_df, hash_fn="md5",
            ).collect()
        }
        for pair, j in mh.items():
            assert exact.get(pair) == j, (pair, j, max_df)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_pair_budget_is_superset_safe(spark, docs):
    """max_pairs_per_doc never invents pairs: the budgeted candidate set
    is a subset of the unbudgeted one, and with a budget >= the max
    per-doc partner count it is EQUAL (the cap only sheds, never adds)."""
    from pd_explain_spark.functions.dedup import edit_distance_pairs

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r["id_a"], r["id_b"]) for r in edit_distance_pairs(df, max_dist=30).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, max_dist=30, max_pairs_per_doc=2).collect()
    }
    assert capped <= full
    wide = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, max_dist=30, max_pairs_per_doc=100).collect()
    }
    assert wide == full


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus, _corpus)
def test_novelty_scores_match_python_reference(spark, new_docs, corp_docs):
    """Per-doc n-gram novelty equals the closed-form set computation for
    arbitrary corpora (rows conserved; <n-token docs NULL)."""
    from pd_explain_spark.functions.contamination import novelty_scores

    def tri(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    new = [(100 + i, d) for i, d in enumerate(new_docs)]
    corp = list(enumerate(corp_docs))
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    cdf = spark.createDataFrame(corp, "doc_id long, text string")
    corp_grams = set().union(*(tri(d) for _, d in corp)) if corp else set()
    got = {r["doc_id"]: r for r in novelty_scores(ndf, cdf, n=3).collect()}
    assert set(got) == {i for i, _ in new}
    for i, d in new:
        g = tri(d)
        r = got[i]
        assert r["total_ngrams"] == len(g)
        if not g:
            assert r["novelty"] is None and r["novel_ngrams"] == 0
        else:
            novel = len(g - corp_grams)
            assert r["novel_ngrams"] == novel
            assert r["novelty"] == round(novel / len(g), 6)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.sampled_from(["aa", "ab"]), min_size=1, max_size=6).map(" ".join).map(lambda d: [d]),
    _corpus,
    _corpus,
)
def test_dsir_precomputed_ratios_cover_fit_unseen_buckets(
    spark, scored_extra, raw_docs, target_docs
):
    """The fit-once/score-many path is EXACT for batches whose grams hash
    to buckets the fit corpora never produced (ADVICE r7 medium: the
    scoring join used to silently drop them, undercounting n_grams and
    omitting the smoothed default ln((tr+B)/(tt+B))). The ratio table
    carries the full [0, n_buckets) spine, so scoring a wider-alphabet
    batch equals the closed-form model with Laplace defaults."""
    from pd_explain_spark.functions.mixing import dsir_log_ratios, dsir_weights

    n_buckets = 16  # small: unseen-bucket scoring hit on nearly every draw
    raw = list(enumerate(raw_docs))
    target = [(100 + i, d) for i, d in enumerate(target_docs)]
    # the scored batch mixes fit-alphabet words with words ("zz", "qq",
    # "zz qq" bigram) the fit corpora cannot produce
    batch = [(200, "zz qq " + scored_extra[0]), (201, "qq zz zz")]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")

    ratios = dsir_log_ratios(rdf, tdf, n_buckets=n_buckets)
    # spine contract: exactly n_buckets rows, every bucket present
    rrows = ratios.collect()
    assert sorted(r["bucket"] for r in rrows) == list(range(n_buckets))

    got = {
        r["doc_id"]: r
        for r in dsir_weights(bdf, None, n_buckets=n_buckets, ratios=ratios).collect()
    }

    # pure-Python closed form: defaults come from the FIT totals
    def bcounts(docs):
        c = {}
        for _, text in docs:
            for g in _grams(text):
                b = _md5_int(g) % n_buckets
                c[b] = c.get(b, 0) + 1
        return c

    cr, ct = bcounts(raw), bcounts(target)
    tr, tt = sum(cr.values()), sum(ct.values())
    B = float(n_buckets)
    for i, text in batch:
        grams = _grams(text)
        w = sum(
            math.log((ct.get(_md5_int(g) % n_buckets, 0) + 1.0) / (tt + B))
            - math.log((cr.get(_md5_int(g) % n_buckets, 0) + 1.0) / (tr + B))
            for g in grams
        )
        assert got[i]["n_grams"] == len(grams), (i, got[i])
        assert abs(got[i]["log_weight"] - round(w, 4)) <= 1e-4 + 1e-9
