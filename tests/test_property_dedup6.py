"""Property-based invariants of the round-6 dedup/LM operators.

Hypothesis builds small corpora from a tiny alphabet (forcing heavy
shingle/span/pair collisions) and checks the distributed operators
against pure-Python reference implementations on EVERY example —
coverage of adjacency/boundary interactions far beyond the planted
hand cases.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny alphabet -> dense collisions in few examples
_word = st.sampled_from(["aa", "ab", "ba", "bb", "cc"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=5)


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def _shingles(text: str, n: int = 3) -> set:
    t = text.split()
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_edit_distance_pairs_matches_python_reference(spark, docs):
    """Every emitted pair carries the TRUE Levenshtein distance, and
    every shingle-sharing pair within the cap is emitted — differential
    soundness + completeness on arbitrary colliding corpora."""
    from pd_explain_spark.functions.dedup import edit_distance_pairs

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    max_dist = 6
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in edit_distance_pairs(df, max_dist=max_dist).collect()
    }
    expect = {}
    for i, a in rows:
        for j, b in rows:
            if i < j and (_shingles(a) & _shingles(b)):
                d = _py_levenshtein(a, b)
                if d <= max_dist:
                    expect[(i, j)] = d
    assert got == expect


def _py_span_dedup(docs, n, min_count=2):
    """Pure-Python ExactSubstr: per doc -> (kept tokens, n_tokens, n_removed)."""
    toks = {i: d.split() for i, d in docs}
    occ = {}
    for i, t in toks.items():
        for s in range(len(t) - n + 1):
            g = " ".join(t[s : s + n])
            occ.setdefault(g, []).append((i, s))
    dup = {g for g, o in occ.items() if len(o) >= min_count}
    out = {}
    for i, t in toks.items():
        covered = set()
        for s in range(len(t) - n + 1):
            if " ".join(t[s : s + n]) in dup:
                covered.update(range(s, s + n))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        out[i] = (" ".join(kept), len(t), len(covered))
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus, st.integers(min_value=2, max_value=4))
def test_span_dedup_matches_python_reference(spark, docs, n):
    """Distributed span removal equals the paper algorithm on every
    corpus: rebuilt text, token counts, and removal counts all match;
    rows are conserved."""
    from pd_explain_spark.functions.segments import span_dedup

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in span_dedup(df, n=n).collect()
    }
    assert set(got) == {i for i, _ in rows}  # row conservation
    assert got == _py_span_dedup(rows, n)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_unigram_lm_scores_match_python_reference(spark, docs):
    """Mean token surprisal equals the closed-form computation for any
    corpus (self-referenced, min_count=1: no OOV, all rows conserved)."""
    from pd_explain_spark.functions.text import unigram_lm_scores

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}
    counts = {}
    for _, d in rows:
        for t in d.split():
            counts[t] = counts.get(t, 0) + 1
    N = sum(counts.values())
    for i, d in rows:
        t = d.split()
        assert got[i]["n_tokens"] == len(t) and got[i]["n_oov"] == 0
        if not t:
            assert got[i]["lm_score"] is None
            continue
        expect = math.log(N) - sum(math.log(counts[x]) for x in t) / len(t)
        # Spark sums the logs in a different order and rounds HALF_UP vs
        # Python's HALF_EVEN — bitwise equality on the rounded values can
        # flake on a Hypothesis-found near-tie at the 4th decimal, so
        # compare with a one-ulp-of-the-rounding tolerance instead
        assert abs(got[i]["lm_score"] - expect) <= 1e-4 + 1e-9


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.sampled_from(["ab", "abc", "ba", "cab"]), min_size=1, max_size=6))
def test_train_bpe_property_matches_reference(spark, words):
    """BPE merge sequence + segmentations match the paper algorithm on
    arbitrary small corpora (exercises ties, self-overlaps, early stop)."""
    from pd_explain_spark.functions.bpe import train_bpe
    from tests.test_pipeline_ops import _reference_bpe

    wc = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    text = " ".join(w for w, c in wc.items() for _ in range(c))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges, wt = train_bpe(df, num_merges=5)
    got = [(r["left"], r["right"], r["merged"], r["pair_count"]) for r in merges.collect()]
    exp_merges, exp_segs = _reference_bpe(wc, 5)
    assert got == exp_merges
    assert {r["w"]: list(r["syms"]) for r in wt.collect()} == exp_segs
