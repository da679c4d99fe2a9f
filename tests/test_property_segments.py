"""Property-based invariants of the segment operators.

Hypothesis generates random token sequences and chunking parameters;
the invariants hold for EVERY (text, chunk, overlap) combination, which
covers boundary arithmetic (final fragments, overlap windows, empty
docs) far beyond the hand-written cases.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pd_explain_spark.functions.segments import chunk_documents, segment_dedup, token_chunk_segments

_WORDS = st.integers(min_value=0, max_value=60)
_params = st.tuples(
    _WORDS,
    st.integers(min_value=2, max_value=16),  # chunk_tokens
    st.integers(min_value=0, max_value=8),   # overlap (< chunk enforced below)
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_params)
def test_chunk_documents_reconstruction_invariants(spark, params):
    n_words, chunk, overlap = params
    overlap = min(overlap, chunk - 1)
    stride = chunk - overlap
    toks = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap, min_tokens=1).collect(),
        key=lambda r: r["chunk_id"],
    )
    if n_words == 0:
        # empty text tokenizes to [''], one 1-token chunk of the empty string
        assert len(rows) == 1 and rows[0]["chunk_text"] == ""
        return
    # every chunk is the exact slice at its stride offset
    for r in rows:
        start = r["chunk_id"] * stride
        expect = toks[start : start + chunk]
        assert r["chunk_text"].split(" ") == expect
        assert r["n_tokens"] == len(expect)
    # chunks tile the document: first starts at 0, last covers the tail
    assert rows[0]["chunk_id"] == 0
    last_start = rows[-1]["chunk_id"] * stride
    assert last_start + rows[-1]["n_tokens"] == n_words
    # union of chunk tokens (dedup by position) is the whole document
    covered = set()
    for r in rows:
        start = r["chunk_id"] * stride
        covered.update(range(start, start + r["n_tokens"]))
    assert covered == set(range(n_words))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=0, max_value=5), min_size=2, max_size=8))
def test_segment_dedup_total_segments_conserved(spark, picks):
    """kept + removed == total segments, for any corpus: built from a
    small shared phrase pool so cross-document repetition actually
    occurs at random."""
    pool = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota",
            "kappa lambda mu", "nu xi omicron", "pi rho sigma"]
    rows = [(i, "\n".join(pool[p] for p in (pick, (pick + i) % 6, (pick * 2) % 6)))
            for i, pick in enumerate(picks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = segment_dedup(df, min_docs=2).collect()
    assert len(out) == len(rows)
    for r in out:
        kept = 0 if r["text"] == "" else len(r["text"].split("\n"))
        assert kept + r["n_removed"] == r["n_segments"] == 3
