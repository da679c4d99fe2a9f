"""TF-IDF / BM25 / vocabulary: hand-computed values + plan shape."""

import math

import pytest

from pd_explain_spark import load_table
from pd_explain_spark.functions.relevance import (
    bm25_scores,
    build_vocabulary,
    term_frequencies,
    tf_idf,
)


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").df


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )


def test_term_frequencies_counts_occurrences(tiny):
    tf = {(r["id"], r["term"]): r["tf"] for r in term_frequencies(tiny).collect()}
    assert tf == {(1, "a"): 2, (1, "b"): 1, (2, "a"): 1, (2, "c"): 1}


def test_tf_idf_hand_computed(tiny):
    out = {(r["id"], r["term"]): r for r in tf_idf(tiny, round_to=6).collect()}
    # 'a' appears in both docs: idf = ln(2/2) = 0
    assert out[(1, "a")]["tfidf"] == 0.0
    # 'b' only in doc 1: tfidf = 1 * ln(2/1)
    assert out[(1, "b")]["tfidf"] == pytest.approx(math.log(2), abs=1e-6)
    assert out[(1, "b")]["df"] == 1


def test_bm25_hand_computed(tiny):
    # query = ['b']: only doc 1 matches. N=2, df=1, tf=1, dl=3, avgdl=2.5
    out = bm25_scores(tiny, ["b"], k1=1.2, b=0.75, round_to=6).collect()
    assert len(out) == 1 and out[0]["id"] == 1
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    norm = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2.5))
    assert out[0]["score"] == pytest.approx(round(idf * norm, 6), abs=1e-6)


def test_bm25_rewards_rarer_terms(spark):
    df = spark.createDataFrame(
        [(1, "rare common"), (2, "common x"), (3, "common y"), (4, "common z")],
        "doc_id long, text string",
    )
    scores = {r["id"]: r["score"] for r in bm25_scores(df, ["rare", "common"]).collect()}
    # doc 1 matches both terms and 'rare' has higher idf
    assert scores[1] > scores[2]


def test_vocabulary_rank_and_coverage(tiny):
    vocab = build_vocabulary(tiny, max_size=10).orderBy("rank").collect()
    assert [r["term"] for r in vocab] == ["a", "b", "c"]  # 3,1,1; tie by term
    assert [r["count"] for r in vocab] == [3, 1, 1]
    assert vocab[0]["doc_freq"] == 2
    assert vocab[-1]["cum_coverage"] == pytest.approx(1.0)
    # coverage is monotone
    covs = [r["cum_coverage"] for r in vocab]
    assert covs == sorted(covs)


def test_vocabulary_max_size_truncates(documents):
    vocab = build_vocabulary(documents, max_size=5).collect()
    assert len(vocab) == 5
    assert {r["rank"] for r in vocab} == {1, 2, 3, 4, 5}


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_tf_idf_broadcasts_term_stats(documents):
    plan = _final_plan(tf_idf(documents))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_vocabulary_topk_never_global_sorts_vocab(documents):
    plan = _final_plan(build_vocabulary(documents, max_size=100))
    assert "TakeOrderedAndProject" in plan, plan


def test_top_terms_per_doc_ranks_distinctive_terms(spark):
    from pd_explain_spark.functions.relevance import top_terms_per_doc

    df = spark.createDataFrame(
        [(1, "shared shared rare"), (2, "shared common"), (3, "shared common")],
        "doc_id long, text string",
    )
    out = top_terms_per_doc(df, k=2).collect()
    doc1 = sorted((r["rank"], r["term"]) for r in out if r["id"] == 1)
    # 'rare' (df=1) must outrank 'shared' (df=3, idf=0) for doc 1
    assert doc1[0][1] == "rare"
    assert all(r["rank"] <= 2 for r in out)


def test_top_terms_per_doc_plan_is_partitioned_window(documents):
    from pd_explain_spark.functions.relevance import top_terms_per_doc

    out = top_terms_per_doc(documents, k=5)
    plan = _final_plan(out)
    # the rank window must be keyed by id (hashpartitioning); the only
    # SinglePartition allowed is the N-docs scalar reduction, which the
    # scale auditor classifies as the benign idiom
    assert "hashpartitioning(id" in plan, plan
    from pd_explain_spark.plans.audit import assert_scalable

    assert_scalable(out)


def test_hybrid_search_fuses_both_systems(spark):
    from pd_explain_spark.functions.relevance import hybrid_search

    docs = spark.createDataFrame(
        [
            (1, "spark join"),  # weaker lexical hit, weak dense
            (2, "nothing relevant textually here at all"),  # dense hit only
            (3, "spark join spark join spark join dense match"),  # top lexical + strong dense
            (4, "unrelated filler content entirely"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0]),
            (2, [1.0, 0.05]),
            (3, [1.0, 0.1]),
            (4, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_search(docs, emb, ["spark", "join"], [1.0, 0.0], k=4).collect()
    by_id = {r["id"]: r for r in out}
    # doc 3 appears in both rank lists -> highest fused score
    assert out[0]["id"] == 3
    assert by_id[3]["bm25_rank"] is not None and by_id[3]["cos_rank"] is not None
    # doc 2 has no lexical match -> bm25_rank NULL, still present via cosine
    assert by_id[2]["bm25_rank"] is None and by_id[2]["cos_rank"] is not None
    # doc 4 points away from the query -> worst cosine rank of the four
    assert by_id[4]["cos_rank"] == max(
        r["cos_rank"] for r in out if r["cos_rank"] is not None
    )


def test_hybrid_search_depth_bounds_ranks(documents, spark):
    from pd_explain_spark import load_table
    from pd_explain_spark.functions.relevance import hybrid_search

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").df.filter(
        "vec_id < 500"
    )
    qv = emb.filter("vec_id = 0").select("embedding").first()[0]
    out = hybrid_search(documents, emb, ["spark"], qv, k=10, depth=20).collect()
    assert len(out) == 10
    for r in out:
        for rank in (r["bm25_rank"], r["cos_rank"]):
            assert rank is None or rank <= 20


def test_bm25_matches_terms_with_nonword_edges(spark):
    # \b never matches at the edges of 'c++' / '.net'; the fallback
    # array_contains path must still find the exact whitespace token
    # (ADVICE r5)
    df = spark.createDataFrame(
        [(1, "we love c++ here"), (2, "python shop"), (3, "the .net stack")],
        "doc_id long, text string",
    )
    got = {r["id"] for r in bm25_scores(df, ["c++", ".net"]).collect()}
    assert got == {1, 3}
    # mixed word + non-word query still unions both candidate paths
    got2 = {r["id"] for r in bm25_scores(df, ["python", "c++"]).collect()}
    assert got2 == {1, 2}


def test_hybrid_search_rejects_zero_query_vector(spark):
    from pd_explain_spark.functions.relevance import hybrid_search

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="all zeros"):
        hybrid_search(docs, emb, ["a"], [0.0, 0.0])
