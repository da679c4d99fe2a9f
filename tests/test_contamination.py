"""Benchmark-contamination detection: containment semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

from pd_explain_spark import load_table
from pd_explain_spark.functions.contamination import contamination_pairs, decontaminate


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").df


def test_planted_verbatim_leak_has_full_containment(spark):
    bench_q = "what is the capital of france paris is the capital"
    train = spark.createDataFrame(
        [
            (1, f"intro text here {bench_q} and much more trailing content"),
            (2, "completely unrelated document about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, bench_q)], "doc_id long, text string")
    out = contamination_pairs(train, ev, n=3, min_containment=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["train_id"], r["eval_id"]) == (1, 100)
    # every eval 3-gram appears verbatim in train doc 1
    assert r["containment"] == 1.0
    assert r["matched_ngrams"] == r["eval_ngrams"]


def test_containment_is_asymmetric_unlike_jaccard(spark):
    # eval doc fully inside a much longer train doc: containment 1.0
    # even though the Jaccard similarity of the pair is far below 0.5.
    ev_text = "alpha beta gamma delta"
    filler = " ".join(f"tok{i}" for i in range(200))
    train = spark.createDataFrame(
        [(1, f"{filler} {ev_text}")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, ev_text)], "doc_id long, text string")
    out = contamination_pairs(train, ev, n=2, min_containment=0.99).collect()
    assert len(out) == 1 and out[0]["containment"] == 1.0


def test_short_eval_docs_never_flag(spark):
    train = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    ev = spark.createDataFrame([(2, "a b")], "doc_id long, text string")  # < n tokens
    assert contamination_pairs(train, ev, n=3, min_containment=0.0).count() == 0


def test_decontaminate_removes_flagged_keeps_rest(spark):
    bench_q = "one two three four five six"
    train = spark.createDataFrame(
        [(1, f"pad {bench_q} pad"), (2, "clean doc nothing shared here at all")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(7, bench_q)], "doc_id long, text string")
    out = decontaminate(train, ev, n=3, min_containment=0.5)
    assert [r["doc_id"] for r in out.collect()] == [2]
    assert out.columns == train.columns


def test_contamination_matches_oracle(documents, duck):
    out = (
        contamination_pairs(
            documents.filter("doc_id >= 20"),
            documents.filter("doc_id < 20"),
            n=3,
            min_containment=0.1,
        )
        .orderBy("train_id", "eval_id")
        .toPandas()
    )
    ora = duck.execute(
        """
        WITH base AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
          FROM documents
        ), grams AS (
          SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS g
          FROM base, unnest(range(0, greatest(len(toks)-2, 0))) t(i)
        ), ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE doc_id < 20),
        tr AS (SELECT doc_id AS train_id, g FROM grams WHERE doc_id >= 20),
        es AS (SELECT eval_id, count(*) AS eval_ngrams FROM ev GROUP BY 1),
        mt AS (SELECT train_id, eval_id, count(*) AS matched FROM tr JOIN ev USING (g) GROUP BY 1,2)
        SELECT train_id, eval_id, matched AS matched_ngrams, eval_ngrams,
               round(matched * 1.0 / eval_ngrams, 6) AS containment
        FROM mt JOIN es USING (eval_id)
        WHERE matched * 1.0 / eval_ngrams >= 0.1
        ORDER BY train_id, eval_id
        """
    ).df()
    assert list(out["train_id"]) == list(ora["train_id"])
    assert list(out["matched_ngrams"]) == list(ora["matched_ngrams"])
    assert list(out["containment"]) == pytest.approx(list(ora["containment"]))


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_contamination_broadcasts_eval_side(documents):
    plan = _final_plan(
        contamination_pairs(
            documents.filter("doc_id >= 20"),
            documents.filter("doc_id < 20"),
            n=3,
            min_containment=0.1,
        )
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_decontaminate_is_broadcast_anti_join(documents):
    plan = _final_plan(
        decontaminate(
            documents.filter("doc_id >= 20"),
            documents.filter("doc_id < 20"),
            n=3,
            min_containment=0.1,
        )
    )
    assert "LeftAnti, BuildRight" in plan.replace("build_right", "BuildRight"), plan


def test_contamination_threshold_uses_raw_ratio(spark):
    # ADVICE r5: the flag filter must use the raw matched/eval ratio, not
    # the 6-decimal rounded value. Here raw = 2/3 = 0.66666...; rounded
    # containment = 0.666667 >= 0.666667, but the raw ratio is BELOW the
    # threshold — filtering on the rounded column would flag a pair the
    # DuckDB oracle (raw-ratio filter) rejects.
    train = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e f g h i XX")], "doc_id long, text string"
    )
    # eval has 3 8-gram shingles, 2 shared -> raw containment 2/3
    pairs = contamination_pairs(train, ev, n=8, min_containment=0.6).collect()
    assert len(pairs) == 1 and pairs[0]["containment"] == 0.666667
    none = contamination_pairs(
        train, ev, n=8, min_containment=0.666667
    ).collect()
    assert none == []


def test_novelty_scores_planted(spark):
    """novelty_scores (r7): a doc restating corpus vocabulary scores ~0,
    a fresh doc scores 1.0, a half-and-half doc lands in between; short
    docs carry NULL novelty with zero counts; rows conserved."""
    from pd_explain_spark.functions.contamination import novelty_scores

    corpus = [(i, "spark shuffles data across executor partitions efficiently always") for i in range(5)]
    new = [
        (100, "spark shuffles data across executor partitions efficiently always"),  # all seen
        (101, "quantum chemistry simulations need basis sets and functionals"),      # all novel
        (102, "spark shuffles data across quantum chemistry simulations need"),      # mixed
        (103, "too short"),                                                          # < n tokens
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    got = {r["doc_id"]: r for r in novelty_scores(ndf, cdf, n=3).collect()}
    assert set(got) == {100, 101, 102, 103}
    assert got[100]["novelty"] == 0.0
    assert got[101]["novelty"] == 1.0
    assert 0.0 < got[102]["novelty"] < 1.0
    assert got[103]["novelty"] is None
    assert got[103]["total_ngrams"] == 0 and got[103]["novel_ngrams"] == 0
    # counts are consistent
    for d in (100, 101, 102):
        r = got[d]
        assert 0 <= r["novel_ngrams"] <= r["total_ngrams"]
