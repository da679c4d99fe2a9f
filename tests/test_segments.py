"""Segment-level operators: boilerplate removal and training chunking."""

import pytest
from pyspark.sql import functions as F

from pd_explain_spark import load_table
from pd_explain_spark.functions.segments import (
    chunk_documents,
    line_segments,
    segment_dedup,
    segment_frequencies,
    token_chunk_segments,
)


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").df


# ---------------------------------------------------------------- segment_dedup
def test_segment_dedup_removes_planted_boilerplate(spark):
    boiler = "all rights reserved"
    rows = [(i, f"unique line {i}\n{boiler}\nclosing {i}") for i in range(6)]
    rows.append((99, boiler))  # document that is ONLY boilerplate
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = segment_dedup(df, min_docs=5).orderBy("doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 7  # every input doc survives as a row
    for i in range(6):
        assert by_id[i]["text"] == f"unique line {i}\nclosing {i}"
        assert by_id[i]["n_segments"] == 3
        assert by_id[i]["n_removed"] == 1
    # the all-boilerplate doc keeps its row with empty text
    assert by_id[99]["text"] == ""
    assert by_id[99]["n_removed"] == 1


def test_segment_dedup_below_threshold_is_identity(spark):
    rows = [(i, f"alpha {i}\nbeta {i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = segment_dedup(df, min_docs=5).collect()
    assert all(r["n_removed"] == 0 for r in out)
    assert {r["text"] for r in out} == {f"alpha {i}\nbeta {i}" for i in range(4)}


def test_segment_frequencies_exact_vs_approx(documents):
    seg = lambda c: token_chunk_segments(c, 3)
    exact = {
        r["segment"]: r["doc_freq"]
        for r in segment_frequencies(documents, segmenter=seg).collect()
    }
    approx = {
        r["segment"]: r["doc_freq"]
        for r in segment_frequencies(documents, segmenter=seg, exact=False).collect()
    }
    assert set(exact) == set(approx)
    # HLL++ at rsd=0.02 on counts this small should be within 5%
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(1, 0.05 * v)


def test_segment_dedup_chunks_match_oracle(documents, duck):
    out = (
        segment_dedup(
            documents,
            segmenter=lambda c: token_chunk_segments(c, 3),
            min_docs=5,
            sep=" ",
        )
        .orderBy("doc_id")
        .toPandas()
    )
    ora = duck.execute(
        """
        WITH base AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
          FROM documents
        ), segs AS (
          SELECT doc_id, i AS seg_pos, array_to_string(toks[i*3+1:i*3+3], ' ') AS segment
          FROM base, unnest(range(0, CAST(ceil(len(toks)/3.0) AS BIGINT))) AS t(i)
        ), freq AS (
          SELECT segment, count(DISTINCT doc_id) AS doc_freq FROM segs GROUP BY 1
        ), marked AS (
          SELECT s.*, f.doc_freq >= 5 AS boiler FROM segs s JOIN freq f USING (segment)
        )
        SELECT doc_id,
               coalesce(string_agg(segment, ' ' ORDER BY seg_pos)
                        FILTER (WHERE NOT boiler), '') AS text,
               count(*) AS n_segments,
               CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        FROM marked GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    assert list(out["doc_id"]) == list(ora["doc_id"])
    assert list(out["text"]) == list(ora["text"])
    assert list(out["n_removed"]) == list(ora["n_removed"])


# ---------------------------------------------------------------- chunk_documents
def test_chunk_documents_overlap_reconstructs_tokens(spark):
    text = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = (
        chunk_documents(df, chunk_tokens=16, overlap=4)
        .orderBy("chunk_id")
        .collect()
    )
    stride = 12
    for r in chunks:
        toks = r["chunk_text"].split(" ")
        start = r["chunk_id"] * stride
        assert toks == [f"w{i}" for i in range(start, min(start + 16, 40))]
        assert r["n_tokens"] == len(toks)
    # consecutive chunks share exactly `overlap` tokens
    assert chunks[0]["chunk_text"].split(" ")[-4:] == chunks[1]["chunk_text"].split(" ")[:4]


def test_chunk_documents_min_tokens_drops_fragments(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(26)))], "doc_id long, text string"
    )
    # stride 12: windows of 16, 14, 2 tokens; min_tokens=5 drops the last
    out = chunk_documents(df, chunk_tokens=16, overlap=4, min_tokens=5).collect()
    assert sorted(r["n_tokens"] for r in out) == [14, 16]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


# ---------------------------------------------------------------- plan shape
def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_chunk_documents_zero_exchange(documents):
    plan = _final_plan(chunk_documents(documents, chunk_tokens=16, overlap=4))
    assert plan.count("Exchange") == 0, plan


def test_segment_dedup_broadcasts_frequent_set(documents):
    plan = _final_plan(
        segment_dedup(
            documents,
            segmenter=lambda c: token_chunk_segments(c, 3),
            min_docs=5,
            sep=" ",
        )
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
    # doc-frequency agg + reassembly agg: hash partitioning only on those
    assert plan.count("SortMergeJoin") == 0, plan


def test_segment_dedup_conserves_zero_segment_docs(spark):
    # a whitespace-only document yields zero segments under line_segments;
    # the id-spine left join must bring it back rather than dropping it
    # (ADVICE r5: row-conservation contract)
    rows = [(1, "keep me\nand me"), (2, "   \n  \n"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in segment_dedup(df, min_docs=10).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["text"] == "" and out[2]["n_segments"] == 0 and out[2]["n_removed"] == 0
    assert out[3]["text"] == "" and out[3]["n_segments"] == 0
    assert out[1]["text"] == "keep me\nand me" and out[1]["n_segments"] == 2
