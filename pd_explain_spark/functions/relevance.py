"""Corpus term statistics: TF-IDF, BM25, vocabulary building.

Training-data pipelines need corpus-level term weighting for boilerplate
scoring, keyword extraction, topic balancing, and retrieval-style
filtering ("keep documents relevant to these seed terms"). These are
the classic IR statistics expressed as Spark plans.

No reference counterpart (the reference is a tabular explainer); part
of the training-data-pipeline extension surface.

Scale shape (the 100 TB plan):
  * one explode of the token stream feeds everything; per-(doc, term)
    counts are a single map-side-combining shuffle keyed by (doc, term);
  * document frequencies reduce the SAME table again keyed by term —
    no second pass over the raw text;
  * the term-statistics table is vocabulary-sized (millions, not
    billions), so joins back to per-doc rows broadcast;
  * corpus scalars (N docs, average doc length) are one-row aggregates
    cross-joined as literals — no driver round trip in the plan;
  * vocabulary top-k goes through TakeOrderedAndProject (never a global
    sort of the vocab); the rank/coverage window then runs over only
    the k survivors.

Float determinism: scores are rounded ONCE from the raw double to 4
decimals — ln() differs by <= 1 ulp between JVM and C runtimes, and the
4-decimal single round gives the same boundary margin the cosine
entries use (see similarity.brute_force_topk).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import normalized_text

__all__ = ["term_frequencies", "tf_idf", "bm25_scores", "build_vocabulary", "top_terms_per_doc", "hybrid_search"]


def _bounded_window(*order_cols) -> Window:
    """Rank window over an input already cut to <= depth rows by limit():
    single-partition BY DESIGN over O(k) rows. (A literal partition key
    would be constant-folded back to SinglePartition by Catalyst, so
    there is no plan-level way to mark this; get_spark quiets the
    WindowExec warning logger instead, and plans/audit.py classifies
    limit()-bounded single-partition exchanges as info, not fatal.)"""
    return Window.orderBy(*order_cols)


def _token_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) — one row per token OCCURRENCE (counting semantics,
    unlike dedup's distinct shingle index)."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    return df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("term")
    ).filter(F.col("term") != "")


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf) — raw term counts per document."""
    return (
        _token_table(df, text_col, id_col)
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
    broadcast_terms: bool = True,
) -> DataFrame:
    """(id, term, tf, df, tfidf) with tfidf = tf * ln(N / df).

    N is the document count; df the number of distinct documents
    containing the term (so 0 < df <= N and the log is always
    defined and non-negative).
    """
    tf = term_frequencies(df, text_col, id_col)
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_terms:
        doc_freq = F.broadcast(doc_freq)
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    return (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df").cast("double")),
                round_to,
            ).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """(id, score) — Okapi BM25 of each document against a term list.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5));
    score  = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    The query-term filter lands in the scan stage (rows for other terms
    never reach a shuffle); doc lengths ride along as a per-doc max —
    no second text pass. Documents matching no query term are absent
    (score would be 0).
    """
    import re as _re

    terms = [t.lower() for t in query_terms]
    # per-doc length is a SCAN-STAGE expression (array size), not an
    # explode — the full corpus is never fanned out to token rows
    toks_expr = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    doc_len = df.select(
        F.col(id_col).alias("id"), F.size(toks_expr).alias("dl")
    )
    # only documents containing at least one query term reach the
    # explode: a word-boundary rlike in the scan stage — at corpus
    # scale the explode fan-out drops from every token to matching
    # docs' tokens only. \b only works when the term starts AND ends
    # with a word character ("c++" or ".net" would never match
    # \b...\b); terms outside that shape fall back to an
    # array_contains over the normalized token split, which is still a
    # scan-stage expression.
    # re.ASCII: Java regex \b is ASCII-word-boundary, but Python \w is
    # unicode-aware by default — "café" fullmatches Python \w+ yet can
    # never match Spark's \b...\b (é is not a Java word char). Routing
    # must agree with the ENGINE that evaluates the boundary.
    word_terms = [t for t in terms if _re.fullmatch(r"\w+", t, _re.ASCII)]
    odd_terms = [t for t in terms if t not in word_terms]
    conds = []
    if word_terms:
        pattern = r"\b(" + "|".join(_re.escape(t) for t in word_terms) + r")\b"
        conds.append(F.lower(F.col(text_col)).rlike(pattern))
    for t in odd_terms:
        conds.append(F.array_contains(toks_expr, t))
    if not conds:  # empty query: empty result, not IndexError
        cand = df.filter(F.lit(False))
    else:
        cand_filter = conds[0]
        for c in conds[1:]:
            cand_filter = cand_filter | c
        cand = df.filter(cand_filter)
    tf = (
        _token_table(cand, text_col, id_col)
        .filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = F.broadcast(tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    scalars = F.broadcast(
        df.select(F.count(F.lit(1)).alias("__n")).crossJoin(
            doc_len.select(F.avg("dl").alias("__avgdl"))
        )
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm_tf = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    return (
        tf.join(doc_freq, "term")
        .join(doc_len, "id")
        .crossJoin(scalars)
        .groupBy("id")
        .agg(F.round(F.sum(idf * norm_tf), round_to).alias("score"))
    )


def build_vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_size: int = 50_000,
    round_to: int = 6,
) -> DataFrame:
    """Top-``max_size`` terms with counts, document frequency, rank and
    cumulative token coverage.

    (term, count, doc_freq, rank, cum_coverage) where cum_coverage is
    the fraction of ALL token occurrences covered by ranks 1..rank —
    the curve used to pick tokenizer vocab sizes.

    The corpus-wide reduction is one shuffle keyed by term; the top-k
    is TakeOrderedAndProject (O(k) per partition, no global sort); the
    rank window then runs over only the k survivors. Ties broken by
    term for determinism.
    """
    toks = _token_table(df, text_col, id_col)
    per_term = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("count"),
        F.count_distinct("id").alias("doc_freq"),
    )
    total = toks.select(F.count(F.lit(1)).alias("__total"))
    top = per_term.orderBy(F.desc("count"), F.asc("term")).limit(max_size)
    w = _bounded_window(F.desc("count"), F.asc("term"))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "term",
            "count",
            "doc_freq",
            F.row_number().over(w).alias("rank"),
            F.round(
                F.sum("count").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                / F.col("__total").cast("double"),
                round_to,
            ).alias("cum_coverage"),
        )
    )


def top_terms_per_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Keyword extraction: the ``k`` highest-TF-IDF terms per document
    (id, term, tfidf, rank), ties broken by term for determinism.

    The ranking is a window PARTITIONED by document — one shuffle keyed
    by id with a bounded per-key state of k rows, never a global sort;
    per-doc term counts are vocabulary-bounded, so no key is hot.
    """
    scored = tf_idf(df, text_col, id_col, round_to=round_to)
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tfidf", "rank")
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: Sequence[str],
    query_vec,
    k: int = 10,
    rrf_k: int = 60,
    depth: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical + dense retrieval with reciprocal-rank fusion —
    the standard recipe for corpus search over training data (BM25
    catches exact terms, the embedding side catches paraphrases):

      score(d) = sum over systems of 1 / (rrf_k + rank_sys(d)),

    ranks from :func:`bm25_scores` (desc, ties by id) and from cosine
    similarity of ``query_vec`` against ``embeddings`` — a document
    absent from one system simply contributes nothing for it. As in
    every production RRF, ranks are taken WITHIN each system's
    top-``depth`` list (that is the operator's contract, not an
    approximation of some deeper list). RRF works on RANKS, so the two
    systems' incomparable score scales never need calibration, and the
    fusion arithmetic is exact in IEEE doubles (integer ranks), which
    keeps the operation oracle-checkable.

    Scale shape: each branch keeps its own scale-correct plan (BM25's
    scan-stage term filter; one corpus pass for the dot products with
    the query vector as a literal); each branch is then cut to
    top-``depth`` through TakeOrderedAndProject BEFORE its rank window,
    so the only unpartitioned window runs over <= depth rows (same
    bounded pattern as build_vocabulary) and the full-outer fusion join
    is depth-bounded too. Returns (id, fused_score, bm25_rank,
    cos_rank) top-``k``.
    """
    bm = bm25_scores(docs, query_terms, text_col=text_col, id_col=id_col)
    bm_top = bm.orderBy(F.desc("score"), F.asc("id")).limit(depth)
    w_bm = _bounded_window(F.desc("score"), F.asc("id"))
    bm_r = bm_top.select("id", F.row_number().over(w_bm).alias("bm25_rank"))

    qv = [float(x) for x in query_vec]
    dim = len(qv)
    qnorm = sum(x * x for x in qv) ** 0.5
    if qnorm == 0.0:
        # an all-zero query vector makes sim = x/0 = NaN for every
        # non-zero corpus vector, and Spark orders NaN above any double,
        # so the desc ranking would promote arbitrary rows — fail loudly
        # instead (mirrors the vnorm>0 guard on degenerate corpus rows)
        raise ValueError("hybrid_search: query_vec must not be all zeros")
    emb = embeddings.select(
        F.col(vec_id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.array(*[F.lit(x) for x in qv]),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(F.col("__v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sim = F.when(vnorm > 0, dot / (vnorm * F.lit(qnorm))).otherwise(F.lit(-1.0))
    cos = emb.filter(F.size("__v") == dim).select(
        "id", F.round(sim, 4).alias("__sim")
    )
    cos_top = cos.orderBy(F.desc("__sim"), F.asc("id")).limit(depth)
    w_cos = _bounded_window(F.desc("__sim"), F.asc("id"))
    cos_r = cos_top.select("id", F.row_number().over(w_cos).alias("cos_rank"))

    fused = bm_r.join(cos_r, "id", "full").select(
        "id",
        F.round(
            F.when(F.col("bm25_rank").isNotNull(), 1.0 / (rrf_k + F.col("bm25_rank"))).otherwise(0.0)
            + F.when(F.col("cos_rank").isNotNull(), 1.0 / (rrf_k + F.col("cos_rank"))).otherwise(0.0),
            6,
        ).alias("fused_score"),
        "bm25_rank",
        "cos_rank",
    )
    return fused.orderBy(F.desc("fused_score"), F.asc("id")).limit(k)
