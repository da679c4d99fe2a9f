"""Benchmark-contamination detection for training corpora.

Before training, every serious pipeline checks whether evaluation/
benchmark documents leak into the training set — not just as exact
copies (dedup catches those) but as high n-gram-overlap near-copies.
The standard measure is *containment*: for a (train doc, eval doc)
pair, the fraction of the eval doc's distinct word n-grams that also
appear in the train doc. This is asymmetric by design — a long train
document that swallows a short benchmark question whole has containment
1.0 even though its Jaccard similarity is tiny, which is exactly why
Jaccard-based dedup misses it.

No reference counterpart (the reference is a tabular explainer); part
of the training-data-pipeline extension surface.

Scale shape (the 100 TB plan):
  * both sides reuse dedup's distinct (id, shingle) inverted index —
    tokenize once behind a fan-out barrier, shingle in the scan stage;
  * the eval side is the benchmark suite — orders of magnitude smaller
    than the corpus — so its index is BROADCAST and the probe join
    never shuffles the train-side grams; the only exchange after the
    index is a partial-agg groupBy over (train_id, eval_id) pairs;
  * per-eval-doc gram totals are an O(|eval|) table, broadcast into
    the final containment projection;
  * ``decontaminate`` turns the flagged pairs into a broadcast
    anti-join on train ids — the corpus itself is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_index

__all__ = ["contamination_pairs", "decontaminate", "novelty_scores"]


def contamination_pairs(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_containment: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag (train doc, eval doc) pairs with containment >= threshold.

    Returns (train_id, eval_id, matched_ngrams, eval_ngrams,
    containment) where containment = |train grams ∩ eval grams| /
    |eval grams|, computed over distinct word ``n``-grams of the
    normalized text. Eval docs with fewer than ``n`` tokens have no
    grams and can never be flagged.

    ``broadcast_eval=False`` falls back to a shuffled join for the rare
    case of an eval suite too large for the driver (AQE still picks
    broadcast when it fits).
    """
    train_idx = _shingle_index(train_df, text_col, id_col, n).withColumnRenamed(
        "id", "train_id"
    )
    eval_idx = _shingle_index(eval_df, text_col, id_col, n).withColumnRenamed(
        "id", "eval_id"
    )
    eval_sizes = eval_idx.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("eval_ngrams")
    )
    probe = eval_idx
    if broadcast_eval:
        probe = F.broadcast(probe)
        eval_sizes = F.broadcast(eval_sizes)
    matched = (
        train_idx.join(probe, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("matched_ngrams"))
    )
    # threshold on the RAW ratio (exact IEEE division of two ints, so it
    # matches DuckDB bit-for-bit); the rounded column is display/hash
    # normalization only. Filtering on the rounded value would flag a
    # ratio within 5e-7 below the threshold that the oracle rejects.
    raw = F.col("matched_ngrams") / F.col("eval_ngrams").cast("double")
    return (
        matched.join(eval_sizes, "eval_id")
        .select(
            "train_id",
            "eval_id",
            "matched_ngrams",
            "eval_ngrams",
            raw.alias("__raw"),
            F.round(raw, 6).alias("containment"),
        )
        .filter(F.col("__raw") >= min_containment)
        .drop("__raw")
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_containment: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Remove train documents contaminated by any eval document.

    Returns ``train_df`` rows (original schema) whose id is not flagged
    by :func:`contamination_pairs`. The flagged-id set is at most
    |flagged pairs| — tiny relative to the corpus — so the removal is a
    broadcast LEFT ANTI join: one scan of the corpus, no shuffle.
    """
    flagged = contamination_pairs(
        train_df, eval_df, text_col, id_col, n, min_containment, broadcast_eval
    ).select(F.col("train_id").alias(id_col)).distinct()
    return train_df.join(F.broadcast(flagged), id_col, "left_anti")


def novelty_scores(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-NEW-doc n-gram novelty against the corpus: the fraction of
    the doc's distinct word ``n``-grams that appear NOWHERE in the
    corpus — the complement of containment, used to PREFER novel data
    when growing a training mix (a batch doc that mostly restates
    corpus content adds little signal even when no single corpus doc
    contains it, which is why pairwise dedup/contamination can't see
    it). Returns (id_col, total_ngrams, novel_ngrams, novelty[6dp]);
    docs with fewer than ``n`` tokens have no grams and carry NULL
    novelty (no evidence either way) with zero counts.

    Scale shape: the corpus collapses to a DISTINCT single-column gram
    set (text never shuffles); the probe is one keyed semi-join of the
    batch's grams against it plus a map-combining per-doc count — the
    corpus-side set is the big side of exactly one hash join, never
    replicated, never collected."""
    new_idx = _shingle_index(new_df, text_col, id_col, n)
    corp_grams = (
        _shingle_index(corpus_df, text_col, id_col, n).select("shingle").distinct()
    )
    # ONE pass over the batch's (unpersisted) shingle index: the left
    # join marks corpus-known grams, a single per-doc aggregation counts
    # total and seen together — a semi-join + separate totals branch
    # would tokenize and shingle the batch twice
    scored = (
        new_idx.join(corp_grams.withColumn("__seen", F.lit(1)), "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.count("__seen").alias("seen_ngrams"),
        )
        .select(
            "id",
            "total_ngrams",
            (F.col("total_ngrams") - F.col("seen_ngrams")).alias("novel_ngrams"),
            F.round(
                (F.col("total_ngrams") - F.col("seen_ngrams"))
                / F.col("total_ngrams"),
                6,
            ).alias("novelty"),
        )
    )
    return (
        new_df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("total_ngrams"), F.lit(0)).cast("bigint").alias("total_ngrams"),
            F.coalesce(F.col("novel_ngrams"), F.lit(0)).cast("bigint").alias("novel_ngrams"),
            F.col("novelty"),
        )
    )
