"""Fixed-width frequency sketches: count-min over word n-grams, and the
heavy-hitter detector built on it.

The 100 TB problem these solve: "which n-grams are boilerplate?" backs
several curation steps (hot-shingle pruning in dedup, stop-boilerplate
line removal, template detection), but an exact gram count is a shuffle
whose key cardinality GROWS with the corpus — ~10^11 distinct grams at
web scale, most seen once. A count-min sketch (Cormode & Muthukrishnan
2005) replaces that with a fixed ``width x depth`` counter table:

 * build      — one map-combining aggregation whose key space is the
                sketch cell, so the shuffle moves at most
                ``width*depth`` rows PER PARTITION no matter how big
                the corpus is;
 * probe      — ``depth`` broadcast hash joins of the gram stream
                against the per-depth counter tables (each ``width``
                rows), so candidate generation never shuffles the
                corpus at all;
 * re-verify  — CMS never undercounts (every estimate >= the true
                count), so grams the probe rejects are truly below the
                threshold, and one EXACT count over only the surviving
                candidates (a broadcast semi-join, then a bounded
                groupBy) returns the true heavy-hitter set — the sketch
                bounds the work, not the answer.

Hashing is md5-derived (`hashing.md5_int`) so the whole pipeline —
sketch cells, estimates, survivors — reproduces bit-for-bit in the
DuckDB oracle. No reference counterpart (the reference is a tabular
explainer; this extends the training-data family in functions/dedup.py
/ functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import md5_int
from .text import ngrams_from_tokens, normalized_text


def _gram_occurrences(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """One row per gram OCCURRENCE (duplicates kept — counting
    semantics, unlike the distinct-set ``_shingle_index`` in dedup)."""
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda x: x != ""
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(ngrams_from_tokens(toks, n)).alias("gram"),
    )


def _cms_bucket(gram, depth_idx: int, width: int):
    """Counter column for hash row ``depth_idx``: md5("<gram>-<d>")
    truncated to 60 bits, mod width. DuckDB mirror:
    ``('0x' || substr(md5(gram || '-<d>'), 1, 15))::BIGINT % width``."""
    return md5_int(F.md5(F.concat_ws("-", gram, F.lit(str(depth_idx))))) % F.lit(
        width
    )


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    width: int = 4096,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of the corpus's word ``n``-gram occurrence
    counts: (depth, bucket, count) with exactly the non-empty cells
    (absent cell = 0). The aggregation key is the CELL, so partial
    (map-side) aggregation collapses every partition to <= width*depth
    rows before the shuffle — the sketch cost is independent of corpus
    size, which is the entire point at 100 TB."""
    occ = _gram_occurrences(df, text_col, id_col, n)
    cells = occ.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cms_bucket(F.col("gram"), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.depth", "cell.bucket")
    return cells.groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("count")
    )


def cms_heavy_grams(
    df: DataFrame,
    min_count: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    width: int = 4096,
    depth: int = 4,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Exact heavy hitters with sketch-bounded work: every word
    ``n``-gram whose true occurrence count >= ``min_count``, as
    (gram, est_count, exact_count).

    Three stages, none of which shuffles the gram stream on the gram:

      1. sketch (``cms_build`` or a caller-supplied one — fit-once /
         probe-many, e.g. a sketch maintained across ingest batches);
      2. probe: ``depth`` broadcast joins attach each occurrence's
         per-depth cell counts; est = least() of them; rows below
         ``min_count`` drop in the scan stage. Because CMS only ever
         OVERcounts, nothing below threshold survives to stage 3 and no
         true heavy hitter is lost;
      3. exact re-verify: distinct surviving grams (a tiny set — true
         heavy hitters plus hash-collision inflatees) are counted
         exactly via one bounded groupBy, and collision inflatees are
         dropped. Same prune-then-verify shape as the hot-shingle path
         in dedup.py.

    ``width`` trades sketch size against collision inflation (inflation
    only costs stage-3 work, never correctness); ``depth`` drives the
    over-estimate probability down exponentially."""
    if min_count < 1:
        raise ValueError("cms_heavy_grams: min_count must be >= 1")
    sk = sketch if sketch is not None else cms_build(
        df, text_col, id_col, n, width, depth
    )
    occ = _gram_occurrences(df, text_col, id_col, n)
    probed = occ
    est_cols = []
    for d in range(depth):
        side = (
            sk.filter(F.col("depth") == d)
            .select(
                F.col("bucket").alias(f"__b{d}"),
                F.col("count").alias(f"__c{d}"),
            )
        )
        probed = probed.withColumn(
            f"__b{d}", _cms_bucket(F.col("gram"), d, width)
        ).join(F.broadcast(side), f"__b{d}", "left")
        est_cols.append(F.coalesce(F.col(f"__c{d}"), F.lit(0)))
    cand = (
        probed.withColumn("est_count", F.least(*est_cols).cast("bigint"))
        .filter(F.col("est_count") >= F.lit(min_count))
        .select("gram", "est_count")
        .distinct()
    )
    exact = (
        occ.join(F.broadcast(cand.select("gram")), "gram")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .filter(F.col("exact_count") >= F.lit(min_count))
    )
    return cand.join(exact, "gram").select("gram", "est_count", "exact_count")
