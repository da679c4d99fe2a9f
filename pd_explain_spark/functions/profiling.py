"""Data-distribution profiling: the observability twin of the plan-level
scale auditor (plans/audit.py). The auditor reads PLANS for anti-patterns;
these read the DATA for the numbers that decide whether a key is safe to
shuffle or join on — the question every 100 TB groupBy/join starts with.

No reference counterpart (the reference is a tabular explainer); this
extends the training-data pipeline's monitoring family (corpus_stats,
corpus_diff, hll_distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    key: str,
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` hottest values of ``key`` with their row shares:
    (rank, key value, cnt, share 6dp, n_rows, n_keys) — the number that
    predicts shuffle skew BEFORE the job runs. A key whose top share is
    10% puts 10% of the table in one reduce task at any cluster size;
    that is when the salting / AQE-skew guards (SCALE.md round-7 smoke)
    earn their keep, and this report is how a pipeline decides to turn
    them on.

    Cost: one map-combining groupBy on the key, one keys=[] roll-up of
    the (bounded-by-cardinality) count table for the totals, and a
    top-k heap merge (TakeOrderedAndProject) — never a global sort,
    never a second scan of the corpus. NULL keys count as a real group
    (NULL is often the hottest key in the wild). Ties rank
    deterministically by (cnt desc, key asc)."""
    from pyspark.sql import Window

    if top_k < 1:
        raise ValueError("key_skew_report: top_k must be >= 1")
    counts = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc_nulls_last("k")).limit(top_k)
    # rank window runs over the already-limited top-k rows only
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("cnt"), F.asc_nulls_last("k"))
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            F.col("k").alias(key),
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows").cast("double"), 6).alias("share"),
            "n_rows",
            "n_keys",
        )
    )
