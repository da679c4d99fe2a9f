"""Deterministic sampling shared by all explainers.

The reference takes an exact 5,000-row uniform sample with a fixed seed
(many_to_one_explainer.py:311-333, global toggle utils/global_values.py).
Spark's ``df.sample(fraction, seed)`` is seeded **per partition**: the
rows it picks change whenever the scan's partition layout changes (file
splits, AQE coalescing, memory pressure), which made explainer outputs
flap between runs of the same query. SURVEY.md §7's risk register calls
this out; the fix is a hash-ordered top-n:

    orderBy(xxhash64(all columns, seed)).limit(n)

* deterministic w.r.t. partition layout — the hash depends only on row
  *values*;
* exact-n, matching the reference's exact-5000 contract;
* scale-safe — Spark executes orderBy+limit as TakeOrdered (per-partition
  top-n, then a driver-side merge of n*partitions candidates), so no full
  sort and no full shuffle even on a 100 TB input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Exact-n pseudo-uniform sample, stable across partitionings.

    Rows are ranked by a seeded xxhash64 of the full row; ties (exact
    duplicate rows) are benign — any n of them are interchangeable.
    """
    key = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    return df.orderBy(key).limit(n)


def maybe_sample(df: DataFrame, use_sampling: bool, n: int, seed: int = 42) -> DataFrame:
    """Apply deterministic_sample only when enabled; callers skip the
    count() pre-check — limit(n) on fewer than n rows is a no-op."""
    if not use_sampling:
        return df
    return deterministic_sample(df, n, seed)
