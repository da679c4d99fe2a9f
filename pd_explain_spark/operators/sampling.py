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


def weighted_sample(df: DataFrame, n: int, weight_col: str, seed: int = 42) -> DataFrame:
    """Exact-n weighted sample WITHOUT replacement — distributed
    Efraimidis–Spirakis (A-ES): each row draws a seeded uniform u from a
    row-content hash and is ranked by ln(u)/w (equivalent to the classic
    u^(1/w) key); the top n ranks are the sample. orderBy+limit executes
    as TakeOrdered (per-partition top-n + driver merge), so there is no
    full sort or shuffle at any scale — same plan family as
    ``deterministic_sample``.

    pandas-compatible edge semantics (reference passthrough,
    core/explainable_data_frame.py:636-669): rows with NULL, zero, or
    negative weight are never sampled. Infinite weights are not validated
    (pandas raises; validating here would cost an extra pass)."""
    big = float(2**61)
    u = (
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed)), F.lit(2**61))
        + F.lit(0.5)
    ) / F.lit(big)
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w  # in (-inf, 0]; closer to 0 = higher effective draw
    return df.filter(w > 0).orderBy(F.desc(key)).limit(n)


def replacement_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """~Exact-n uniform sample WITH replacement: Spark's Poisson row
    replication at a 2x-overshot fraction, trimmed to n. Needs one count()
    action to size the fraction. May return fewer than n rows with
    vanishing probability (Poisson undershoot); exact with-replacement
    draws would need a global cumulative-weight index, which is not worth
    a shuffle for this pandas-parity path."""
    cnt = df.count()
    if cnt == 0 or n <= 0:
        return df.limit(0)
    fraction = min(2.0 * n / cnt + 10.0 / cnt, 100.0)
    return df.sample(withReplacement=True, fraction=fraction, seed=seed).limit(n)
