"""Range-bucket assignment and per-bucket literal lookups.

Shared substrate for every "global order without a global sort
partition" operator (rolling / shift / cumsum / rank in
``operators/rolling.py``, the keyless as-of join in ``operators/asof.py``):
the order domain is split into range buckets from approxQuantile
boundaries, each bucket is processed independently in parallel, and the
O(num_buckets) cross-bucket repair state (carries, ghost targets) is
attached back as plan literals.

Scale rationale — why these are not when-chains: the original
implementation nested ``F.when(onum > b_i, i+1).otherwise(...)`` per
boundary, which is O(num_buckets) Catalyst tree DEPTH and O(num_buckets)
branch evaluations per row. Fine at 64 buckets; at the thousands of
buckets a 1000-executor cluster wants, both the analysis time and the
per-row cost grow linearly (and codegen falls back to interpreted mode
past the JVM's 64 KB method limit). Here instead:

 * bucket assignment goes through ``pyspark.ml.feature.Bucketizer`` — a
   JVM-side binary search over the sorted boundary array: O(log B) per
   row, constant plan depth;
 * per-bucket lookups (prefix carries, ghost-target lists) are
   ``F.get(<array literal>, bucket)`` — O(1) per row, flat plan. ``F.get``
   (not ``element_at``) so an out-of-range bucket yields NULL instead of
   an ANSI-mode error.

Null / NaN contract (kept identical to the when-chain it replaces,
which Spark comparison semantics dictated): NULL order keys land in
bucket 0, NaN keys in the last bucket (Spark sorts NaN above every
double).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resolve_num_buckets(df: DataFrame, num_buckets: int | None) -> int:
    """Default bucket count for the global-order operators: explicit
    wins; otherwise max(64, 2x cluster parallelism), so the same code
    that runs 64-way on local[32] runs (say) 8000-way on a 4000-core
    cluster without the caller changing anything. The flat lookups in
    this module keep per-row cost O(1) at any count; the driver carry
    scans stay O(num_buckets) rows."""
    if num_buckets is not None:
        return num_buckets
    return max(64, 2 * df.sparkSession.sparkContext.defaultParallelism)


def assign_buckets(df: DataFrame, onum: Column, bounds: list[float], out_col: str) -> DataFrame:
    """Attach ``out_col`` = range-bucket id of ``onum`` over the sorted,
    strictly-increasing ``bounds`` (len(bounds)+1 buckets). Rows exactly
    on a boundary land in the upper bucket; tied order values always
    share a bucket (the id is a pure function of the value — the property
    the rank/cumsum carry algebra relies on)."""
    if not bounds:
        return df.withColumn(out_col, F.lit(0))
    from pyspark.ml.feature import Bucketizer

    raw = f"{out_col}_in"
    # NULL -> -inf (bucket 0), NaN -> +inf (last bucket): matches Spark's
    # comparison/sort semantics so the bucketed plans order exactly like
    # a single-partition window would.
    clean = F.nanvl(
        F.coalesce(onum.cast("double"), F.lit(float("-inf"))), F.lit(float("inf"))
    )
    splits = [float("-inf"), *[float(b) for b in bounds], float("inf")]
    out = (
        Bucketizer(splits=splits, inputCol=raw, outputCol=f"{out_col}_d")
        .transform(df.withColumn(raw, clean))
        .withColumn(out_col, F.col(f"{out_col}_d").cast("int"))
        .drop(raw, f"{out_col}_d")
    )
    return out


def bucket_lookup(values: list, bucket: Column) -> Column:
    """O(1) per-row lookup of a per-bucket literal: values[bucket].

    ``values`` is indexed by bucket id (position i = bucket i); entries
    may be None (NULL). The array is a single flat plan literal, so plan
    size is O(num_buckets) but tree depth and per-row cost are O(1) —
    the replacement for the per-bucket when-chain."""
    return F.get(F.array(*[F.lit(v) for v in values]), bucket)
