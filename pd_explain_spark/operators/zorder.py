"""Z-order (Morton) clustering expression for multi-column file skipping.

Linear range clustering (``to_parquet(cluster_by=[a, b])``) sorts
lexicographically: files are tight on ``a`` but each file spans nearly
the full range of ``b``, so predicates on ``b`` alone skip nothing.
Z-ordering interleaves the bits of the columns' rank positions, so every
file covers a small HYPER-RECTANGLE of the key space and min/max
row-group stats prune on ANY of the clustered columns (the layout behind
Delta's OPTIMIZE ZORDER; public Morton-code construction).

Construction, all codegen-friendly expressions:
 1. each column is rank-normalized into 2^bits buckets via its
    approxQuantile boundaries (operators/bucketing.py — value function,
    JVM binary search). Quantile buckets, not min/max scaling, so skewed
    distributions still spread across the grid;
 2. the z-value interleaves the bucket bits: bit i of column j lands at
    position i * ncols + j — a flat sum of shift/mask terms;
 3. callers range-partition + sort by the z-value
    (``to_parquet(..., layout='zorder')``).

NULL ranks as bucket 0 (sorts first, like Spark's NULLS FIRST).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> tuple[DataFrame, Column]:
    """Attach per-column rank buckets and return (df_with_buckets,
    z-value column). ``bits`` buckets-per-column (2^bits); 8 bits x up
    to 3 columns keeps the z-value in a plain int range. The bucket
    columns are temporary (named ``__z_<col>``) — callers drop them
    after partitioning."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder supports 1-4 columns")
    from .bucketing import assign_buckets

    n_buckets = 1 << bits
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    out = df
    for c in cols:
        val = F.col(c).cast("double")
        bounds = sorted(set(df.select(val.alias("v")).approxQuantile("v", fracs, 0.001)))
        out = assign_buckets(out, val, bounds, f"__z_{c}")
    z = F.lit(0).cast("long")
    ncols = len(cols)
    for j, c in enumerate(cols):
        b = F.col(f"__z_{c}").cast("long")
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return out, z
