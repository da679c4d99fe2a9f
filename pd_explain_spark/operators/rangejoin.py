"""Distributed range join: left rows match right INTERVALS
(lo <= value <= hi) — the "join events to bands/windows/slabs" shape.

Open-source Spark plans an inequality-only join as BroadcastNestedLoopJoin
(every left row tested against every interval) or, worse, a cartesian
product — O(|left| * |right|) compares. The scale-correct construction
mirrors the bucketed-window design in operators/rolling.py:

 1. bucket the VALUE domain from approxQuantile boundaries on the left
    side (operators/bucketing.py — JVM binary search, value function so
    every left row lands in exactly one bucket);
 2. replicate each interval to ONLY the buckets it overlaps (one flat
    array-literal filter per interval row, one explode);
 3. hash equi-join on the bucket id, then apply the exact
    lo <= value <= hi residual.

Compares drop from |left| x |intervals| to sum over buckets of
|left_b| x |intervals overlapping b|. Replication is bounded by interval
width / bucket width; point-like intervals replicate once. The bucket
prefilter is conservative (never drops a true match — the residual
predicate is exact), so the result equals the naive inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lo: str,
    hi: str,
    how: str = "inner",
    closed: str = "both",
    num_buckets: int | None = None,
) -> DataFrame:
    """Join ``left`` rows to ``right`` interval rows with
    lo <= left[on] <= hi (``closed`` in both/left/right/neither picks the
    boundary inclusivity). ``how`` is inner or left (pandas
    IntervalIndex-lookup semantics: left rows with no covering interval
    keep NULL right columns). Right columns colliding with left names get
    a ``_right`` suffix.

    Left rows keep exactly one bucket, so a left outer join stays a plain
    per-bucket join; intervals matching many rows replicate per bucket,
    never per row."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join how must be inner/left, got {how!r}")
    lo_ok = {"both": "<=", "left": "<=", "right": "<", "neither": "<"}[closed]
    hi_ok = {"both": "<=", "left": "<", "right": "<=", "neither": "<"}[closed]

    from .bucketing import assign_buckets, resolve_num_buckets

    num_buckets = resolve_num_buckets(left, num_buckets)
    fracs = [i / num_buckets for i in range(1, num_buckets)]
    val = F.col(on).cast("double")
    bounds = sorted(set(left.select(val.alias("v")).approxQuantile("v", fracs, 0.001)))

    lb = assign_buckets(left, val, bounds, _BUCKET)

    # bucket b covers [bound[b-1], bound[b]) (bucketing.py split
    # semantics; b=0 open below, last bucket open above). An interval
    # overlaps b iff lo < bound[b] AND hi >= bound[b-1]; the test is
    # conservative on the closed-ness — extra replicas die in the
    # residual, missing ones are impossible.
    neg_inf, pos_inf = float("-inf"), float("inf")
    cells = [
        (b, bounds[b - 1] if b > 0 else neg_inf, bounds[b] if b < len(bounds) else pos_inf)
        for b in range(len(bounds) + 1)
    ]
    cell_lits = F.array(
        *[
            F.struct(F.lit(b).alias("b"), F.lit(blo).alias("blo"), F.lit(bhi).alias("bhi"))
            for b, blo, bhi in cells
        ]
    )
    rmap = {}
    for c in right.columns:
        rmap[c] = f"{c}_right" if c in left.columns else c
    lo_d, hi_d = F.col(rmap[lo]).cast("double"), F.col(rmap[hi]).cast("double")
    overlapped = F.filter(cell_lits, lambda c: (lo_d < c["bhi"]) & (hi_d >= c["blo"]))
    rb = (
        right.select(*[F.col(src).alias(dst) for src, dst in rmap.items()])
        .withColumn(_BUCKET, F.explode(overlapped.getField("b")))
    )

    lo_c, hi_c = F.col(rmap[lo]), F.col(rmap[hi])
    residual = (
        (lo_c <= F.col(on)) if lo_ok == "<=" else (lo_c < F.col(on))
    ) & ((F.col(on) <= hi_c) if hi_ok == "<=" else (F.col(on) < hi_c))
    joined = lb.join(rb, (lb[_BUCKET] == rb[_BUCKET]) & residual, how)
    return joined.drop(lb[_BUCKET]).drop(rb[_BUCKET])
