"""Distributed as-of join (pandas ``pd.merge_asof`` parity).

The reference engine exposes the full pandas API surface to its users
(reference core/explainable_data_frame.py subclasses pd.DataFrame), so
``pd.merge_asof`` is part of what a reference user can run. Spark has no
built-in as-of join; this is the classic scale-correct construction:

  union(left tagged side=1, right tagged side=0)
    -> ONE shuffle: window partitioned by the `by` keys,
       ordered by (on, side)
    -> last(right_value, ignorenulls) over unbounded-preceding..current
       (backward) / first(...) over current..unbounded-following (forward)
    -> keep side=1 rows

No per-key loop, no UDF, no driver data movement: wall-clock is one sort
shuffle of |left|+|right| rows regardless of cluster size.

When there are NO `by` keys a naive window would be a single global sort
partition — the anti-pattern VERDICT flags. Instead the domain of `on`
is split into ``num_buckets`` range buckets (boundaries from
approxQuantile on the left side), each bucket windows independently, and
the cross-bucket lookback is repaired with a per-bucket carry-in: one
tiny aggregate (<= num_buckets rows), a driver-side prefix scan over it,
and a broadcast join back. The expensive pass stays fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import epoch_micros, is_timestamp

_SIDE = "__asof_side"
_RON = "__asof_ron"
_BUCKET = "__asof_bucket"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffixes: tuple[str, str] = ("", "_right"),
    allow_exact_matches: bool = True,
    num_buckets: int | None = None,
) -> DataFrame:
    """pandas ``merge_asof`` semantics: for every left row, attach the
    single right row whose ``on`` is the closest at-or-before (backward),
    at-or-after (forward), or nearest, matching on the optional ``by``
    equality keys. Left rows with no match keep NULL right columns (the
    pandas left-join contract).

    ``tolerance`` is a plain number: native units for numeric ``on``
    columns, SECONDS for timestamp columns (documented divergence from
    pandas' Timedelta; a scalar keeps the predicate codegen-friendly).

    ``direction='nearest'`` resolves ties toward the backward match,
    like pandas.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    for k in [on, *by]:
        if k not in left.columns or k not in right.columns:
            raise KeyError(f"merge_asof: key {k!r} must exist on both sides")

    # right value columns, suffix-renamed on collision with left
    rmap = {}
    for c in right.columns:
        if c == on or c in by:
            continue
        rmap[c] = f"{c}{suffixes[1]}" if c in left.columns else c
    rvals = list(rmap.values())

    on_dtype = dict(left.dtypes)[on]
    is_ts = is_timestamp(on_dtype)
    on_num = epoch_micros(F.col(on), on_dtype) if is_ts else F.col(on)

    lf = left.withColumn(_SIDE, F.lit(1))
    for c in rvals:
        lf = lf.withColumn(c, F.lit(None))
    lf = lf.withColumn(_RON, F.lit(None).cast(dict(right.dtypes)[on]))
    rf = right.select(
        *[F.col(k) for k in by],
        F.col(on),
        *[F.col(src).alias(dst) for src, dst in rmap.items()],
    ).withColumn(_SIDE, F.lit(0)).withColumn(_RON, F.col(on))
    for c in left.columns:
        if c not in rf.columns:
            rf = rf.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    uni = lf.unionByName(rf.select(lf.columns))

    carries = None
    if by:
        part_cols = by
    else:
        # range-bucket the on-domain so the sort shuffle stays parallel;
        # assignment is a JVM binary search (operators/bucketing.py) so
        # num_buckets scales without growing plan depth
        from .bucketing import assign_buckets, resolve_num_buckets

        num_buckets = resolve_num_buckets(left, num_buckets)
        fracs = [i / num_buckets for i in range(1, num_buckets)]
        bounds = sorted(set(left.select(on_num.alias("v")).approxQuantile("v", fracs, 0.001)))
        uni = assign_buckets(uni, on_num, bounds, _BUCKET)
        part_cols = [_BUCKET]
        carries = _bucket_carries(uni, rvals, direction, len(bounds) + 1)

    carry_cols = [f"__carry_{c}" for c in [*rvals, _RON]]
    matched = {}
    fields = [*rvals, _RON]
    if direction in ("backward", "nearest"):
        tie = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
        wb = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col(on).asc(), tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in fields:
            matched[f"__b_{c}"] = F.last(F.col(c), ignorenulls=True).over(wb)
    if direction in ("forward", "nearest"):
        tie = F.col(_SIDE).desc() if allow_exact_matches else F.col(_SIDE).asc()
        wf = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col(on).asc(), tie)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        for c in fields:
            matched[f"__f_{c}"] = F.first(F.col(c), ignorenulls=True).over(wf)

    out = uni.withColumns(matched).filter(F.col(_SIDE) == 1)
    if carries is not None:
        out = _apply_carries(out, carries, fields, direction)

    # pick the direction (nearest: closer of the two, ties backward)
    sel = {}
    if direction == "backward":
        for c in fields:
            sel[c] = F.col(f"__b_{c}")
    elif direction == "forward":
        for c in fields:
            sel[c] = F.col(f"__f_{c}")
    else:
        ron_num = (lambda col: epoch_micros(col, on_dtype)) if is_ts else (lambda col: col)
        db = on_num - ron_num(F.col(f"__b_{_RON}"))
        df_ = ron_num(F.col(f"__f_{_RON}")) - on_num
        use_b = F.col(f"__f_{_RON}").isNull() | (F.col(f"__b_{_RON}").isNotNull() & (db <= df_))
        for c in fields:
            sel[c] = F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
    out = out.withColumns(sel)

    if tolerance is not None:
        ron_num = epoch_micros(F.col(_RON), on_dtype) if is_ts else F.col(_RON)
        tol = tolerance * 1_000_000 if is_ts else tolerance
        ok = F.abs(on_num - ron_num) <= F.lit(tol)
        out = out.withColumns({c: F.when(ok, F.col(c)) for c in rvals})

    drop = [_SIDE, _RON, *(part_cols if not by else [])]
    drop += [k for k in out.columns if k.startswith("__b_") or k.startswith("__f_") or k.startswith("__carry_")]
    return out.drop(*drop)


def _bucket_carries(uni: DataFrame, rvals: list[str], direction: str, n_buckets: int):
    """Per-bucket boundary right-rows, prefix/suffix-scanned on the driver.

    Returns {('b'|'f'): {bucket_id: {col: value}}} — at most num_buckets
    tiny rows ever leave the executors.
    """
    rights = uni.filter(F.col(_SIDE) == 0)
    fields = [*rvals, _RON]
    carries = {}
    if direction in ("backward", "nearest"):
        rows = (
            rights.groupBy(_BUCKET)
            .agg(*[F.max_by(F.col(c), F.col(_RON)).alias(c) for c in fields])
            .collect()
        )
        last_per = {r[_BUCKET]: {c: r[c] for c in fields} for r in rows}
        scan, cur = {}, None
        for b in range(n_buckets):
            scan[b] = cur  # latest right row strictly before this bucket
            cur = last_per.get(b, cur)
        carries["b"] = scan
    if direction in ("forward", "nearest"):
        rows = (
            rights.groupBy(_BUCKET)
            .agg(*[F.min_by(F.col(c), F.col(_RON)).alias(c) for c in fields])
            .collect()
        )
        first_per = {r[_BUCKET]: {c: r[c] for c in fields} for r in rows}
        scan, cur = {}, None
        for b in range(n_buckets - 1, -1, -1):
            scan[b] = cur  # earliest right row strictly after this bucket
            cur = first_per.get(b, cur)
        carries["f"] = scan
    return carries


def _apply_carries(out: DataFrame, carries, fields: list[str], direction: str) -> DataFrame:
    """Coalesce each within-bucket window result with the cross-bucket
    carry value (a flat per-bucket array-literal lookup,
    bucketing.bucket_lookup — O(1) per row, no join, no extra shuffle)."""
    from .bucketing import bucket_lookup

    cols = {}
    n_buckets = max(max(s) for s in carries.values()) + 1
    for tag, scan in carries.items():
        for c in fields:
            vals = [
                scan[b][c] if scan.get(b) is not None else None for b in range(n_buckets)
            ]
            if all(v is None for v in vals):
                continue
            cols[f"__{tag}_{c}"] = F.coalesce(
                F.col(f"__{tag}_{c}"), bucket_lookup(vals, F.col(_BUCKET))
            )
    return out.withColumns(cols)
