"""Structured Streaming windowed aggregation over the events stream.

Green-field extension (the reference has no streaming — SURVEY.md §2.6).
The same windowed-aggregation logic is exposed twice:

 * ``windowed_agg(df, ...)`` — batch semantics over a static events table
   (this is what the correctness oracle checks: tumbling window ==
   date_trunc bucketing);
 * ``stream_windowed_agg(stream_df, ...)`` — identical plan over a
   ``readStream`` source with a watermark for late data; in production
   this writes to a sink with ``writeStream``; tests drive it with a
   file/memory source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(stream_df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; parquet micros with
    isAdjustedToUTC=false arrive as TIMESTAMP_NTZ. The wall clock is
    rebuilt AS UTC (timezone-free, operators/timeutil.py) so watermark
    and window arithmetic stays linear even in a non-UTC session with
    DST transitions."""
    from ..operators.timeutil import ntz_to_utc_timestamp

    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        return stream_df.withColumn(ts_col, ntz_to_utc_timestamp(F.col(ts_col)))
    return stream_df


def windowed_agg(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window: str = "1 hour",
    slide: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) window aggregation:
    count + sum + avg of ``value_col`` per (window, keys)."""
    keys = keys or []
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    out = (
        df.groupBy(win.alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )
    return out


def stream_windowed_agg(
    stream_df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Streaming flavor: watermarked tumbling-window aggregation.
    Late rows beyond ``watermark`` are dropped; state is bounded."""
    keys = keys or []
    return (
        _with_event_time(stream_df, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def stream_session_windows(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Streaming session windows via the native session_window operator:
    gap-based sessions per user with bounded state (rows later than the
    watermark are dropped and their sessions finalized)."""
    return (
        _with_event_time(stream_df, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            user_col,
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_running_user_stats(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user (count, sum, max) maintained across micro-batches — the
    pattern for operators that windowed aggs can't express (the state
    here is deliberately simple so the plumbing is the test subject)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("m", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf[value_col].astype("float64")
            n += len(pdf)
            s += float(vals.sum())
            if len(vals):
                m = max(m, float(vals.max()))
        state.update((n, s, m))
        import pandas as pd

        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "sum_value": s, "max_value": m}]
        )

    return (
        _with_event_time(stream_df, ts_col).withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows per user (gap-based) — batch flavor via lag/cumsum,
    the classic sessionization plan (one shuffle on user)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(ts_col).over(w)
    new_sess = (
        F.when(prev.isNull(), 1)
        .when(F.col(ts_col) > prev + gap_expr, 1)
        .otherwise(0)
    )
    with_id = df.withColumn("__new", new_sess).withColumn(
        "session_seq", F.sum("__new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(user_col, "session_seq")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def stream_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup for a document ingest pipeline: keep the
    first arrival of each normalized-text hash, with state bounded by the
    watermark (``dropDuplicatesWithinWatermark`` evicts hash keys older
    than the watermark — the property that makes continuous 100 TB-scale
    ingest dedup feasible where an unbounded ``dropDuplicates`` state
    would grow forever).

    Batch counterpart: ``functions.dedup.dedup_exact`` (same normalized
    md5 identity, so a backfill job and the streaming path agree on what
    counts as a duplicate).
    """
    from ..functions.text import normalized_text

    return (
        _with_event_time(stream_df, ts_col).withWatermark(ts_col, watermark)
        .withColumn("__text_hash", F.md5(normalized_text(F.col(text_col))))
        .dropDuplicatesWithinWatermark(["__text_hash"])
        .drop("__text_hash")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval (attribution) join: for each left row, the
    right rows with the same ``on`` keys whose timestamp falls in
    (left_ts, left_ts + within] — the "view -> click within 10 minutes"
    shape. Strictly-after lower bound, so a row never attributes to a
    simultaneous copy of itself.

    Right columns are suffix-renamed (join keys keep the left copy).
    ``how`` inner or left (left keeps unattributed rows with NULLs).

    Batch flavor of ``stream_interval_join`` — identical condition, so a
    backfill and the live stream agree row-for-row (parity-tested)."""
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join how must be inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lf = _with_event_time(left, left_ts)
    rf = _with_event_time(right, right_ts)
    rmap = {c: f"{c}{suffix}" for c in rf.columns}
    rf = rf.select(*[F.col(c).alias(rmap[c]) for c in rf.columns])
    cond = None
    for k in keys:
        c = lf[k] == rf[rmap[k]]
        cond = c if cond is None else (cond & c)
    rts = rf[rmap[right_ts]]
    cond = (
        cond
        & (rts > lf[left_ts])
        & (rts <= lf[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    out = lf.join(rf, cond, how)
    return out.drop(*[rf[rmap[k]] for k in keys])


def stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Stream-stream interval join with bounded state: both sides carry a
    watermark and the join condition carries the time bound, so Spark
    evicts buffered rows once they can no longer match (state is
    O(watermark + within) of traffic, not the whole history — the only
    formulation that survives a continuous 100 TB/day ingest).

    Same condition as ``interval_join``, so replaying the stream over a
    static snapshot reproduces the batch result exactly."""
    keys = [on] if isinstance(on, str) else list(on)
    lf = _with_event_time(left_stream, left_ts).withWatermark(left_ts, watermark)
    rf = _with_event_time(right_stream, right_ts).withWatermark(right_ts, watermark)
    rmap = {c: f"{c}{suffix}" for c in rf.columns}
    rf = rf.select(*[F.col(c).alias(rmap[c]) for c in rf.columns])
    cond = None
    for k in keys:
        c = lf[k] == rf[rmap[k]]
        cond = c if cond is None else (cond & c)
    rts = rf[rmap[right_ts]]
    cond = (
        cond
        & (rts > lf[left_ts])
        & (rts <= lf[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    out = lf.join(rf, cond, "inner")
    return out.drop(*[rf[rmap[k]] for k in keys])
