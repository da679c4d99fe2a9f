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

    from ..functions.events import _validate_within

    w = W.partitionBy(user_col).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {_validate_within(gap, required=True)}")
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

    hashed = (
        _with_event_time(stream_df, ts_col)
        .withWatermark(ts_col, watermark)
        .withColumn("__text_hash", F.md5(normalized_text(F.col(text_col))))
    )
    # NULL-text rows carry no content: they must never dedup against
    # each other (dropDuplicates treats NULL keys as equal), so they
    # bypass the stateful operator entirely
    deduped = hashed.filter(F.col("__text_hash").isNotNull()).dropDuplicatesWithinWatermark(
        ["__text_hash"]
    )
    return deduped.unionByName(
        hashed.filter(F.col("__text_hash").isNull())
    ).drop("__text_hash")


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
    from ..functions.events import _validate_within

    if how not in ("inner", "left"):
        raise ValueError(f"interval_join how must be inner/left, got {how!r}")
    within = _validate_within(within, required=True)
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
    from ..functions.events import _validate_within

    within = _validate_within(within, required=True)
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


# ---------------------------------------------------------------- near-dup flags
def _duration_ms(s: str) -> int:
    """Spark CalendarInterval-style duration string -> milliseconds.
    Handles every unit withWatermark accepts down to milliseconds and
    multi-part strings like '1 hour 30 minutes'."""
    mult = {
        "microsecond": 0.001, "millisecond": 1,
        "second": 1_000, "minute": 60_000, "hour": 3_600_000,
        "day": 86_400_000, "week": 7 * 86_400_000,
    }
    parts = s.strip().split()
    if len(parts) % 2 != 0 or not parts:
        raise ValueError(f"unparseable duration: {s!r}")
    total = 0.0
    for num, unit in zip(parts[::2], parts[1::2]):
        key = unit.lower().rstrip("s")
        if key not in mult:
            raise ValueError(f"unsupported duration unit {unit!r} in {s!r}")
        total += float(num) * mult[key]
    return int(total)


def minhash_band_keys(
    text_col, n: int = 3, num_hashes: int = 16, bands: int = 4
):
    """Expression-only MinHash+LSH band keys:
    ``array<struct<band int, bucket bigint>>`` per document.

    Bit-identical to the batch pipeline (``dedup.minhash_signatures`` →
    ``minhash_lsh_candidates``): slot i = min over distinct shingles of
    ``xxhash64(shingle, i)``; bucket = ``xxhash64`` over the band's
    slots. The batch flavor computes slots with a groupBy over the
    exploded shingle index (map-side-combining aggregate — the 100 TB
    batch path); that aggregation would become a second STATEFUL
    operator inside a streaming query, so here the min folds over the
    per-row shingle array instead (interpreted higher-order function —
    acceptable at micro-batch volume, wrong for a 100 TB backfill: use
    the batch path for backfills). Returns an empty array for documents
    with fewer than ``n`` tokens (no shingles → no buckets), matching
    the batch pipeline which drops them from the index."""
    from ..functions.dedup import shingles

    sh = shingles(text_col, n)
    rows_per_band = num_hashes // bands
    slots = [
        F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ]
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*slots[b * rows_per_band : (b + 1) * rows_per_band]).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    return F.when(F.size(sh) > 0, F.array(*band_structs)).otherwise(
        F.array().cast("array<struct<band:int,bucket:bigint>>")
    )


def stream_near_dup_flags(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming NEAR-dup detection for a document ingest pipeline — the
    LSH complement of :func:`stream_dedup_exact` (which only catches
    byte-identical normalized text).

    Emits one row per (document, LSH band): ``(band, bucket, doc_id, ts,
    is_collision, first_id)`` where ``is_collision`` marks that an
    earlier document already occupied this band bucket and ``first_id``
    is that document. A document is a near-duplicate iff ANY of its
    bands collides (the standard streaming-LSH drop rule — collapse with
    :func:`near_dup_flag_summary`, e.g. inside ``foreachBatch``). This
    matches the batch candidate rule exactly: the flagged set equals the
    ``id_b`` side of ``dedup.minhash_lsh_candidates`` under
    arrival-order ids (parity pinned by test_streaming).

    State: ONE (first_id, first_ts) pair per occupied band bucket —
    O(distinct buckets), not O(documents × signature); buckets idle
    longer than ``watermark`` are evicted via event-time timeout, which
    is what keeps continuous ingest feasible (the same bounded-state
    property as ``dropDuplicatesWithinWatermark``). Within a micro-batch
    arrivals are ordered by (ts, doc_id), so replays are deterministic.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_ms = _duration_ms(watermark)
    out_schema = T.StructType(
        [
            T.StructField("band", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("is_collision", T.BooleanType()),
            T.StructField("first_id", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("first_id", T.LongType()), T.StructField("first_ts", T.LongType())]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        first = state.get if state.exists else None
        chunks = list(pdfs)
        if not chunks:  # pd.concat raises on an empty list
            return
        batch = pd.concat(chunks, ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "doc_id"], kind="mergesort")
        out = []
        max_ts_ms = 0
        for row in batch.itertuples(index=False):
            ts_ms = int(pd.Timestamp(row.ts).value // 1_000_000)
            max_ts_ms = max(max_ts_ms, ts_ms)
            if first is None:
                first = (int(row.doc_id), ts_ms)
                out.append((key[0], key[1], int(row.doc_id), row.ts, False, int(row.doc_id)))
            else:
                out.append((key[0], key[1], int(row.doc_id), row.ts, True, first[0]))
        state.update(first)
        # evict when the watermark passes last-activity + ttl (must be
        # strictly ahead of the current watermark to be accepted)
        state.setTimeoutTimestamp(
            max(max_ts_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            out,
            columns=["band", "bucket", "doc_id", "ts", "is_collision", "first_id"],
        )

    src = _with_event_time(stream_df, ts_col).withWatermark(ts_col, watermark)
    banded = src.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col).alias("ts"),
        F.explode(minhash_band_keys(F.col(text_col), n, num_hashes, bands)).alias("bb"),
    ).select("doc_id", "ts", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def near_dup_flag_summary(flags_df: DataFrame) -> DataFrame:
    """Collapse :func:`stream_near_dup_flags` band rows to one row per
    document: ``(doc_id, is_near_dup, matched_id)`` with ``matched_id``
    the smallest colliding first-document id. Batch aggregation — run it
    on a materialized flags table or inside ``foreachBatch`` (chaining a
    second stateful aggregate behind applyInPandasWithState inside one
    streaming query is exactly the multi-stateful-operator shape Spark
    restricts)."""
    return flags_df.groupBy("doc_id").agg(
        F.max("is_collision").alias("is_near_dup"),
        F.min(F.when(F.col("is_collision"), F.col("first_id"))).alias("matched_id"),
    )


def stream_ingest_dedup(
    stream_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Continuous ingest dedup: the streaming flavor of
    ``functions.text.ingest_pipeline``'s exact-dedup stages — keep each
    arriving doc only if (1) it is the FIRST arrival of its normalized
    fingerprint within the watermark (within-stream dedup, state
    evicted by ``dropDuplicatesWithinWatermark``) and (2) its
    fingerprint does not already exist in the historical corpus
    (stream-static LEFT ANTI join against the corpus's DISTINCT
    fingerprint set — the static side is re-read per micro-batch, so a
    periodically refreshed corpus table is picked up without restarting
    the query).

    State/scale: within-stream state is bounded by the watermark; the
    anti-join's static side is one distinct fingerprint column (the
    corpus TEXT never enters the stream), exactly the reduction
    ``dedup_against`` uses in batch — a backfill job and this stream
    agree on what counts as a duplicate because both sides share the
    same md5(normalized_text) identity."""
    from ..functions.text import fingerprint

    corpus_fp = corpus_df.select(
        fingerprint(F.col(text_col)).alias("__fp")
    ).distinct()
    hashed = (
        _with_event_time(stream_df, ts_col)
        .withWatermark(ts_col, watermark)
        .withColumn("__fp", fingerprint(F.col(text_col)))
    )
    # NULL-fingerprint rows bypass the stateful dedup (no content, no
    # duplicate evidence — dropDuplicates would collapse them) and the
    # anti-join passes them anyway (NULL never equals a corpus key)
    deduped = hashed.filter(F.col("__fp").isNotNull()).dropDuplicatesWithinWatermark(
        ["__fp"]
    ).unionByName(hashed.filter(F.col("__fp").isNull()))
    return deduped.join(corpus_fp, "__fp", "left_anti").drop("__fp")


def stream_url_dedup(
    stream_df: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    corpus_df: DataFrame | None = None,
) -> DataFrame:
    """Streaming URL-level dedup — the cheapest gate on a crawl
    firehose, run BEFORE any text hashing: keep each arriving row only
    if (1) its :func:`~pd_explain_spark.functions.text.canonical_url`
    key has not been seen within the watermark
    (``dropDuplicatesWithinWatermark`` — state bounded, evicted by
    event time) and (2, optional) the key is absent from the historical
    ``corpus_df`` (stream-static LEFT ANTI join against the corpus's
    DISTINCT canonical keys — one tiny column, text never enters the
    stream, re-read per micro-batch so a refreshed corpus is picked up
    live). The canonical key itself is a scan-stage regexp/list
    expression — zero extra state. NULL-url rows have no key and bypass
    the stateful operator (NULL keys must never dedup each other)."""
    from ..functions.text import canonical_url

    keyed = (
        _with_event_time(stream_df, ts_col)
        .withWatermark(ts_col, watermark)
        .withColumn("__curl", canonical_url(F.col(url_col)))
    )
    deduped = keyed.filter(F.col("__curl").isNotNull()).dropDuplicatesWithinWatermark(
        ["__curl"]
    ).unionByName(keyed.filter(F.col("__curl").isNull()))
    if corpus_df is not None:
        corpus_keys = corpus_df.select(
            canonical_url(F.col(url_col)).alias("__curl")
        ).distinct()
        deduped = deduped.join(corpus_keys, "__curl", "left_anti")
    return deduped.drop("__curl")


def stream_kmeans_assign(
    stream_df: DataFrame,
    centroids: dict[int, list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Stateless cluster assignment of a vector stream against a FITTED
    k-means model (functions/clustering.py ``kmeans_fit`` — fit once in
    batch, score the stream forever): each row evaluates the exact
    integer squared distance to every centroid as pure expressions (the
    micro-unit centroid components inline as literals) and picks the
    (dist2, cid) argmin via ``array_min`` over structs — bit-identical
    to the batch ``kmeans_assign`` on the same model (parity pytest).

    Streaming/scale shape: zero state, zero shuffle — a narrow map over
    each micro-batch, so any watermark/output mode composes downstream;
    expression size grows O(k*dim), the same bound as the batch
    broadcast table (for k*dim beyond literal comfort, re-fit buckets
    coarser or assign in batch). NULL vectors pass through with NULL
    cluster/dist2 rather than being dropped: a streaming sink must
    account for every input row."""
    from ..functions.clustering import argmin_struct

    # quantize ONCE into a projected column — HOFs are not subject to
    # subexpression elimination, so building the transform inside each
    # centroid's distance expression would quantize every row k times
    m = argmin_struct(centroids, qcol="__q")
    return (
        stream_df.withColumn(
            "__q",
            F.transform(F.col(vec_col), lambda x: F.round(x * scale).cast("bigint")),
        )
        .select(
            "*",
            F.when(F.col(vec_col).isNotNull(), m["cid"]).alias("cluster"),
            F.when(F.col(vec_col).isNotNull(), m["d2"]).alias("dist2"),
        )
        .drop("__q")
    )
