"""Distribution-drift monitoring over time windows.

The data-quality operator a continuous training-data ingest needs: bin a
numeric column once, then score every time window against a reference
distribution with Total Variation distance

    TV(w) = 0.5 * sum_b | p_w(b) - p_ref(b) |

TV over shared bins (rather than exact KS) keeps the whole computation
inside grouped aggregations: no sort, no cumulative pass, missing bins
handled by a (windows x bins) spine join that is O(n_windows * num_bins)
— bins are fixed, so the spine grows with elapsed time, not data volume.

Batch flavor (`drift_scores`) scores windows against the frame's own
global distribution and is DuckDB-oracle-checked (driver entry
`drift_scores_events`). Streaming flavor (`stream_drift_scores`) scores
watermarked windows against a precomputed reference histogram — the
deployment shape: the reference comes from a trusted batch period, the
stream is the live feed, an alert fires when TV exceeds a threshold.

The same binned-histogram substrate drives the FEDEX explainer
(explainers/histograms.py); this module is the monitoring counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import checkpoint_df


def _binned(df: DataFrame, value_col: str, lo_hi: DataFrame, num_bins: int):
    """Attach __bin in [0, num_bins) from broadcast (lo, hi) bounds.
    NULL measurements have no bin and are excluded HERE — letting them
    through would mint a (num_bins+1)-th NULL group, and the identity
    limit(num_bins) downstream would then drop one ARBITRARY histogram
    row (nondeterministic TV scores)."""
    b = df.filter(F.col(value_col).isNotNull()).crossJoin(F.broadcast(lo_hi))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(num_bins)
    raw = F.floor((F.col(value_col) - F.col("__lo")) / width)
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(F.greatest(raw, F.lit(0)), F.lit(num_bins - 1))
    )
    return b.withColumn("__bin", bin_.cast("int")).drop("__lo", "__hi")


def reference_histogram(
    df: DataFrame, value_col: str = "value", num_bins: int = 20
) -> DataFrame:
    """(bin, frac, lo, hi): the trusted-period distribution to monitor
    against. lo/hi ride along so the stream bins identically."""
    lo_hi = df.agg(
        F.min(value_col).cast("double").alias("__lo"),
        F.max(value_col).cast("double").alias("__hi"),
    )
    counts = (
        _binned(df.select(value_col), value_col, lo_hi, num_bins)
        .groupBy("__bin")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    total = counts.agg(F.sum("__n").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(lo_hi))
        .select(
            F.col("__bin").alias("bin"),
            (F.col("__n") / F.col("__t")).alias("frac"),
            F.col("__lo").alias("lo"),
            F.col("__hi").alias("hi"),
        )
    )


def drift_scores(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    num_bins: int = 20,
) -> DataFrame:
    """Per-window TV distance of ``value_col`` against the frame's own
    global distribution: (window_start, n_events, tv). One binning pass;
    window counts and global counts come from the SAME per-(window, bin)
    aggregate (the global histogram is a re-aggregation of it, no second
    scan)."""
    lo_hi = df.agg(
        F.min(value_col).cast("double").alias("__lo"),
        F.max(value_col).cast("double").alias("__hi"),
    )
    binned = _binned(df.select(ts_col, value_col), value_col, lo_hi, num_bins)
    per = (
        binned.groupBy(
            F.date_format(
                F.window(F.col(ts_col), window)["start"], "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "__bin",
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # per is consumed three times below (wtot/gbin/wfrac). localCheckpoint
    # (not persist) materializes it eagerly AND lets the ContextCleaner free
    # the blocks once the result is garbage-collected — a plain persist has
    # no release handle here and would leak cache for the session lifetime.
    # The frame is tiny: at most (windows x bins) rows.
    per = per.transform(checkpoint_df)
    wtot = per.groupBy("window_start").agg(F.sum("__n").alias("__wt"))
    gbin = per.groupBy("__bin").agg(F.sum("__n").alias("__gn"))
    gtot = gbin.agg(F.sum("__gn").alias("__gt"))
    # identity limit: __bin lives in [0, num_bins), so gfrac holds at
    # most num_bins rows — but the checkpointed leaf hides that from the
    # plan, and the broadcast below would audit as a fatal nested-loop
    # join. The GlobalLimit states the O(bins) bound in the plan.
    gfrac = (
        gbin.crossJoin(F.broadcast(gtot))
        .select("__bin", (F.col("__gn") / F.col("__gt")).alias("__gfrac"))
        .limit(num_bins)
    )
    spine = wtot.crossJoin(F.broadcast(gfrac))
    wfrac = per.join(wtot, "window_start").select(
        "window_start", "__bin", (F.col("__n") / F.col("__wt")).alias("__wfrac")
    )
    return (
        spine.join(wfrac, ["window_start", "__bin"], "left")
        .fillna({"__wfrac": 0.0})
        .groupBy("window_start")
        .agg(
            F.max("__wt").cast("long").alias("n_events"),
            F.round(0.5 * F.sum(F.abs(F.col("__wfrac") - F.col("__gfrac"))), 6).alias("tv"),
        )
    )


def _psi_grid(reference: DataFrame) -> tuple[float, float, int]:
    """(lo, hi, n_bins) from a value_histogram reference's bin metadata
    — fail loud when absent, a PSI against an unknown grid is
    meaningless (same contract as sketches.histogram_psi)."""
    meta = reference.schema["bin"].metadata if "bin" in reference.columns else {}
    if not meta or "n_bins" not in meta:
        raise ValueError(
            "PSI reference must be a value_histogram (bin metadata "
            "carries the lo/hi/n_bins grid)"
        )
    return float(meta["lo"]), float(meta["hi"]), int(meta["n_bins"])


def windowed_psi(
    df: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-window Population Stability Index against a trusted reference
    histogram (a :func:`~pd_explain_spark.functions.sketches.value_histogram`
    — the grid rides in its bin metadata): (window_start, n_events,
    psi 6dp). The scorecard complement of :func:`drift_scores` — PSI
    weights the log-odds shift where TV weights raw mass, and the
    reference is an explicit trusted-period sketch instead of the
    frame's own distribution.

    Plan shape mirrors drift_scores: ONE binning pass over the live
    data, per-(window, bin) counts (shuffle bounded by windows x bins),
    then a windows-x-refbins spine (reference is <= n_bins rows,
    broadcast) plus the window-only bins unioned in; bins empty on BOTH
    sides fold in as the closed-form smoothed constant per window (the
    histogram_psi no-spine trick), so no (windows x n_bins) blow-up for
    sparse grids. Laplace ``smoothing`` keeps empty bins well-defined.
    The live table is scanned once; the reference is a persisted sketch
    read, never a corpus rescan."""
    from .sketches import _hist_bin

    lo, hi, n_bins = _psi_grid(reference)
    s = float(smoothing)
    if s <= 0:
        raise ValueError("windowed_psi: smoothing must be > 0")
    width = (hi - lo) / n_bins if hi > lo else 1.0
    sm = s * n_bins

    ref_c = reference.select(
        F.col("bin"), F.col("cnt").cast("bigint").alias("__cr")
    ).limit(n_bins)  # identity limit: states the O(n_bins) bound in the plan
    rtot = ref_c.agg(F.coalesce(F.sum("__cr"), F.lit(0)).cast("double").alias("__nr"))

    per = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.date_format(
                F.window(F.col(ts_col), window)["start"], "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            _hist_bin(F.col(value_col), lo, width, n_bins).alias("__bin"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cw"))
    )
    # consumed three times (wtot / spine probe / window-only anti) — same
    # eager-materialize-and-release rationale as drift_scores
    per = per.transform(checkpoint_df)
    wtot = per.groupBy("window_start").agg(
        F.sum("__cw").cast("double").alias("__wt")
    )
    spine = wtot.crossJoin(F.broadcast(ref_c.withColumnRenamed("bin", "__bin")))
    on_ref = spine.join(per, ["window_start", "__bin"], "left").select(
        "window_start", "__wt", "__cr", F.coalesce("__cw", F.lit(0)).alias("__cw")
    )
    window_only = (
        per.join(F.broadcast(ref_c.withColumnRenamed("bin", "__bin")), "__bin", "anti")
        .join(wtot, "window_start")
        .select("window_start", "__wt", F.lit(0).cast("bigint").alias("__cr"), "__cw")
    )
    allbins = on_ref.unionByName(window_only).crossJoin(F.broadcast(rtot))
    pw = (F.col("__cw") + F.lit(s)) / (F.col("__wt") + F.lit(sm))
    pr = (F.col("__cr") + F.lit(s)) / (F.col("__nr") + F.lit(sm))
    terms = allbins.groupBy("window_start").agg(
        F.max("__wt").alias("__wt"),
        F.max("__nr").alias("__nr"),
        F.count(F.lit(1)).cast("int").alias("__present"),
        F.sum((pw - pr) * F.log(pw / pr)).alias("__sp"),
    )
    zw = F.lit(s) / (F.col("__wt") + F.lit(sm))
    zr = F.lit(s) / (F.col("__nr") + F.lit(sm))
    return terms.select(
        "window_start",
        F.col("__wt").cast("long").alias("n_events"),
        F.round(
            F.col("__sp")
            + (F.lit(n_bins) - F.col("__present")) * (zw - zr) * F.log(zw / zr),
            6,
        ).alias("psi"),
    )


def stream_psi_scores(
    stream_df: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    smoothing: float = 0.5,
) -> DataFrame:
    """Streaming flavor of :func:`windowed_psi`: a continuous PSI drift
    score per watermarked window against a trusted reference histogram
    (fit once in batch via value_histogram, score the stream forever —
    the r8 VERDICT task #7 chain: stream histogram maintenance ->
    per-window PSI). Same literal-folding shape as
    :func:`stream_drift_scores`: the reference is O(n_bins) rows and is
    collected into plan literals at build time, so the stream needs
    exactly ONE stateful aggregation (n_bins conditional counters per
    open window, state bounded by the watermark) and the PSI fold is a
    stateless projection. Every grid bin is enumerated explicitly
    (values clamp into [0, n_bins)), which equals the batch
    present-terms + closed-form-zero-terms algebra exactly
    (parity-pinned in test_streaming)."""
    from ..streaming.windows import _with_event_time

    lo, hi, n_bins = _psi_grid(reference)
    s = float(smoothing)
    if s <= 0:
        raise ValueError("stream_psi_scores: smoothing must be > 0")
    sm = s * n_bins
    ref_counts = {int(r["bin"]): int(r["cnt"]) for r in reference.collect()}
    nr = float(sum(ref_counts.values()))

    src = _with_event_time(stream_df, ts_col).select(ts_col, value_col).filter(
        F.col(value_col).isNotNull()
    )
    if hi == lo:
        bin_ = F.lit(0)
    else:
        raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit((hi - lo) / n_bins))
        bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    binned = src.withColumn("__bin", bin_)
    count_cols = [
        F.sum(F.when(F.col("__bin") == b, 1).otherwise(0)).alias(f"__c{b}")
        for b in range(n_bins)
    ]
    agg = (
        binned.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*count_cols)
    )
    total = sum((F.col(f"__c{b}") for b in range(n_bins)), F.lit(0))
    wt = total.cast("double")
    psi = F.lit(0.0)
    for b in range(n_bins):
        pw = (F.col(f"__c{b}") + F.lit(s)) / (wt + F.lit(sm))
        pr = F.lit((ref_counts.get(b, 0) + s) / (nr + sm))
        psi = psi + (pw - pr) * F.log(pw / pr)
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        total.cast("long").alias("n_events"),
        F.round(psi, 6).alias("psi"),
    )


def stream_drift_scores(
    stream_df: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming flavor: score each watermarked window against a trusted
    reference histogram (from ``reference_histogram`` over a batch
    period). The reference is tiny by construction (num_bins rows), so
    it is collected into plan literals at build time — the stream then
    needs exactly ONE stateful aggregation (per-window conditional
    counts, one per bin) and the TV fold is a stateless projection over
    those columns. State = open windows x num_bins counters, bounded by
    the watermark; no chained streaming aggregations, no stream-side
    join."""
    from ..streaming.windows import _with_event_time

    ref_rows = sorted(reference.collect(), key=lambda r: r["bin"])
    if not ref_rows:
        raise ValueError("reference histogram is empty")
    lo, hi = float(ref_rows[0]["lo"]), float(ref_rows[0]["hi"])
    fracs = {int(r["bin"]): float(r["frac"]) for r in ref_rows}
    num_bins = max(fracs) + 1

    src = _with_event_time(stream_df, ts_col).select(ts_col, value_col)
    if hi == lo:
        bin_ = F.lit(0)
    else:
        raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit((hi - lo) / num_bins))
        bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(num_bins - 1)).cast("int")
    binned = src.withColumn("__bin", bin_)

    count_cols = [
        F.sum(F.when(F.col("__bin") == b, 1).otherwise(0)).alias(f"__c{b}")
        for b in range(num_bins)
    ]
    agg = (
        binned.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*count_cols)
    )
    total = sum((F.col(f"__c{b}") for b in range(num_bins)), F.lit(0))
    tv = sum(
        (
            F.abs(F.col(f"__c{b}") / total - F.lit(fracs.get(b, 0.0)))
            for b in range(num_bins)
        ),
        F.lit(0.0),
    ) * F.lit(0.5)
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        total.cast("long").alias("n_events"),
        F.round(tv, 6).alias("tv"),
    )

def _null_safe_join(left: DataFrame, right: DataFrame, by: list[str]) -> DataFrame:
    """Inner join on the group columns with NULL-SAFE equality: a NULL
    group key is a real group (an absent seasonal key still needs its
    baseline) — a plain join would silently drop those rows from
    monitoring, the k_anonymize lesson applied here."""
    r = right
    for c in by:
        r = r.withColumnRenamed(c, f"__rj_{c}")
    cond = None
    for c in by:
        piece = F.col(c).eqNullSafe(F.col(f"__rj_{c}"))
        cond = piece if cond is None else cond & piece
    return left.join(r, cond, "inner").drop(*[f"__rj_{c}" for c in by])


def _weighted_median(vc: DataFrame, by: list[str], v: str, c: str) -> DataFrame:
    """Median of a weighted (group, value, count) table: per group, the
    minimum value whose cumulative count reaches ceil(0.5 * N). The
    grouped_exact_quantiles rank convention (sketches.py) applied to an
    ALREADY-compressed table, so callers can take two medians (value,
    then |value - median|) from one corpus scan. Returns (*by, __med)."""
    from pyspark.sql import Window

    g = vc.groupBy(*by, F.col(v).alias("__v")).agg(F.sum(c).cast("bigint").alias("__c"))
    w = Window.partitionBy(*by).orderBy("__v")
    cum = g.withColumn("__cum", F.sum("__c").over(w))
    n = g.groupBy(*by).agg(F.sum("__c").cast("bigint").alias("__n"))
    return (
        _null_safe_join(cum, n, by)
        .filter(
            F.col("__cum")
            >= F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(F.lit(0.5) * F.col("__n").cast("double")).cast("bigint"),
            )
        )
        .groupBy(*by)
        .agg(F.min("__v").alias("__med"))
    )


def robust_stats(
    df: DataFrame,
    value_col: str,
    by: list[str],
) -> DataFrame:
    """The per-group (``*by``, med, mad) baseline table of
    :func:`robust_anomalies`, exposed for the fit-once / score-many
    deployment (the source_gates / quantile_trim(bounds=) pattern): fit
    on a trusted batch period, score live batches — or a STREAM, since
    scoring is a stateless stream-static join — against the frozen
    baseline. Groups with MAD = 0 are dropped here (they can never be
    scored)."""
    if not by:
        raise ValueError("robust_stats: by must be non-empty")
    vals = df.filter(F.col(value_col).isNotNull())
    vc = vals.groupBy(*by, F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    med = _weighted_median(vc, by, "__v", "__c").withColumnRenamed("__med", "med")
    dev = _null_safe_join(vc, med, by).select(
        *by, F.abs(F.col("__v") - F.col("med")).alias("__dv"), "__c"
    )
    mad = _weighted_median(dev, by, "__dv", "__c").withColumnRenamed("__med", "mad")
    return _null_safe_join(med, mad, by).filter(F.col("mad") > 0)


def robust_anomalies(
    df: DataFrame,
    value_col: str,
    by: list[str],
    z_thresh: float = 3.5,
    scale: int = 1_000_000,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Robust per-group outlier flags via the modified z-score
    (Iglewicz & Hoaglin 1993): z = 0.6745 * (x - median) / MAD, flag
    |z| > ``z_thresh`` (their recommended 3.5). Median/MAD resist the
    very outliers they hunt — a mean/std detector moves its own
    threshold when a heavy tail arrives; this one doesn't. ``by`` takes
    any grouping columns, including derived seasonal keys (hour-of-day,
    day-of-week), which makes it the seasonal-baseline anomaly monitor
    for event streams.

    Returns the flagged rows: ``df.*`` + ``med``, ``mad``, ``z_micro``
    (z in exact integer micro-units via floor(z * scale + 0.5) — the
    engine-portable rounding used by the clustering family). Groups
    whose MAD is 0 (a majority-constant value) are skipped rather than
    divided by zero; NULL values never flag.

    Scale shape: ONE corpus scan compresses to a per-(group, value)
    count table (map-combining; bounded by distinct values per group —
    quantize first for continuous high-precision doubles, the
    grouped_exact_quantiles caveat); both medians are weighted walks
    over that compressed table, never a global sort. The per-group
    (med, mad) stats table is bounded by group cardinality, so AQE
    broadcasts it into the second, flagging scan — the corpus itself
    never shuffles.

    Pass ``stats=`` (a :func:`robust_stats` table, typically fit on a
    trusted reference period) to SKIP the fit and only score: the
    scoring plan is stateless (stream-static join + scan-stage
    arithmetic), so it runs unchanged over a readStream — the
    continuous deployment shape, parity-tested in test_streaming."""
    if not by:
        raise ValueError("robust_anomalies: by must be non-empty")
    clash = [c for c in ("med", "mad") if c in df.columns]
    if clash:
        # the stats join-back and the output contract both use the
        # literal names med/mad — an input frame that already carries
        # them would make the z expression ambiguous (or silently
        # shadow the baseline); fail loud with the fix (ADVICE r9)
        raise ValueError(
            f"robust_anomalies: input already has column(s) {clash}; rename "
            "them first — the output reserves med/mad for the baseline stats"
        )
    vals = df.filter(F.col(value_col).isNotNull())
    if stats is None:
        stats = robust_stats(df, value_col, by)
    z = F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad")
    return (
        _null_safe_join(vals, stats, by)
        .filter(F.abs(z) > F.lit(float(z_thresh)))
        .withColumn(
            "z_micro",
            F.floor(z * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"),
        )
    )


def ks_two_sample(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
    max_values: int = 100_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two frames: D = max_x |F_a(x) - F_b(x)| over the
    combined support, in integer micro-units, plus both sample sizes —
    the EXACT distribution-shift screen that complements the binned
    PSI/TV monitors (those quantize into a fixed grid; KS sees every
    observed value). Compare D against c(α)·sqrt((n_a+n_b)/(n_a·n_b)),
    c(0.05) ≈ 1.358 — the statistic is exact, no approximation baked in.

    Determinism: both ECDFs are integer cumulative counts over the SAME
    ordered distinct-value spine; each |difference| is one IEEE
    expression over exact integers, micro-rounded per value BEFORE the
    max (order-free). NULLs are excluded.

    Scale shape: each side compresses to a per-value count in one
    map-combining groupBy (quantize continuous high-precision doubles
    first — the robust_anomalies caveat), the spines merge with one
    full-outer join, and the cumsum windows run over the compressed
    spine whose cardinality is ENFORCED <= ``max_values`` (fail-loud
    scalar-count guard + identity limit, the kaplan_meier idiom)."""
    from pyspark.sql import Window

    def side(df, n_alias, c_alias):
        v = df.filter(F.col(value_col).isNotNull()).select(
            F.col(value_col).alias("__v")
        )
        per = v.groupBy("__v").agg(F.count(F.lit(1)).cast("bigint").alias(c_alias))
        n = v.agg(F.count(F.lit(1)).cast("bigint").alias(n_alias))
        return per, n

    pa, na = side(df_a, "n_a", "__ca")
    pb, nb = side(df_b, "n_b", "__cb")
    spine = pa.join(pb, "__v", "full").select(
        "__v",
        F.coalesce(F.col("__ca"), F.lit(0)).cast("bigint").alias("__ca"),
        F.coalesce(F.col("__cb"), F.lit(0)).cast("bigint").alias("__cb"),
    )
    tot = spine.agg(F.count(F.lit(1)).cast("bigint").alias("__tot"))
    spine = (
        spine.crossJoin(F.broadcast(tot))
        .select(
            "__v",
            F.when(F.col("__tot") <= F.lit(int(max_values)), F.col("__ca"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "ks_two_sample: distinct values exceed "
                            f"max_values={int(max_values)} — quantize the "
                            "value column first or raise max_values"
                        )
                    )
                ).cast("bigint")
            )
            .alias("__ca"),
            "__cb",
        )
        .limit(int(max_values))
    )
    w = Window.orderBy("__v")
    cum = spine.select(
        F.sum("__ca").over(w).alias("__fa"),
        F.sum("__cb").over(w).alias("__fb"),
    )
    d = cum.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb)).select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.floor(
                F.abs(
                    F.col("__fa").cast("double") / F.col("n_a").cast("double")
                    - F.col("__fb").cast("double") / F.col("n_b").cast("double")
                )
                * F.lit(float(scale))
                + F.lit(0.5)
            ).cast("bigint"),
        ).otherwise(
            # an empty side has no ECDF: fail loud here, not with an
            # opaque ANSI Infinity-to-bigint cast error downstream
            F.raise_error(
                F.lit("ks_two_sample: empty sample side (no non-NULL values)")
            ).cast("bigint")
        ).alias("__d"),
    )
    return d.groupBy("n_a", "n_b").agg(F.max("__d").alias("d_micro"))


def ks_reference(
    df: DataFrame,
    value_col: str = "value",
    n_probes: int = 32,
) -> DataFrame:
    """Fit the KS drift reference (the ``reference_histogram`` /
    ``ccnet_cuts`` fit-once pattern): ``n_probes`` exact quantile probe
    values of the trusted period plus the reference's EXACT cumulative
    count at each probe — the artifact :func:`windowed_ks` /
    :func:`stream_ks_scores` score against forever. One row per probe:
    (probe_idx, probe_value, ref_le, ref_n). NOTE: fit-style eager
    operator (the ab_test/kmeans precedent) — the probe values
    materialize at call time through exact_quantiles' histogram-pruned
    rank search (no global sort), then ONE conditional-sum pass counts
    the reference at the probes; the returned frame is a bounded driver
    literal (identity-limited, broadcast-auditable)."""
    from .sketches import exact_quantiles

    if n_probes < 2:
        raise ValueError(f"ks_reference: n_probes must be >= 2, got {n_probes}")
    vals = df.filter(F.col(value_col).isNotNull())
    qs = [i / n_probes for i in range(1, n_probes + 1)]
    probes = [
        (float(r["q"]), r["value"])
        for r in exact_quantiles(vals, value_col, qs).collect()
    ]
    probes.sort()
    le_cols = [
        F.sum(F.when(F.col(value_col) <= F.lit(v), 1).otherwise(0))
        .cast("bigint")
        .alias(f"__le{i}")
        for i, (_, v) in enumerate(probes)
    ] + [F.count(F.lit(1)).cast("bigint").alias("__n")]
    row = vals.agg(*le_cols).collect()[0]
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (i, float(v), int(row[f"__le{i}"]), int(row["__n"]))
            for i, (_, v) in enumerate(probes)
        ],
        "probe_idx int, probe_value double, ref_le bigint, ref_n bigint",
    )
    return out.limit(len(probes))  # identity limit: O(n_probes) by construction


def _ks_probe_rows(reference: DataFrame) -> list:
    rows = sorted(reference.collect(), key=lambda r: r["probe_idx"])
    if not rows:
        raise ValueError("KS reference is empty — fit it with ks_reference")
    return rows


def _ks_le_cols(rows, value_col: str):
    """Per-probe conditional cumulative counters, one F.expr each (the
    same sum(case when v <= probe) aggregates the Column build
    produced, minus the py4j storm)."""
    return [
        F.expr(
            f"cast(sum(case when `{value_col}` <="
            f" {_dlit(float(r['probe_value']))} then 1 else 0 end) as bigint)"
        ).alias(f"__le{r['probe_idx']}")
        for r in rows
    ]


def _dlit(x: float) -> str:
    """Exact double literal for composed SQL strings: the string→double
    cast folds to a Literal at plan time, and Double.parseDouble
    round-trips repr() exactly. The drift folds build their per-probe /
    per-spine-value expressions as SQL strings parsed by ONE F.expr —
    the Column-by-Column build cost ~10 py4j round-trips per term
    (measured 12k round-trips / ~3s of driver wall per
    windowed_mann_whitney build)."""
    return f"cast('{x!r}' as double)"


def _ks_d_expr(rows, count_col_fmt: str, total_sql: str):
    """max_i |F_w(probe_i) - F_ref(probe_i)| in integer micro-units:
    per-probe micro-rounding before the greatest() fold keeps the
    statistic an order-free integer max (the ks_two_sample contract).
    The reference fractions fold in as exact-integer-ratio literals."""
    terms = []
    for r in rows:
        fw = f"(cast({count_col_fmt.format(r['probe_idx'])} as double) / {total_sql})"
        fr = (
            f"(cast({int(r['ref_le'])} as double)"
            f" / cast({int(r['ref_n'])} as double))"
        )
        terms.append(
            f"cast(floor(abs({fw} - {fr}) * {_dlit(1_000_000.0)}"
            f" + {_dlit(0.5)}) as bigint)"
        )
    return F.expr(
        f"greatest({', '.join(terms)})" if len(terms) > 1 else terms[0]
    )


def windowed_ks(
    df: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
) -> DataFrame:
    """Per-window Kolmogorov-Smirnov drift score against a trusted
    :func:`ks_reference`: D_w = max over the probe grid of
    |F_window(probe) - F_ref(probe)| in integer micro-units —
    (window_start, n_events, d_micro). The exact-ECDF complement of
    :func:`windowed_psi` (PSI weights log-odds shift over fixed bins;
    KS reads the worst absolute CDF gap, insensitive to binning
    smoothing choices). Probe-grid resolution: D is evaluated AT the
    reference's ``n_probes`` quantiles, so a shift narrower than a
    probe gap can hide — raise ``n_probes`` at fit time for finer
    resolution (the statistic at the probes is exact).

    Plan shape: the reference is O(n_probes) rows, collected into plan
    literals at build time; ONE binning-free aggregation produces
    per-window conditional cumulative counts (shuffle bounded by
    windows x 1 row), and the D fold is a stateless projection — the
    live table scans once."""
    rows = _ks_probe_rows(reference)
    src = df.filter(F.col(value_col).isNotNull())
    count_cols = _ks_le_cols(rows, value_col) + [
        F.count(F.lit(1)).cast("bigint").alias("__n")
    ]
    per = src.groupBy(
        F.date_format(
            F.window(F.col(ts_col), window)["start"], "yyyy-MM-dd HH:mm:ss"
        ).alias("window_start")
    ).agg(*count_cols)
    d = _ks_d_expr(rows, "__le{}", "cast(__n as double)")
    return per.select(
        "window_start",
        F.col("__n").cast("long").alias("n_events"),
        d.alias("d_micro"),
    )


def stream_ks_scores(
    stream_df: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming flavor of :func:`windowed_ks` — the same literal-folded
    reference and the same per-window conditional cumulative counts as
    ONE stateful aggregation (state = open windows x n_probes counters,
    watermark-bounded), with the D fold a stateless projection; exact
    batch parity is pinned in test_streaming. Fit the reference once in
    batch (ks_reference on a trusted period), score the stream forever
    — the stream_psi_scores deployment shape."""
    from ..streaming.windows import _with_event_time

    rows = _ks_probe_rows(reference)
    src = _with_event_time(stream_df, ts_col).select(ts_col, value_col).filter(
        F.col(value_col).isNotNull()
    )
    agg = (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            *_ks_le_cols(rows, value_col),
            F.count(F.lit(1)).cast("bigint").alias("__n"),
        )
    )
    d = _ks_d_expr(rows, "__le{}", "cast(__n as double)")
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col("__n").cast("long").alias("n_events"),
        d.alias("d_micro"),
    )


def mann_whitney_u(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
    max_values: int = 100_000,
) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) with the standard
    tie correction — the rank-based location test that complements
    :func:`ks_two_sample` (KS sees any shape difference; MW-U targets a
    shift and is far more powerful for one). One row: (n_a, n_b,
    u_micro — min(U_a, U_b), z_micro — signed normal approximation from
    U_a, no continuity correction).

    Determinism: tied observations take AVERAGE ranks, and 2x every
    rank sum is an exact integer — for a tied group of size t after c
    smaller observations, each member's doubled rank is (2c + t + 1),
    so 2*R_a = sum(cnt_a * (2c + t + 1)) accumulates as exact bigints
    over the shared distinct-value spine. mu, the tie-corrected sigma,
    and z are derived in ONE identical-rule rounding site each.

    Scale shape: identical to ks_two_sample — each side compresses to a
    per-value count in one map-combining groupBy, the spines merge with
    one full-outer join, and the cumulative window runs over the
    compressed spine whose cardinality is ENFORCED <= ``max_values``
    (fail-loud scalar-count guard + identity limit). Quantize
    high-precision continuous values first, exactly as for KS."""
    from pyspark.sql import Window

    def side(df, c_alias):
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(F.col(value_col).alias("__v"))
            .groupBy("__v")
            .agg(F.count(F.lit(1)).cast("bigint").alias(c_alias))
        )

    pa, pb = side(df_a, "__ca"), side(df_b, "__cb")
    spine = pa.join(pb, "__v", "full").select(
        "__v",
        F.coalesce(F.col("__ca"), F.lit(0)).cast("bigint").alias("__ca"),
        F.coalesce(F.col("__cb"), F.lit(0)).cast("bigint").alias("__cb"),
    )
    tot = spine.agg(F.count(F.lit(1)).cast("bigint").alias("__tot"))
    spine = (
        spine.crossJoin(F.broadcast(tot))
        .select(
            "__v",
            F.when(F.col("__tot") <= F.lit(int(max_values)), F.col("__ca"))
            .otherwise(
                F.raise_error(
                    F.lit(
                        "mann_whitney_u: distinct values exceed "
                        f"max_values={int(max_values)} — quantize the "
                        "value column first or raise max_values"
                    )
                ).cast("bigint")
            )
            .alias("__ca"),
            "__cb",
        )
        .limit(int(max_values))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    t = (F.col("__ca") + F.col("__cb")).cast("bigint")
    c = F.coalesce(F.sum(F.col("__ca") + F.col("__cb")).over(w), F.lit(0)).cast(
        "bigint"
    )
    dec = "decimal(38,0)"
    # cast-THEN-multiply: rank terms reach count x 2N (and the tie term
    # N^3) — bigint products overflow int64 at real corpus sizes, so
    # every product runs in 38-digit decimal
    per = spine.select(
        F.col("__ca"),
        F.col("__cb"),
        (F.col("__ca").cast(dec)
         * (F.lit(2) * c + t + F.lit(1)).cast(dec)).alias("__r2a"),
        (t.cast(dec) * t.cast(dec) * t.cast(dec) - t.cast(dec)).alias("__ties"),
    )
    agg = per.agg(
        F.sum("__ca").cast("bigint").alias("n_a"),
        F.sum("__cb").cast("bigint").alias("n_b"),
        F.sum("__r2a").alias("__r2a"),
        F.sum("__ties").alias("__ties"),
    )
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = n_a + n_b
    # 2*U_a = 2*R_a - n_a*(n_a+1): exact decimal integers end to end
    dec2 = "decimal(38,0)"
    u2a = F.col("__r2a") - F.col("n_a").cast(dec2) * (
        F.col("n_a") + F.lit(1)
    ).cast(dec2)
    u2b = F.lit(2).cast(dec2) * F.col("n_a").cast(dec2) * F.col("n_b").cast(dec2) - u2a
    ua = u2a.cast("double") / F.lit(2.0)
    mu = n_a * n_b / F.lit(2.0)
    sigma2 = (
        n_a * n_b / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("__ties").cast("double") / (n * (n - F.lit(1.0))))
    )
    # the empty-side guard wraps EVERY output column (not just n_a): a
    # downstream select that keeps only u_micro/z_micro must not let
    # Catalyst column-prune the raise_error away (ADVICE r11) — with an
    # empty side u2b = -u2a is garbage, so each dependent expression
    # carries its own fail-loud gate, the log_rank_test pattern
    both_sides = (F.col("n_a") > 0) & (F.col("n_b") > 0)

    def _guard(expr):
        return F.when(both_sides, expr).otherwise(
            F.raise_error(
                F.lit("mann_whitney_u: empty sample side (no non-NULL values)")
            ).cast("bigint")
        )

    out = agg.select(
        _guard(F.col("n_a")).alias("n_a"),
        _guard(F.col("n_b")).alias("n_b"),
        _guard(
            F.floor(
                F.least(u2a, u2b).cast("double") / F.lit(2.0) * F.lit(float(scale))
                + F.lit(0.5)
            ).cast("bigint")
        ).alias("u_micro"),
        _guard(
            F.when(
                sigma2 > 0,
                F.floor((ua - mu) / F.sqrt(sigma2) * F.lit(float(scale)) + F.lit(0.5))
                .cast("bigint"),
            )
        ).alias("z_micro"),
    )
    return out


def mwu_reference(
    df: DataFrame,
    value_col: str = "value",
    max_values: int = 512,
) -> DataFrame:
    """Fit the Mann-Whitney drift reference (the ``ks_reference``
    fit-once pattern): the trusted sample's EXACT distinct-value spine
    with per-value counts and strict-less cumulative counts — the
    artifact :func:`windowed_mann_whitney` / :func:`stream_mwu_scores`
    score against forever. One row per distinct value:
    (value, cnt, cum_lt); n_a = sum(cnt).

    The spine cardinality is ENFORCED <= ``max_values`` (fail-loud
    before collect, the batch :func:`mann_whitney_u` contract):
    quantize high-precision continuous values first — the scorers fold
    the spine into plan literals, so its size bounds both the plan and
    the per-window state."""
    vals = df.filter(F.col(value_col).isNotNull())
    k = vals.select(F.countDistinct(value_col).alias("k")).first()["k"]
    if k == 0:
        raise ValueError("mwu_reference: no non-NULL values to fit on")
    if k > max_values:
        raise ValueError(
            f"mwu_reference: {k} distinct values exceed max_values="
            f"{int(max_values)} — quantize the value column first or raise "
            "max_values"
        )
    counts = sorted(
        (float(r["__v"]), int(r["__c"]))
        for r in vals.groupBy(F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    rows, cum = [], 0
    for v, c in counts:
        rows.append((v, c, cum))
        cum += c
    spark = df.sparkSession
    out = spark.createDataFrame(rows, "value double, cnt bigint, cum_lt bigint")
    return out.limit(len(rows))  # identity limit: O(spine) by construction


def _mwu_ref_rows(reference: DataFrame) -> list:
    rows = sorted(reference.collect(), key=lambda r: r["value"])
    if not rows:
        raise ValueError("MWU reference is empty — fit it with mwu_reference")
    return rows


def _mwu_fold_exprs(rows, lt_col_fmt: str, n_col_sql: str, scale: int):
    """(n_events, u_micro, z_micro) expressions over per-window
    strict-less counters at the reference spine values.

    Live rows SNAP to the spine step function (a value in
    [spine_i, spine_i+1) scores as spine_i; values below the whole
    spine form their own tie group that contributes 0 to U) — the
    rank-preserving quantization onto the reference grid that makes the
    per-window state exactly len(spine) bounded counters, the
    windowed-KS probe-grid trade stated on the operator. Against the
    quantized window the statistic is the EXACT tie-corrected
    :func:`mann_whitney_u` (parity pinned in tests): every doubled
    rank/tie term accumulates in DECIMAL(38,0) from exact bigint
    counters, and u/z round once at the end."""
    # the fold is composed as ONE SQL string per output column (parsed
    # by a single F.expr): with K spine values the Column-by-Column
    # build made ~12k py4j round-trips (~3s of driver wall per call on
    # a 48-value spine); the parsed trees are operation-identical, so
    # every exact-integer and double rounding step is unchanged
    dec = "decimal(38,0)"
    K = len(rows)
    n_a = sum(int(r["cnt"]) for r in rows)
    lt = lambda i: f"cast({lt_col_fmt.format(i)} as bigint)"
    n_b = f"cast({n_col_sql} as bigint)"
    # snapped live bucket counts: below-spine, per spine value
    b_below = lt(0)
    buckets = [
        f"({lt(i + 1)} - {lt(i)})" if i + 1 < K else f"({n_b} - {lt(K - 1)})"
        for i in range(K)
    ]
    # 2*U_b = sum_i b_i * (2*cum_lt_a_i + a_i): exact integers
    u2b_terms = [f"cast(0 as {dec})"]
    for i, r in enumerate(rows):
        coef = 2 * int(r["cum_lt"]) + int(r["cnt"])
        u2b_terms.append(
            f"cast({buckets[i]} as {dec}) * cast({coef} as {dec})"
        )
    u2b = "(" + " + ".join(u2b_terms) + ")"
    u2a = f"(cast({2 * n_a} as {dec}) * cast({n_b} as {dec}) - {u2b})"
    # tie term sum(t^3 - t) over the combined sample's groups: the
    # below-spine group (a=0) plus one group per spine value
    bb = f"cast({b_below} as {dec})"
    tie_terms = [f"{bb} * {bb} * {bb} - {bb}"]
    for i, r in enumerate(rows):
        t = f"(cast({buckets[i]} as {dec}) + cast({int(r['cnt'])} as {dec}))"
        tie_terms.append(f"({t} * {t} * {t} - {t})")
    tie = "(" + " + ".join(tie_terms) + ")"
    n_af, n_bf = _dlit(float(n_a)), f"cast({n_b} as double)"
    n = f"({n_af} + {n_bf})"
    mu = f"({n_af} * {n_bf} / {_dlit(2.0)})"
    sigma2 = (
        f"({n_af} * {n_bf} / {_dlit(12.0)}"
        f" * (({n} + {_dlit(1.0)})"
        f" - cast({tie} as double) / ({n} * ({n} - {_dlit(1.0)}))))"
    )
    ua = f"(cast({u2a} as double) / {_dlit(2.0)})"
    u_micro = (
        f"cast(floor(cast(least({u2a}, {u2b}) as double) / {_dlit(2.0)}"
        f" * {_dlit(float(scale))} + {_dlit(0.5)}) as bigint)"
    )
    z_micro = (
        f"case when {sigma2} > {_dlit(0.0)} then"
        f" cast(floor(({ua} - {mu}) / sqrt({sigma2})"
        f" * {_dlit(float(scale))} + {_dlit(0.5)}) as bigint) end"
    )
    return (
        F.expr(n_b).alias("n_events"),
        F.expr(u_micro).alias("u_micro"),
        F.expr(z_micro).alias("z_micro"),
    )


def _mwu_lt_cols(rows, value_col: str):
    return [
        F.expr(
            f"cast(sum(case when `{value_col}` < {_dlit(float(r['value']))}"
            f" then 1 else 0 end) as bigint)"
        ).alias(f"__lt{i}")
        for i, r in enumerate(rows)
    ] + [F.count(F.lit(1)).cast("bigint").alias("__n")]


def windowed_mann_whitney(
    df: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-window Mann-Whitney U drift monitor against a trusted
    :func:`mwu_reference`: each window's live sample snaps onto the
    reference's distinct-value spine and is rank-sum tested against the
    reference — (window_start, n_events, u_micro, z_micro), the
    location-shift complement of :func:`windowed_ks` (KS reads the
    worst CDF gap; MW-U is far more powerful for a shift). z keeps the
    exact tie correction; u_micro is min(U_a, U_b), z's sign is from
    the reference side, both micro-rounded once — identical conventions
    to the batch :func:`mann_whitney_u` (exact parity on spine-valued
    windows is pinned in tests).

    Plan shape (the windowed_ks deployment shape): the reference folds
    into plan literals at build time; ONE aggregation produces
    per-window strict-less counters at the spine values (shuffle
    bounded by windows x 1 row, state bounded by len(spine) counters),
    and the U/z fold is a stateless projection — the live table scans
    once. Grid resolution: live values between spine points score at
    the step below (and below-spine values tie at 0 wins), so fit the
    reference on the quantization you monitor at."""
    rows = _mwu_ref_rows(reference)
    src = df.filter(F.col(value_col).isNotNull())
    per = src.groupBy(
        F.date_format(
            F.window(F.col(ts_col), window)["start"], "yyyy-MM-dd HH:mm:ss"
        ).alias("window_start")
    ).agg(*_mwu_lt_cols(rows, value_col))
    n_ev, u, z = _mwu_fold_exprs(rows, "__lt{}", "__n", scale)
    return per.select("window_start", n_ev, u, z)


def stream_mwu_scores(
    stream_df: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    scale: int = 1_000_000,
) -> DataFrame:
    """Streaming flavor of :func:`windowed_mann_whitney` — the same
    literal-folded spine and the same per-window strict-less counters
    as ONE stateful aggregation (state = open windows x len(spine)
    counters, watermark-bounded), with the U/z fold a stateless
    projection; exact batch parity is pinned in test_streaming. Fit the
    reference once in batch (mwu_reference on a trusted, pre-quantized
    period), score the stream forever — the stream_ks_scores
    deployment shape."""
    from ..streaming.windows import _with_event_time

    rows = _mwu_ref_rows(reference)
    src = _with_event_time(stream_df, ts_col).select(ts_col, value_col).filter(
        F.col(value_col).isNotNull()
    )
    agg = (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*_mwu_lt_cols(rows, value_col))
    )
    n_ev, u, z = _mwu_fold_exprs(rows, "__lt{}", "__n", scale)
    return agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        n_ev, u, z,
    )
