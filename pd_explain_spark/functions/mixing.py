"""Training-mix construction operators: PII redaction, stratified quota
sampling, and sequence packing.

These are the steps between "curated corpus" and "training run" in a
large-scale LLM data pipeline (no reference counterpart — the reference
is a tabular explainer; these extend the training-data operator family
in functions/text.py / functions/dedup.py):

 * redact_pii        — scrub emails/SSNs/phones/IPs with JVM-side
                       regexp_replace chains; pure scan-stage work, no
                       shuffle, no Python.
 * stratified_sample — exact per-stratum quotas (e.g. 10k docs per
                       language) with a deterministic seeded order, via
                       a two-phase top-n so a hot stratum ("en" is half
                       the corpus) never funnels into one task.
 * pack_sequences    — assign documents to fixed token-budget packs by
                       cumulative token count, reusing the bucketed
                       two-phase prefix-sum (operators/rolling.py) so
                       there is never a single global sort partition.

Every regex is chosen to behave identically under Java regex (Spark)
and RE2 (the DuckDB oracle): character classes, no backreferences, no
lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_int
from .text import token_count

# Applied IN ORDER; counts for pattern i are taken on the text after
# patterns 0..i-1 were replaced, so an address inside an email is never
# double-counted. Order: emails first (they contain dots/digits that
# look like IPs), SSN before phone (3-2-4 vs 3-3-4 groups).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+?\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Replace common PII shapes with typed placeholder tokens and count
    what was removed. Returns the input columns with ``text_col``
    redacted plus one ``pii_<kind>_count`` column per pattern.

    Scale shape: a single projection — regexp_count + regexp_replace are
    JVM intrinsics evaluated in the scan stage, so this costs one pass
    over the bytes with zero shuffle and composes with the curation
    gates (functions/text.py) in the same stage. At 100 TB that is the
    only acceptable cost model for a per-document rewrite."""
    text = F.col(text_col)
    counts: dict[str, Column] = {}
    for kind, pat, repl in PII_PATTERNS:
        counts[f"pii_{kind}_count"] = F.regexp_count(text, F.lit(pat))
        text = F.regexp_replace(text, pat, repl)
    return df.select(
        *[c for c in df.columns if c != text_col],
        text.alias(text_col),
        *[v.alias(k) for k, v in counts.items()],
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment: adds
    ``out_col`` with the split name. Default weights
    {'train': .98, 'val': .01, 'test': .01}.

    Assignment is a pure function of (id, seed) — md5 hex prefix mapped
    to [0, 1e6) and cut at the cumulative weight boundaries — so
    membership is stable across reruns, cluster sizes, AND corpus
    growth: adding documents never moves an existing document between
    splits (the property random-number splits lack). Scan-stage
    expression, zero shuffle; the same arithmetic runs verbatim in SQL
    (DuckDB: ('0x' || substr(md5(..), 1, 8))::BIGINT)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    h = (
        md5_int(
            F.md5(F.concat_ws("-", F.col(id_col).cast("string"), F.lit(str(seed)))),
            width=8,
        )
        % 1_000_000
    )
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(round(cum * 1_000_000))
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def leakage_safe_splits(
    df: DataFrame,
    pairs: DataFrame | None = None,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
    rep_col: str = "split_rep",
    components: DataFrame | None = None,
) -> DataFrame:
    """Train/val/test assignment where every near-duplicate CLUSTER lands
    in one split: hash the duplicate-component representative (the min id
    reachable through any chain of near-dup pairs) instead of the raw
    document id.

    Plain per-document hashing leaks: two near-copies of the same page
    can straddle the train/test boundary, and the test half then scores
    as memorized (the Lee et al. 2022 dedup paper's eval-contamination
    finding). Routing the whole component to one side makes the split
    boundary contamination-safe while keeping the assign_splits
    stability guarantees — membership is a pure function of
    (representative, seed), so adding unrelated documents never moves an
    existing cluster.

    ``pairs`` is a near-dup pair list (``id_a``/``id_b`` — any generator
    in functions/dedup.py works); pass ``components`` instead to reuse an
    already-computed (id, component) table. Scale shape: components only
    contains documents that HAVE a near-duplicate — usually orders of
    magnitude smaller than the corpus — and the join carries NO
    broadcast hint: AQE broadcasts when the components table is
    actually small and falls back to a shuffle join on a dup-heavy
    crawl where a forced broadcast would OOM (r8 ADVICE; same fix as
    dedup.soft_dedup_weights). The split expression itself stays
    scan-stage.
    """
    from .dedup import duplicate_components

    if components is None:
        if pairs is None:
            raise ValueError("leakage_safe_splits: pass pairs or components")
        components = duplicate_components(pairs)
    comp = components.select(
        F.col("id").alias("__lsid"), F.col("component").alias("__lscomp")
    )
    out = (
        df.join(comp, df[id_col] == F.col("__lsid"), "left")
        .withColumn(rep_col, F.coalesce(F.col("__lscomp"), F.col(id_col)))
        .drop("__lsid", "__lscomp")
    )
    return assign_splits(out, weights=weights, id_col=rep_col, seed=seed, out_col=out_col)


def _sample_key(id_col: str, seed: int) -> Column:
    """Deterministic per-row ordering key, identical on Spark and DuckDB:
    md5 of "<id>-<seed>" (both engines hash the same bytes to the same
    hex string, unlike xxhash64 which DuckDB lacks)."""
    return F.md5(F.concat_ws("-", F.col(id_col).cast("string"), F.lit(str(seed))))


def stratified_sample(
    df: DataFrame,
    by: str = "lang",
    quota: int | dict[str, int] = 1000,
    id_col: str = "doc_id",
    seed: int = 42,
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact per-stratum quota sampling — the training-mix constructor:
    "take N documents per language/source", deterministic under ``seed``.

    Semantics: within each stratum, rows are ordered by
    md5("<id>-<seed>") (ties by id) and the first ``quota`` are kept.
    ``quota`` may be a single int or a per-stratum dict (strata absent
    from the dict are dropped — a mix spec is a whitelist).

    Scale shape: a naive ``row_number() OVER (PARTITION BY stratum)``
    sends every row of the hottest stratum to one task. Instead the
    classic two-phase top-n: phase 1 ranks within (stratum, salt) —
    ``salt_buckets``-way parallel even for a stratum holding half the
    corpus — and keeps ``quota`` per salt; phase 2 ranks the surviving
    <= quota * salt_buckets rows per stratum exactly. Phase 2's input is
    bounded by the quota spec, not the corpus, so the skew ceiling is
    O(quota * salt_buckets) rows per task regardless of data volume.
    The result is EXACTLY the naive definition's output."""
    key = _sample_key(id_col, seed)
    if isinstance(quota, dict):
        q = F.lit(None).cast("int")
        for stratum, n in sorted(quota.items()):
            q = F.when(F.col(by) == stratum, F.lit(n)).otherwise(q)
    else:
        q = F.lit(int(quota))

    salted = df.withColumn("__key", key).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    ).withColumn("__quota", q).filter(F.col("__quota").isNotNull())
    w1 = Window.partitionBy(by, "__salt").orderBy("__key", id_col)
    phase1 = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(by).orderBy("__key", id_col)
    return (
        phase1.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__key", "__quota")
    )


def temperature_sample(
    df: DataFrame,
    by: str = "source",
    alpha: float = 0.7,
    target_rows: int = 10_000,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/domain
    alpha-sampling rule): stratum ``s`` receives a share of the output
    proportional to ``count_s ** alpha``. ``alpha = 1`` reproduces the
    natural distribution, ``alpha = 0`` uniform across strata; values
    in between (0.5-0.8 in practice) lift low-resource strata without
    letting the head domains dominate.

    Each row is kept iff its deterministic hash fraction
    u = md5("<id>-<seed>")[:15] / 16^15 is below the stratum's rate
    min(1, target_rows * w_s / count_s) — the SAME md5 key contract as
    ``stratified_sample``, so reruns and engine mirrors agree row for
    row. Expected output size is ~``target_rows`` (exact per-stratum
    quotas are ``stratified_sample``'s job). Rates clamp at 1 —
    downsample-only; upsampling (rate > 1) is an epoch-repetition
    decision for the data loader, not the corpus builder.

    Scale shape: per-stratum counts are one map-side-combining shuffle
    over the (tiny) stratum key; the rate table is O(#strata) and
    broadcasts; the corpus itself is filtered in the scan stage of the
    probe side — never shuffled.
    """
    per = df.groupBy(by).agg(F.count(F.lit(1)).alias("__cnt"))
    tot = per.agg(F.sum(F.pow(F.col("__cnt"), F.lit(alpha))).alias("__tot"))
    rates = per.crossJoin(F.broadcast(tot)).select(
        F.col(by),
        F.least(
            F.lit(1.0),
            F.lit(float(target_rows))
            * F.pow(F.col("__cnt"), F.lit(alpha))
            / F.col("__tot")
            / F.col("__cnt"),
        ).alias("__rate"),
    )
    u = md5_int(_sample_key(id_col, seed)).cast("double") / F.lit(float(16**15))
    return (
        df.join(F.broadcast(rates), by)
        .filter(u < F.col("__rate"))
        .select(*df.columns)
    )


def token_budget_sample(
    df: DataFrame,
    budget: int | dict[str, int],
    by: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 256,
) -> DataFrame:
    """Token-budget mixing — "give me at most N TOKENS per stratum", the
    unit a training run is actually priced in (stratified_sample quotas
    ROWS; a 100B-token mix spec quotas tokens). Deterministic greedy
    prefix: within each stratum, rows are ordered by the corpus-wide
    sampling key md5("<id>-<seed>") and a row is kept iff the stratum's
    cumulative whitespace-token count THROUGH it stays <= its budget —
    so a stratum's kept tokens never exceed the budget, and reruns /
    engine mirrors agree row for row. ``budget`` may be one int or a
    per-stratum dict (absent strata are dropped — a mix spec is a
    whitelist, the stratified_sample contract).

    Scale shape: the naive form is a running sum over ONE window per
    stratum — the hottest stratum lands on one task. Instead the prefix
    is decomposed by the key's leading byte(s): bucket b holds keys in
    [b/B, (b+1)/B) of the hash space, so the stratum order is exactly
    (bucket, key, id). Per-(stratum, bucket) token sums make a tiny
    table (strata x ``n_buckets``) whose bucket-prefix cumsum broadcasts
    back; a bucket wholly inside the budget keeps every row WITHOUT any
    window, a bucket wholly past it drops scan-side, and only the ONE
    boundary bucket per stratum (~1/n_buckets of the stratum) runs the
    exact within-bucket running sum. Skew ceiling is stratum/n_buckets
    rows per task — ``n_buckets`` is the knob, same trick as
    dsir_sample's threshold path.
    """
    from .text import token_count

    key = _sample_key(id_col, seed)
    if isinstance(budget, dict):
        b = F.lit(None).cast("long")
        for stratum, n in sorted(budget.items()):
            b = F.when(F.col(by) == stratum, F.lit(int(n))).otherwise(b)
    else:
        b = F.lit(int(budget))

    base = (
        df.withColumn("__key", key)
        # NULL text counts as 0 tokens (kept for free if inside the
        # prefix) — a NULL __tok would otherwise void whole-bucket sums
        .withColumn(
            "__tok", F.coalesce(token_count(F.col(text_col)).cast("long"), F.lit(0))
        )
        .withColumn("__budget", b)
        .filter(F.col("__budget").isNotNull())
        # leading hex chars of the key = its position in the hash space;
        # ordering by (bucket, key) IS ordering by key
        .withColumn(
            "__kb",
            F.conv(F.substring("__key", 1, _hex_chars(n_buckets)), 16, 10).cast("int"),
        )
    )
    per_bucket = base.groupBy(by, "__kb").agg(F.sum("__tok").alias("__bt"))
    wb = (
        Window.partitionBy(by)
        .orderBy("__kb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = per_bucket.withColumn(
        "__cb", F.coalesce(F.sum("__bt").over(wb), F.lit(0))
    ).withColumn("__ct", F.col("__cb") + F.col("__bt"))
    joined = base.join(F.broadcast(spans), [by, "__kb"])
    whole = joined.filter(F.col("__ct") <= F.col("__budget"))
    boundary = joined.filter(
        (F.col("__cb") <= F.col("__budget")) & (F.col("__ct") > F.col("__budget"))
    )
    wrow = (
        Window.partitionBy(by, "__kb")
        .orderBy("__key", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cut = boundary.withColumn(
        "__pre", F.col("__cb") + F.sum("__tok").over(wrow)
    ).filter(F.col("__pre") <= F.col("__budget"))
    return whole.select(*df.columns).unionByName(cut.select(*df.columns))


def _hex_chars(n_buckets: int) -> int:
    """Hex digits needed so md5-prefix buckets are at least n_buckets
    (the bucket count actually used is 16^chars)."""
    chars = 1
    while 16**chars < n_buckets:
        chars += 1
    return chars


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str | None = None,
    tokens_col: str | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Assign each document a position in a stream of fixed token-budget
    packs (the "sequence packing" step that turns a curated corpus into
    training sequences): documents are concatenated in ``order_col``
    order and the stream is cut every ``budget`` tokens.

    Returns (id, n_tokens, pack_id, pack_pos): the pack index where the
    document STARTS and its token offset inside that pack. A document
    with pack_pos + n_tokens > budget straddles into the next pack(s) —
    the consumer decides whether to wrap or truncate.

    ``tokens_col`` names a precomputed token-count column (e.g. real BPE
    counts); default is the whitespace ``token_count`` so the result is
    exactly mirrorable in SQL. ``order_col`` defaults to ``id_col``;
    production mixes typically pass a hash-derived shuffle key.

    Scale shape: the cumulative sum is the bucketed two-phase prefix
    scan from operators/rolling.py — per-bucket window + an O(buckets)
    driver carry — so packing 100 TB never creates a global sort
    partition. Everything else is scan-stage arithmetic."""
    from ..operators.rolling import cumsum_col

    order_col = order_col or id_col
    n_tok = (
        F.col(tokens_col) if tokens_col else token_count(F.col(text_col))
    ).cast("long")
    slim = df.select(F.col(id_col), F.col(order_col).alias("__ord"), n_tok.alias("n_tokens"))
    cum = cumsum_col(slim, "n_tokens", on="__ord", out_name="__cum", num_buckets=num_buckets)
    start = F.col("__cum") - F.col("n_tokens")
    return cum.select(
        id_col,
        "n_tokens",
        F.floor(start / F.lit(budget)).cast("long").alias("pack_id"),
        (start % F.lit(budget)).cast("long").alias("pack_pos"),
    )


def shuffle_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 64,
    partition_to_shards: bool = False,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the step that
    turns a curated corpus into globally-shuffled, fixed-shard training
    input. Adds two columns:

      shard = portable_hash(id, seed) mod n_shards
      pos   = 0-based rank within the shard, ordered by (hash, id)

    (shard asc, pos asc) is a uniform pseudo-random total order of the
    corpus that any engine reproduces from (id, seed) alone — no RNG
    state, no sampled range boundaries, re-runnable byte-for-byte. The
    hash is the md5("<id>-<seed>") 60-bit key every sampling operator
    here uses, so shuffle order and sampling decisions stay consistent.

    Scale shape: ONE hash shuffle keyed by shard plus a within-shard
    sort (each window partition is ~rows/n_shards); never a global sort
    and never repartitionByRange (whose sampled boundaries differ run
    to run). Size n_shards so a shard's rows fit a task comfortably —
    at 100 TB that means thousands of shards, which this plan handles
    unchanged. ``partition_to_shards=True`` places the one shuffle as an
    explicit repartition(n_shards, shard) BEFORE the rank window — the
    window's clustering requirement is then already satisfied (no
    second exchange). Note Spark hash-partitions by murmur3(shard) mod
    n_shards, NOT identity: a partition may hold a few shards and
    others none, so task skew is bounded by a small constant factor of
    the shard size (the file sink still splits files by shard VALUE via
    partitionBy)."""
    h = md5_int(_sample_key(id_col, seed))
    base = df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
    )
    if partition_to_shards:
        base = base.repartition(n_shards, F.col("shard"))
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        base.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h")
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 64,
    mode: str = "error",
    fmt: str = "parquet",
) -> None:
    """Materialize the deterministic shuffle as hive-partitioned shard
    directories: shard=K/ holds that shard's rows sorted by pos. A
    training loader reads shard directories in order (or assigns them
    round-robin to data-parallel workers) and gets the same byte stream
    every run. ONE shuffle (the repartition-to-shards inside
    shuffle_assign, which also satisfies the rank window's clustering —
    no second exchange) + a per-partition sort + write; no driver
    bottleneck, no global sort. ``fmt='json'`` emits JSONL shards (the
    common text-corpus interchange format); parquet is the default."""
    out = shuffle_assign(
        df, id_col=id_col, seed=seed, n_shards=n_shards, partition_to_shards=True
    )
    writer = (
        out.sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
    )
    writer.format(fmt).save(path)


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_phases: int = 3,
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 64,
) -> DataFrame:
    """Curriculum training order: exact score-quantile PHASES (phase 0 =
    lowest ``score_col`` ... phase n-1 = highest — the easy-to-hard
    schedule when the score is a difficulty proxy) plus the
    deterministic (shard, pos) shuffle, so a loader replays phase by
    phase, within each phase ordered by (shard, pos) — byte-identical
    every run, phase boundaries exact, no RNG state.

    Phase cuts come from :func:`~pd_explain_spark.functions.sketches.
    exact_quantiles` (value at rank ceil(q*N), no global sort) and are
    collected ONCE as n_phases-1 literals (the fit-once/score-many
    pattern ccnet_cuts uses); labeling is scan-stage comparisons and
    ordering is shuffle_assign's one hash shuffle. Ties at a cut land
    in the lower phase on every engine; NULL scores keep their rows
    with a NULL phase (route them explicitly rather than silently
    training on them)."""
    from .sketches import exact_quantiles

    if n_phases < 2:
        raise ValueError("curriculum_order: n_phases must be >= 2")
    qs = [i / n_phases for i in range(1, n_phases)]
    cuts = [
        r["value"]
        for r in exact_quantiles(df, score_col, qs).collect()
    ]
    expr = None
    for i, c in enumerate(cuts):
        cond = F.col(score_col) <= F.lit(c)
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    phase = expr.otherwise(n_phases - 1) if expr is not None else F.lit(0)
    phase = (
        F.when(F.col(score_col).isNull(), F.lit(None)).otherwise(phase)
    ).cast("int")
    return shuffle_assign(
        df, id_col=id_col, seed=seed, n_shards=n_shards
    ).withColumn("phase", phase)


def compact_dataset(
    spark,
    src_path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    fmt: str = "parquet",
    shuffle: bool = False,
    mode: str = "error",
) -> int:
    """Compact a small-files dataset into ~``target_rows_per_file``
    files — the standard fix for the SMALL-FILES problem that kills
    100 TB scans (every tiny file costs a task + a footer read + a
    namenode entry; a crawl ingest that lands one file per micro-batch
    degrades every downstream job until someone compacts). Returns the
    number of output files requested.

    ``shuffle=False`` (default) uses ``coalesce`` — NO shuffle, input
    partitions are merged in place, the cheapest possible rewrite
    (files may end uneven if the input was skewed).  ``shuffle=True``
    pays one round-robin repartition for evenly sized output files.
    The row count driving the file count is parquet-metadata-only for
    parquet sources (no data scan)."""
    if target_rows_per_file < 1:
        raise ValueError("compact_dataset: target_rows_per_file must be >= 1")
    df = spark.read.format(fmt).load(src_path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    out = df.repartition(n_files) if shuffle else df.coalesce(n_files)
    out.write.mode(mode).format(fmt).save(out_path)
    return n_files


# ------------------------------------------------------------------ DSIR
def _hashed_gram_buckets(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) — one row per word unigram AND bigram OCCURRENCE,
    hashed into ``n_buckets`` (the DSIR feature space, Xie et al. 2023,
    arXiv:2302.03169). md5-bucketing so the DuckDB oracle reproduces the
    exact assignment: ('0x'||substr(md5(gram),1,15))::BIGINT % B."""
    from .text import unigram_bigram_grams

    return unigram_bigram_grams(df, text_col, id_col).select(
        "id", F.pmod(md5_int(F.md5(F.col("gram"))), F.lit(n_buckets)).alias("bucket")
    )


def dsir_log_ratios(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
) -> DataFrame:
    """(bucket, log_ratio) — per-bucket ln(p_target / p_raw) under the
    hashed bag-of-ngrams model with add-``smoothing`` Laplace smoothing.
    Exactly ``n_buckets`` rows — one per bucket in [0, n_buckets),
    including the smoothed-default rows for buckets neither fit corpus
    produced — broadcast-sized by construction regardless of corpus size
    (the DSIR design point: the model is O(buckets), the corpora are
    only ever scanned once). The complete spine is what makes the
    fit-once/score-many path exact: scoring joins on bucket and every
    bucket a future batch can hash to is present.

    The two corpus scans are map-side-combining bucket counts; the two
    totals are O(1) scalar collects."""
    cr = (
        _hashed_gram_buckets(raw_df, text_col, "doc_id", n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_raw"))
    )
    ct = (
        _hashed_gram_buckets(target_df, text_col, "doc_id", n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    return _ratios_from_counts(cr, ct, n_buckets, smoothing)


def _ratios_from_counts(
    cr: DataFrame, ct: DataFrame, n_buckets: int, smoothing: float
) -> DataFrame:
    """(bucket, log_ratio) from the two per-bucket count tables. The
    corpus totals come from summing the O(buckets) tables — exactly the
    gram counts — as LAZY broadcast scalars (the scalar-augmentation
    idiom scale_audit classifies as info): a driver-side .first() per
    total would add two extra jobs re-materializing the count subtrees,
    which r7's bench measured as a 3.4x regression on this entry."""
    b = float(n_buckets) * smoothing
    tot = cr.agg(F.sum("c_raw").alias("__tr")).crossJoin(
        ct.agg(F.sum("c_tgt").alias("__tt"))
    )
    # full bucket spine [0, n_buckets): buckets absent from BOTH fit
    # corpora still get their smoothed default ln((tr+B)/(tt+B)) row, so
    # a precomputed `ratios` table scores ANY batch completely — the
    # fit-once/score-many path must not silently drop grams that hash to
    # a bucket the fit corpora never produced (ADVICE r7 medium). The
    # spine is O(n_buckets) rows — broadcast-sized by construction.
    spine = cr.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    return (
        spine.join(cr.join(ct, "bucket", "full"), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(smoothing))
                    / (F.coalesce(F.col("__tt"), F.lit(0)) + F.lit(b))
                )
                - F.log(
                    (F.coalesce(F.col("c_raw"), F.lit(0)) + F.lit(smoothing))
                    / (F.coalesce(F.col("__tr"), F.lit(0)) + F.lit(b))
                )
            ).alias("log_ratio"),
        )
    )


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    ratios: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weight (Xie et al. 2023,
    arXiv:2302.03169): log w(x) = sum over the doc's hashed n-gram
    occurrences of ln(p_target[bucket]/p_raw[bucket]). Returns
    (id_col, n_grams, log_weight[4dp]) with one row per raw doc —
    zero-gram docs carry log_weight 0.0 (weight 1: the model has no
    evidence either way).

    Scale shape: ONE explode over each corpus, total. The raw corpus's
    per-(doc, bucket) integer count table (map-side combine) is the
    shared intermediate: the raw side of the ratio model is its
    per-bucket re-aggregation (docs x buckets rows in, buckets rows
    out), the per-doc weights are its broadcast join against the
    O(buckets) ratio table + one map-combining per-doc sum, and the
    corpus totals are sums over the count tables — no .count() job ever
    re-runs a tokenize/explode subtree. The target corpus is touched
    once to fit; pass a precomputed ``ratios`` (from
    :func:`dsir_log_ratios`, fitted with the SAME ``n_buckets``) to
    score many batches against one fitted model — the ratio table
    carries the full [0, n_buckets) spine including smoothed-default
    rows for buckets the fit corpora never produced, so the scoring
    join is exact for any batch (grams hashing to fit-unseen buckets
    contribute the Laplace default ln((tr+B)/(tt+B)), never silently
    drop)."""
    per_bucket = (
        _hashed_gram_buckets(raw_df, text_col, id_col, n_buckets)
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if ratios is None:
        cr = per_bucket.groupBy("bucket").agg(F.sum("cnt").alias("c_raw"))
        ct = (
            _hashed_gram_buckets(target_df, text_col, "doc_id", n_buckets)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c_tgt"))
        )
        ratios = _ratios_from_counts(cr, ct, n_buckets, smoothing)
    scored = (
        per_bucket.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 4).alias("log_weight"),
        )
    )
    # per_bucket feeds both the ratio fit and the scoring join as the
    # SAME aggregate subtree: ReuseExchange dedups the shuffle in the
    # single-action plan, so no persist (and no eager checkpoint — the
    # r7 bench measured persist+checkpoint at 3.4x the lazy plan here)
    return (
        raw_df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0).cast("bigint")).alias("n_grams"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_sample(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    temperature: float = 1.0,
    seed: int = 42,
    method: str = "auto",
    heap_max_k: int = 1_000_000,
) -> DataFrame:
    """Importance-resample ``k`` raw docs toward the target distribution:
    Gumbel top-k over log_weight/temperature — the exact equivalent of
    sampling WITHOUT replacement with probability proportional to
    w^(1/temperature). The Gumbel noise is a pure function of (id, seed)
    through md5, so the sample is deterministic and the DuckDB oracle
    reproduces the draw bit-for-bit. Returns the sampled raw rows with
    (log_weight, gumbel_key) attached.

    Two selection physics, same result set (pytest-pinned identical):

    * ``method="heap"`` (auto for k <= ``heap_max_k``): top-k via
      TakeOrderedAndProject — a k-heap per partition merged on the
      driver. The only ordered operator; never a global sort.
    * ``method="threshold"`` (auto for larger k): the driver-side
      k-heap would hold k rows, so instead find the exact kth
      gumbel_key by approx-quantile seeding + a count-only binary
      search on the 4-decimal key grid (O(log spread) map-combining
      counts over the persisted weights frame, O(1) driver state per
      step), take every row strictly above it, and fix up the boundary
      by ordering ONLY the rows tied at the cutoff value (ties at one
      4dp value — ~n/distinct_keys rows, orders of magnitude below k).
      No TakeOrdered ever sees more than the tie set."""
    w = dsir_weights(raw_df, target_df, text_col, id_col, n_buckets, smoothing)
    u = (md5_int(_sample_key(id_col, seed)).cast("double") + F.lit(0.5)) / F.lit(
        float(16**15)
    )
    keyed = w.withColumn(
        "gumbel_key",
        F.round(
            F.col("log_weight") / F.lit(float(temperature)) - F.log(-F.log(u)), 4
        ),
    )
    return _gumbel_topk_join(raw_df, keyed, k, id_col, method, heap_max_k)


def _gumbel_topk_join(
    raw_df: DataFrame,
    keyed: DataFrame,
    k: int,
    id_col: str,
    method: str,
    heap_max_k: int,
) -> DataFrame:
    """Shared Gumbel-top-k selection tail (dsir_sample and
    weighted_sample): pick the k rows of ``keyed`` with the largest
    (gumbel_key, -id) and join the winners back onto ``raw_df``,
    carrying (log_weight, gumbel_key)."""
    if method == "auto":
        method = "heap" if k <= heap_max_k else "threshold"
    if method == "heap":
        top = keyed.orderBy(F.desc("gumbel_key"), F.asc(id_col)).limit(k)
    elif method == "threshold":
        top = _threshold_topk(keyed, k, id_col)
    else:
        raise ValueError(f"method must be auto|heap|threshold, got {method!r}")
    # rename the carried columns before joining back: `keyed` may be a
    # SHALLOW derivation of raw_df (weighted_sample), and Spark's
    # ambiguous-self-join check rejects top["log_weight"] there
    top = top.select(
        F.col(id_col).alias("__gtid"),
        F.col("log_weight").alias("__gtlw"),
        F.col("gumbel_key").alias("__gtgk"),
    )
    if method == "heap":
        top = F.broadcast(top)
    # (threshold path: top is k rows and k is large there — the join
    # strategy, shuffle vs AQE-chosen, is Catalyst's call)
    return (
        raw_df.join(top, raw_df[id_col] == F.col("__gtid"))
        .select(
            raw_df["*"],
            F.col("__gtlw").alias("log_weight"),
            F.col("__gtgk").alias("gumbel_key"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    temperature: float = 1.0,
    method: str = "auto",
    heap_max_k: int = 1_000_000,
) -> DataFrame:
    """Sample ``k`` rows WITHOUT replacement with probability
    proportional to ``weight_col`` ** (1/temperature) — the general
    weighted selection every mixing recipe reduces to (dsir_sample is
    this with DSIR importance weights; soft-dedup training samples with
    1/cluster_size weights; length-balanced selection with token
    counts).

    Exact via the Gumbel-top-k identity (Efraimidis & Spirakis 2006 in
    Gumbel form): key = ln(w)/T + Gumbel noise, take the k largest.
    The noise is a pure function of (id, seed) through md5, so the draw
    is deterministic, rerun-stable, and reproducible in the DuckDB
    oracle. Rows with NULL or non-positive weight have probability zero
    and are excluded. Selection is the shared heap/threshold machinery:
    TakeOrderedAndProject for ordinary k, the count-only binary-search
    cutoff for k beyond driver-heap comfort — never a global sort."""
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    if temperature <= 0:
        raise ValueError("weighted_sample: temperature must be > 0")
    eligible = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    )
    u = (md5_int(_sample_key(id_col, seed)).cast("double") + F.lit(0.5)) / F.lit(
        float(16**15)
    )
    lw = F.log(F.col(weight_col).cast("double"))
    keyed = eligible.select(
        F.col(id_col),
        F.round(lw, 4).alias("log_weight"),
        F.round(lw / F.lit(float(temperature)) - F.log(-F.log(u)), 4).alias(
            "gumbel_key"
        ),
    )
    return _gumbel_topk_join(eligible, keyed, k, id_col, method, heap_max_k)


def _threshold_topk(
    keyed: DataFrame, k: int, id_col: str, _materialize: bool = True
) -> DataFrame:
    """Exact top-k of ``keyed`` by (gumbel_key desc, id asc) WITHOUT a
    k-size driver heap: binary-search the cutoff on the integer 4dp key
    grid with count aggregates, then order only the cutoff ties.

    gumbel_key is round(·, 4), so key*1e4 re-rounded to long is a
    bijection of the distinct key values — the search space is exact
    integers and termination is guaranteed in log2(spread) counts
    (spread is the Gumbel range at 4dp, ~10^5-10^6 grid points). Every
    count is a map-combining aggregate over the persisted weights frame;
    driver state per step is one number."""
    from pyspark.storagelevel import StorageLevel

    from .dedup import _finalize_release

    ki = keyed.withColumn(
        "__ki", F.round(F.col("gumbel_key") * F.lit(1e4)).cast("long")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = ki.count()
    if n <= k:
        return _finalize_release(ki.drop("__ki"), [ki])

    def cnt_gt(t: int) -> int:
        return ki.filter(F.col("__ki") > F.lit(t)).count()

    bounds = ki.agg(
        F.min("__ki").alias("lo"), F.max("__ki").alias("hi")
    ).first()
    lo, hi = int(bounds["lo"]) - 1, int(bounds["hi"])  # c(lo)=n>k, c(hi)=0<k
    c_hi = 0  # c(hi) tracked alongside hi — saves re-counting at t_star
    # approx-quantile seed: one pass narrows the bracket to the error
    # band around the kth rank, cutting most binary-search iterations
    t0 = ki.stat.approxQuantile("__ki", [max(0.0, 1.0 - k / n)], 0.001)
    if t0:
        t0 = int(t0[0])
        if lo < t0 < hi:
            c0 = cnt_gt(t0)
            if c0 < k:
                hi, c_hi = t0, c0
            else:
                lo = t0
    # invariant: c(lo) >= k > c(hi); find t* = min{t : c(t) < k}
    while hi - lo > 1:
        mid = (lo + hi) // 2
        c_mid = cnt_gt(mid)
        if c_mid < k:
            hi, c_hi = mid, c_mid
        else:
            lo = mid
    t_star = hi
    c_gt = c_hi
    sel = ki.filter(F.col("__ki") > F.lit(t_star))
    # boundary fix-up: ties at exactly the cutoff key, smallest ids
    # first (the TakeOrdered path's tie-break) — the ONLY ordered set,
    # and it is the tie set, not k rows
    boundary = (
        ki.filter(F.col("__ki") == F.lit(t_star))
        .orderBy(F.asc(id_col))
        .limit(k - c_gt)
    )
    out = sel.unionByName(boundary).drop("__ki")
    if not _materialize:  # test seam: lazy plan for pinning (caller
        return out        # unpersists ki; the limit above is k - c_gt)
    return _finalize_release(out, [ki])


def quantile_trim(
    df: DataFrame,
    col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    n_bins: int = 4096,
    bounds: tuple | None = None,
) -> DataFrame:
    """Keep the rows whose ``col`` lies between the EXACT ``lower`` and
    ``upper`` quantiles (values at rank ceil(q*N), NULLs excluded) —
    the standard tail cut before training: drop the length / score /
    perplexity extremes without hand-picking thresholds per corpus.

    Bounds come from :func:`~pd_explain_spark.functions.sketches.
    exact_quantiles` (histogram pruning — no global sort), land on the
    driver as two scalars, and the trim itself is a scan-stage
    predicate the parquet reader can push down. Rows with NULL ``col``
    are dropped (they have no rank). Cost: the quantile passes +
    one filtered scan; nothing shuffles the corpus.

    Fit-once / trim-many: pass ``bounds=(lo_value, hi_value)`` (e.g.
    from :func:`~pd_explain_spark.functions.sketches.exact_quantiles`
    on a reference corpus) to skip the fit and apply the SAME cut to
    later batches — and to STREAMS: with explicit bounds the trim is a
    stateless scan predicate, so a micro-batch ingest filters with zero
    state (parity pytest in test_streaming.py)."""
    if bounds is not None:
        lo_v, hi_v = bounds
        return df.filter((F.col(col) >= F.lit(lo_v)) & (F.col(col) <= F.lit(hi_v)))
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(
            f"quantile_trim: need 0 <= lower <= upper <= 1, got ({lower}, {upper})"
        )
    from .sketches import exact_quantiles

    fit = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, col, [lower, upper], n_bins).collect()
    }
    if not fit:  # empty input: nothing to trim
        return df.limit(0)
    return df.filter(
        (F.col(col) >= F.lit(fit[lower])) & (F.col(col) <= F.lit(fit[upper]))
    )
